package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Persisted IVF (inverted-file) ANN index — the second scale path next to
  * the sign-LSH [[AnnIndex]] (the brief names both: "an IVF or LSH-bucketed
  * variant").
  *
  * Build: deterministic Lloyd's k-means over the (double-cast) vectors —
  * centroids broadcast each iteration (k is small), assignment + update one
  * map-only pass emitting <= k per-partition (vecSum, count) partials that
  * merge on the driver (O(k·dim·partitions) moved bytes) — then vectors are
  * written range-partitioned and sorted by centroid id ("inverted lists" as
  * parquet row groups; min/max stats make a centroid probe skip everything
  * else). Centroids persist beside the lists.
  *
  * Query: rank centroids against the query DRIVER-side (k × dim doubles —
  * tiny), take the `nprobe` nearest, read only their lists via a pushed
  * `cid IN (...)` filter, exact-cosine rescore inside the candidate set.
  * Recall grows with nprobe; nprobe = k is exact brute force.
  *
  * 100 TB shape: one pass per k-means iteration (map + small agg), no
  * all-pairs anything; query cost is O(probed lists), independent of corpus
  * size given balanced lists.
  */
object IvfIndex {

  /** Deterministic k-means++-free init: the nCentroids vectors with the
    * smallest md5(id) — a seedless, order-stable pseudo-random sample.
    */
  def build(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
            outDir: String, nCentroids: Int = 16, iters: Int = 5,
            partitions: Int = 16): Unit = {
    import spark.implicits._
    val vecs = emb.select(col(idCol).cast("long").as("id"),
      Similarity.asDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = vecs.select(size(col("v"))).first().getInt(0)

    var centroids: Array[Array[Double]] = vecs
      .withColumn("_h", md5(col("id").cast("string")))
      .orderBy(col("_h")).limit(nCentroids)
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)

    def nearest(cs: Array[Array[Double]])(v: Seq[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cv = cs(c)
        while (i < cv.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    // Lloyd's update with a MAP-SIDE COMBINE: each input partition reduces
    // its rows to at most k (vecSum, count) partials sequentially (one
    // mapPartitions pass — the vectors themselves never shuffle), and the
    // driver merges the tiny k x partitions x dim partial table. Wire + driver
    // bytes per iteration: O(k * dim * partitions), independent of n — the
    // round-3 groupByKey.mapGroups shape shuffled ALL n*dim vector bytes into
    // <= k reduce tasks every iteration. Determinism: per-partition sums run
    // in the persisted partition's row order and the driver merge is sorted
    // by (cid, partitionId), so the float summation tree is fixed
    // (OpsSpec gates centroid equality against a sequential reference).
    (1 to iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(centroids)
      val partials: Array[(Int, Int, Seq[Double], Long)] = vecs.as[(Long, Seq[Double])]
        .mapPartitions { it =>
          val cs = bc.value
          val sums = Array.fill(cs.length)(new Array[Double](dim))
          val counts = new Array[Long](cs.length)
          it.foreach { case (_, v) =>
            val c = nearest(cs)(v)
            val s = sums(c)
            var i = 0; while (i < dim) { s(i) += v(i); i += 1 }
            counts(c) += 1
          }
          val pid = org.apache.spark.TaskContext.getPartitionId()
          (0 until cs.length).iterator.filter(counts(_) > 0)
            .map(c => (pid, c, sums(c).toSeq, counts(c)))
        }
        .collect()
      val next = centroids.clone() // empty clusters keep their previous centroid
      partials.groupBy(_._2).foreach { case (cid, ps) =>
        val sum = new Array[Double](dim)
        var n = 0L
        ps.sortBy(_._1).foreach { case (_, _, s, cnt) =>
          var i = 0; while (i < dim) { sum(i) += s(i); i += 1 }
          n += cnt
        }
        next(cid) = sum.map(_ / n)
      }
      centroids = next
      bc.destroy()
    }

    val bc = spark.sparkContext.broadcast(centroids)
    vecs.as[(Long, Seq[Double])]
      .map { case (id, v) => (nearest(bc.value)(v), id, v) }
      .toDF("cid", "id", "v")
      .repartitionByRange(partitions, col("cid"))
      .sortWithinPartitions(col("cid"))
      .write.mode("overwrite").parquet(s"$outDir/lists")
    vecs.unpersist()

    val props = s"nCentroids=$nCentroids\ndim=$dim\n"
    Files.createDirectories(Paths.get(outDir))
    Files.write(Paths.get(outDir, "IVF_PROPS"), props.getBytes(StandardCharsets.UTF_8))
    val lines = centroids.zipWithIndex.map { case (c, i) =>
      s"$i\t${c.mkString(",")}"
    }
    Files.write(Paths.get(outDir, "IVF_CENTROIDS"),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
  }

  def readProps(outDir: String): Map[String, String] =
    new String(Files.readAllBytes(Paths.get(outDir, "IVF_PROPS")), StandardCharsets.UTF_8)
      .split("\n").filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap

  def readCentroids(outDir: String): Array[Array[Double]] =
    new String(Files.readAllBytes(Paths.get(outDir, "IVF_CENTROIDS")), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty)
      .map(_.split("\t")(1).split(",").map(_.toDouble))

  /** Top-k by cosine: probe the `nprobe` nearest inverted lists (pushed
    * `cid IN (...)` — row-group pruning on the cid-sorted layout), exact
    * rescore inside them.
    */
  def topK(spark: SparkSession, outDir: String, query: Array[Float], k: Int,
           nprobe: Int = 4): DataFrame = {
    val props = readProps(outDir)
    val dim = props("dim").toInt
    require(query.length == dim,
      s"query dimension ${query.length} != index dimension $dim ($outDir)")
    val cs = readCentroids(outDir)
    val q = query.map(_.toDouble)
    val probes = cs.zipWithIndex.map { case (c, i) =>
      var d = 0.0; var j = 0
      while (j < dim) { val t = q(j) - c(j); d += t * t; j += 1 }
      (d, i)
    }.sortBy(_._1).take(math.min(nprobe, cs.length)).map(_._2).toSeq
    val qv = array(query.map(x => lit(x.toDouble)): _*)
    spark.read.parquet(s"$outDir/lists")
      .filter(col("cid").isin(probes: _*)) // pushed In -> row-group pruning
      .select(col("id"), Similarity.cosine(col("v"), qv).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
