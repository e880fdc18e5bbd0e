package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Persisted ANN index: sign-LSH signatures computed ONCE at build time and
  * stored WITH the (double-cast) vectors, range-partitioned and sorted by
  * signature. A query expands its signature's hamming ball and probes with a
  * pushed `sig IN (...)` filter — parquet min/max row-group stats on the
  * sig-sorted layout prune to O(probe ball) data, then the exact cosine
  * rescore runs inside the candidate set only.
  *
  * Round 1's `Similarity.lshTopK` recomputed every vector's signature per
  * query — an O(corpus) scan per call; this moves that cost to build time,
  * which is what makes it an ANN *index* rather than LSH-as-filter. Same
  * planes/signature semantics, so recall is identical (OpsSpec gates it).
  */
object AnnIndex {

  /** Build the signature table. One corpus pass; deterministic planes. */
  def build(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
            outDir: String, nBits: Int = 16, seed: Long = 42L,
            partitions: Int = 16): Unit = {
    val dim = emb.select(size(col(vecCol))).first().getInt(0)
    val planes = Similarity.hyperplanes(nBits, dim, seed)
    emb.select(col(idCol).as("id"), Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("sig", Similarity.lshSignature(col("v"), planes))
      .repartitionByRange(partitions, col("sig"))
      .sortWithinPartitions(col("sig"))
      .write.mode("overwrite").parquet(s"$outDir/vectors")
    val props = s"nBits=$nBits\nseed=$seed\ndim=$dim\n"
    Files.createDirectories(Paths.get(outDir))
    Files.write(Paths.get(outDir, "ANN_PROPS"), props.getBytes(StandardCharsets.UTF_8))
  }

  def readProps(outDir: String): Map[String, String] =
    new String(Files.readAllBytes(Paths.get(outDir, "ANN_PROPS")), StandardCharsets.UTF_8)
      .split("\n").filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap

  /** All signatures within `maxHamming` bit flips of `sig` (the probe ball:
    * sum of C(nBits, h) for h <= maxHamming — 137 values at 16 bits, h=2).
    */
  def hammingBall(sig: Long, nBits: Int, maxHamming: Int): Seq[Long] = {
    var ball = Set(sig)
    var frontier = Set(sig)
    (1 to maxHamming).foreach { _ =>
      frontier = for { s <- frontier; b <- (0 until nBits).toSet[Int] } yield s ^ (1L << b)
      ball ++= frontier
    }
    ball.toSeq.sorted
  }

  /** Top-k by cosine against the persisted index: pushed-filter probe +
    * exact rescore inside the ball. Approximate; recall grows with
    * `probeHamming` (multi-probe).
    */
  def topK(spark: SparkSession, outDir: String, query: Array[Float], k: Int,
           probeHamming: Int = 2): DataFrame = {
    val props = readProps(outDir)
    val nBits = props("nBits").toInt
    val seed = props("seed").toLong
    // planes derive from the PERSISTED dim: a wrong-dimension query must fail
    // loudly, not silently hash with different planes and return garbage
    val dim = props("dim").toInt
    require(query.length == dim,
      s"query dimension ${query.length} != index dimension $dim ($outDir)")
    val planes = Similarity.hyperplanes(nBits, dim, seed)
    val qSig: Long = {
      var s = 0L
      planes.zipWithIndex.foreach { case (p, i) =>
        val d = p.zip(query.map(_.toDouble)).map { case (a, b) => a * b }.sum
        if (d >= 0) s |= (1L << i)
      }
      s
    }
    val ball = hammingBall(qSig, nBits, probeHamming)
    val qv = array(query.map(x => lit(x.toDouble)): _*)
    spark.read.parquet(s"$outDir/vectors")
      .filter(col("sig").isin(ball: _*)) // pushed In -> row-group pruning
      .select(col("id"), Similarity.cosine(col("v"), qv).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
