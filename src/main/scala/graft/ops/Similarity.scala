package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exactness baseline; the scale path is
  * random-hyperplane LSH: bucket vectors by sign-bit signatures, probe only
  * the query's bucket(s), exact-rescore inside. Hyperplanes are seeded and
  * deterministic. All column expressions (zip_with/aggregate) — codegen'd,
  * no UDFs.
  */
object Similarity {

  /** In-order double-precision dot product of two array columns. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def cosine(x: Column, y: Column): Column =
    dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y)))

  /** Deterministic random hyperplanes: nBits x dim, seeded Gaussian. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextGaussian())
  }

  /** Sign-bit LSH signature of a (double-cast) embedding column. */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact brute-force cosine top-k against one query vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val qv = array(query.map(x => lit(x.toDouble)): _*)
    emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .select(col("id"), cosine(col("v"), qv).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate PAIRS, exact form: all pairs with
    * cosine >= minCos (threshold applied to the ROUNDED value so both
    * engines of a cross-check agree at the boundary). O(n^2) — the
    * exactness baseline for bounded inputs; the scale path is
    * [[lshNearDupPairs]].
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  minCos: Double, scale: Int = 3): DataFrame = {
    val v = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val l = v.select(col("id").as("a"), col("v").as("va"))
    val r = v.select(col("id").as("b"), col("v").as("vb"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), scale).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("a"), col("b"))
  }

  /** Scale path for near-dup pairs: BANDED sign-LSH — nBands independent
    * bandBits-bit signatures; vectors sharing ANY band key are candidates
    * (equi-join on (band, key) — shuffle-friendly, no quadratic blowup),
    * then the exact cosine filter runs inside buckets. Standard LSH OR-of-
    * ANDs recall: a pair at angle θ collides per band with
    * (1 - θ/π)^bandBits, and any of nBands bands suffices — with the 4x4
    * default, cosine-0.9 pairs are candidates with p ≈ 0.95 and cosine-0.99
    * pairs with p ≈ 0.999, while orthogonal pairs stay ≈ 0.23 (tune
    * bandBits up for tighter pruning at scale). OpsSpec asserts the result
    * is a subset of the exact pairs and that a planted duplicate is found.
    */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                      minCos: Double, nBands: Int = 4, bandBits: Int = 4,
                      seed: Long = 42L, scale: Int = 3): DataFrame = {
    val dim = emb.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(nBands * bandBits, dim, seed)
    val bands = (0 until nBands).map { bIdx =>
      val bandPlanes = planes.slice(bIdx * bandBits, (bIdx + 1) * bandBits)
      struct(lit(bIdx).as("band"), lshSignature(col("v"), bandPlanes).as("key"))
    }
    val sig = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .select(col("id"), col("v"), explode(array(bands: _*)).as("bk"))
      .select(col("id"), col("v"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = sig.select(col("id").as("a"), col("v").as("va"), col("band"), col("key"))
    val r = sig.select(col("id").as("b"), col("v").as("vb"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), scale).as("cos"))
      .filter(col("cos") >= minCos)
      .distinct()
      .orderBy(col("a"), col("b"))
  }

  /** LSH-bucketed ANN: restrict exact scoring to vectors whose signature is
    * within `probeHamming` bits of the query's signature (multi-probe).
    * Returns (id, cos) top-k — approximate; recall measured in tests.
    *
    * Scale path: the signature groupBy is one shuffle of (id, sig); the probe
    * is a signature-range filter + exact rescore of a tiny candidate set.
    */
  def lshTopK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, nBits: Int = 16,
              probeHamming: Int = 2, seed: Long = 42L): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(nBits, dim, seed)
    val qv = array(query.map(x => lit(x.toDouble)): _*)
    val qSig: Long = {
      var s = 0L
      planes.zipWithIndex.foreach { case (p, i) =>
        val d = p.zip(query.map(_.toDouble)).map { case (a, b) => a * b }.sum
        if (d >= 0) s |= (1L << i)
      }
      s
    }
    emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("sig", lshSignature(col("v"), planes))
      .filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= probeHamming)
      .select(col("id"), cosine(col("v"), qv).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
