package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent brute-force references for the curation queries whose DuckDB
  * oracles REPLAY the Spark construction. A replayed oracle is blind to a
  * defect in the shared logic — exactly how the substring-span overlap bug
  * survived its hash gate (COVERAGE round-5 self-review) — so each query
  * here gets a third, imperative computation of the SAME semantics: the
  * driver compare gates Spark==DuckDB, this spec gates Spark==plain-Scala.
  */
class CurationPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val raw: Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def words(t: String): Array[String] =
    t.trim.toLowerCase.split("\\s+")

  test("chunk windows == brute force (starts, lengths, fingerprints)") {
    val got = RelationalQueries.queries("q_chunk_windows")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
    val expect = raw.flatMap { case (id, t) =>
      val w = words(t)
      (1 to math.max(w.length, 1) by 48).zipWithIndex.map { case (s, i) =>
        (id, (i + 1).toLong, s.toLong,
          math.min(w.length - s + 1, 64).toLong,
          md5hex(w.slice(s - 1, s - 1 + 64).mkString(" ")))
      }
    }.sortBy(x => (x._1, x._2))
    assert(got == expect)
    assert(expect.exists(_._4 == 64L) && expect.exists(_._4 < 64L),
      "corpus must exercise both full and short trailing windows")
  }

  test("tfidf keywords == brute force (scores, ranks, tie-break)") {
    val got = RelationalQueries.queries("q_tfidf_keywords")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSeq
    val n = raw.size.toLong
    val tf: Map[(Long, String), Long] = raw.flatMap { case (id, t) =>
      words(t).toSeq.groupBy(identity).map { case (w, xs) => (id, w) -> xs.size.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.toSeq.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val expect = raw.flatMap { case (id, t) =>
      val scored = words(t).distinct.toSeq.map { w =>
        val f = tf((id, w))
        (w, f, df(w), round6(f * math.log((n + 1.0) / (df(w) + 1.0))))
      }.sortBy { case (w, _, _, s) => (-s, w) }.take(3)
      scored.zipWithIndex.map { case ((w, f, d, s), i) => (id, i + 1, w, f, d, s) }
    }.sortBy(x => (x._1, x._2))
    assert(got == expect)
  }

  test("sequence packing == brute force; offsets parallelism-independent") {
    val docsDF = spark.read.parquet(s"$dir/documents.parquet")
    def run(parts: Int): Seq[(Long, Long, Long, Long, Long, Long)] =
      graft.ops.Packing.packSequences(docsDF, "doc_id", "text", 2048, parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    // the load-bearing property: global offsets must not depend on the
    // partitioning (range bounds + prefix offsets, not a lucky task order)
    val got2 = run(2)
    assert(got2 == run(16), "offsets must be identical at 2 vs 16 partitions")
    var off = 0L
    val expect = raw.sortBy(_._1).map { case (id, t) =>
      val n = t.trim.split("\\s+").length.toLong
      val o = off; off += n
      (id, n, o, o / 2048, (o + n - 1) / 2048, (o + n - 1) / 2048 - o / 2048 + 1)
    }
    assert(got2 == expect)
    assert(expect.exists(_._6 > 1), "a doc must straddle a sequence boundary")
  }

  test("packed-sequence inverse view == brute force token assignment") {
    val docsDF = spark.read.parquet(s"$dir/documents.parquet")
    val packed = graft.ops.Packing.packSequences(docsDF, "doc_id", "text", 2048)
    val got = graft.ops.Packing.packedSequenceView(packed, 2048)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    // brute force: walk the concatenated token stream one doc at a time and
    // chop each doc's [o, o+n) global range at every 2048 boundary
    var off = 0L
    val expect = raw.sortBy(_._1).flatMap { case (id, t) =>
      val n = t.trim.split("\\s+").length.toLong
      val o = off; off += n
      (o / 2048 to (o + n - 1) / 2048).map { s =>
        val gs = math.max(o, s * 2048)
        val ge = math.min(o + n, (s + 1) * 2048)
        (s, id, gs - o + 1, ge - gs)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got == expect)
    // every full interior sequence reassembles to exactly 2048 tokens, and
    // doc-local slices tile the doc: sum of portions == doc token count
    val bySeq = expect.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._4).sum }
    val lastSeq = bySeq.keys.max
    assert(bySeq.filter(_._1 < lastSeq).values.forall(_ == 2048L),
      "interior sequences must pack to exactly 2048 tokens")
    val byDoc = expect.groupBy(_._2).map { case (d, xs) => d -> xs.map(_._4).sum }
    raw.foreach { case (id, t) =>
      assert(byDoc(id) == t.trim.split("\\s+").length.toLong)
    }
    assert(expect.groupBy(_._1).exists(_._2.size > 1),
      "a sequence must contain multiple docs for the gate to bite")
  }

  test("null text counts 0 tokens and contributes no inverse-view rows") {
    val docs = Seq((1L, "a b c"), (2L, null), (3L, ""), (4L, "d e"))
      .toDF("doc_id", "text")
    val packed = graft.ops.Packing.packSequences(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    // doc 2 (null) -> 0 tokens, keeps its offset slot, n_seqs pinned to 1;
    // doc 3 ("") -> 1 token (split("") = [""]), the battery convention
    assert(packed == Seq(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 0L, 3L, 0L, 0L, 1L),
      (3L, 1L, 3L, 0L, 0L, 1L),
      (4L, 2L, 4L, 1L, 1L, 1L)))
    val inv = graft.ops.Packing.packedSequenceView(
      graft.ops.Packing.packSequences(docs, "doc_id", "text", 4), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(inv == Seq((0L, 1L, 1L, 3L), (0L, 3L, 1L, 1L), (1L, 4L, 1L, 2L)))
  }

  test("lm quality == brute force (micro-nat quantization, outlier flag)") {
    val got = RelationalQueries.queries("q_lm_quality")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    def roundL(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val perDoc: Map[Long, Seq[(String, Long)]] = raw.map { case (id, t) =>
      id -> words(t).toSeq.groupBy(identity).toSeq
        .map { case (w, xs) => w -> xs.size.toLong }
    }.toMap
    val uni: Map[String, Long] = perDoc.valuesIterator.flatten.toSeq
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val total = uni.values.sum
    val vocab = uni.size.toLong
    val expect = raw.map { case (id, _) =>
      val doc = perDoc(id)
      val nTok = doc.map(_._2).sum
      // contributions quantized to micro-nats THEN summed: exact-integer,
      // order-independent — so the comparison here is full equality, no
      // floating tolerance (the quantization is the query's own contract)
      val cMicro = doc.map { case (w, f) =>
        roundL(f * math.log((uni(w) + 1.0) / (total + vocab)) * 1e6)
      }.sum
      val r = round6(-cMicro / 1e6 / nTok.toDouble)
      (id, r, nTok, r > 3.42)
    }.sortBy(_._1)
    assert(got == expect)
    assert(expect.exists(_._4) && expect.exists(!_._4),
      "outlier flag must bite both ways on this corpus")
  }
}
