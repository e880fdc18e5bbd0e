package graft

import graft.docprep.Reindex
import org.scalatest.funsuite.AnyFunSuite

class ReindexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalize_value strips time portion and whitespace (reindex.py:243-301)") {
    import org.apache.spark.sql.functions.col
    val got = Seq("2020-01-02T03:04:05Z", "  x  ", "", "2020-01-02")
      .toDF("v").select(Reindex.normalizeValue(col("v")).as("n"))
      .collect().map(r => Option(r.getString(0)).orNull)
    assert(got.toSeq == Seq("2020-01-02", "x", null, "2020-01-02"))
  }

  test("diff guard: explained changes pass, unexplained quarantine (reindex.py:141-240)") {
    val before = Seq(
      ("a1", "Old $a Title", "keepme", "2020-01-02T00:00:00Z"),
      ("a2", "Title Two", "keepme2", "2021-05-06T00:00:00Z"),
      ("a3", "Title Three", "surprise", "2022-07-08T00:00:00Z")
    ).toDF("ark", "title", "note", "date")

    // the transform: repairs title (explained) but for a3 also corrupts note
    val after = Seq(
      ("a1", "Old Title", "keepme", "2020-01-02"), // marc repair + date normalize
      ("a2", "Title Two", "keepme2", "2021-05-06T00:00:00Z"), // unchanged
      ("a3", "Title Three", "CORRUPTED", "2022-07-08T00:00:00Z") // unexplained!
    ).toDF("ark", "title", "note", "date")

    val (accepted, quarantined) = Reindex.guardedDiff(before, after,
      keyCols = Seq("ark"), explained = Set("title"))
    assert(accepted.select("ark").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a1", "a2"))
    val q = quarantined.collect()
    assert(q.length == 1 && q(0).getAs[String]("ark") == "a3")
    assert(q(0).getAs[scala.collection.Seq[String]]("_changed_cols") == Seq("note"))
  }

  test("repair: dedupe identifiers + marc-strip titles (reindex.py:50-105)") {
    val df = Seq((Seq("x", "x", "y"), "One $a Two")).toDF("local_identifiers", "title")
    val r = Reindex.repair(df).collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("local_identifiers") == Seq("x", "y"))
    assert(r.getAs[String]("title") == "One Two")
  }

  test("access-copy {} escape (reindex.py:247-248)") {
    val df = Seq(
      ("a1", "https://x.example/iiif/2/ark%3A{}/full"),
      ("a2", "https://x.example/plain")).toDF("ark", "access_copy_ssi")
    val out = Reindex.normalizeRecord(df).collect().map(r =>
      r.getString(0) -> r.getString(1)).toMap
    assert(out("a1") == "https://x.example/iiif/2/ark%3A%7B%7D/full")
    assert(out("a2") == "https://x.example/plain")
  }
}
