package graft

import graft.docprep.Reindex
import org.scalatest.funsuite.AnyFunSuite

class ReindexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalize_value: time portion (date fields), marc + trim (others) (reindex.py:279-301)") {
    import org.apache.spark.sql.functions.col
    val dates = Seq("2020-01-02T03:04:05Z", "2020-01-02")
      .toDF("v").select(Reindex.normalizeValue(col("v"), "date_dtsort").as("n"))
      .collect().map(r => Option(r.getString(0)).orNull)
    assert(dates.toSeq == Seq("2020-01-02", "2020-01-02"))
    val strs = Seq("  x  ", "", "A $a B", "S $a T")
      .toDF("v").select(Reindex.normalizeValue(col("v"), "title_tesim").as("n"))
      .collect().map(r => Option(r.getString(0)).orNull)
    assert(strs.toSeq == Seq("x", null, "A B", "S T"))
    val subj = Seq("A $a B").toDF("v")
      .select(Reindex.normalizeValue(col("v"), "subject_topic_tesim").as("n"))
      .collect().map(_.getString(0))
    assert(subj.toSeq == Seq("A--B"), "subject fields join marc subfields with --")
  }

  test("diff guard: explained changes pass, unexplained quarantine (reindex.py:141-240)") {
    val before = Seq(
      ("a1", "Old $a Title", "keepme", "2020-01-02T00:00:00Z"),
      ("a2", "Title Two", "keepme2", "2021-05-06T00:00:00Z"),
      ("a3", "Title Three", "surprise", "2022-07-08T00:00:00Z")
    ).toDF("ark", "title", "note", "date_dtsort")

    // the transform: repairs title (explained) but for a3 also corrupts note
    val after = Seq(
      ("a1", "Old Title", "keepme", "2020-01-02"), // marc repair + date normalize
      ("a2", "Title Two", "keepme2", "2021-05-06T00:00:00Z"), // unchanged
      ("a3", "Title Three", "CORRUPTED", "2022-07-08T00:00:00Z") // unexplained!
    ).toDF("ark", "title", "note", "date_dtsort")

    val (accepted, quarantined) = Reindex.guardedDiff(before, after,
      keyCols = Seq("ark"), explained = Set("title"))
    assert(accepted.select("ark").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a1", "a2"))
    val q = quarantined.collect()
    assert(q.length == 1 && q(0).getAs[String]("ark") == "a3")
    assert(q(0).getAs[scala.collection.Seq[String]]("_changed_cols") == Seq("note"))
  }

  test("repair catalog: relocations, ssi->tesim moves, identifier merge (reindex.py:50-105)") {
    import org.apache.spark.sql.functions._
    // row 1: computed rights URI moves back as a LABEL (base empty);
    // row 2: base populated -> untouched, computed still dropped;
    // row 3: unknown URI passes through verbatim
    val df = Seq(
      ("a1", null, Seq("http://vocabs.library.ucla.edu/rights/publicDomain"),
        "v1", "coll A", null, Seq("x", "y"), Seq("y", "z"), Seq("x")),
      ("a2", "already here", Seq("http://vocabs.library.ucla.edu/rights/unknown"),
        null, null, "fol", null, null, null),
      ("a3", null, Seq("http://example.org/not-in-vocab"),
        null, null, null, Seq[String](), Seq[String](), Seq[String]())
    ).toDF("ark", "human_readable_rights_statement_tesim", "rights_statement_tesim",
      "_version_", "collation_ssi", "foliation_ssi",
      "local_identifier_ssim", "local_identifier_ssm", "local_identifier_sim")
      // reference relocates LISTS; base here is scalar-or-null for brevity,
      // promote it to the list shape first
      .withColumn("human_readable_rights_statement_tesim",
        when(col("human_readable_rights_statement_tesim").isNotNull,
          array(col("human_readable_rights_statement_tesim")))
          .otherwise(lit(null).cast("array<string>")))

    val r = Reindex.repair(df)
    assert(!r.columns.contains("_version_"), "solr internals dropped")
    assert(!r.columns.contains("rights_statement_tesim"), "computed field always dropped")
    assert(!r.columns.contains("local_identifier_ssm") &&
      !r.columns.contains("local_identifier_sim"), "identifier variants dropped")
    val rows = r.collect().map(x => x.getAs[String]("ark") -> x).toMap

    def hr(a: String) = Option(rows(a).getAs[scala.collection.Seq[String]](
      "human_readable_rights_statement_tesim")).map(_.toSeq).orNull
    assert(hr("a1") == Seq("public domain"), "URI translated to label")
    assert(hr("a2") == Seq("already here"), "populated base untouched")
    assert(hr("a3") == Seq("http://example.org/not-in-vocab"), "unknown URI verbatim")

    // collation_ssi moved into a fresh single-element tesim, ssi nulled
    assert(rows("a1").getAs[scala.collection.Seq[String]]("collation_tesim") == Seq("coll A"))
    assert(rows("a1").getAs[String]("collation_ssi") == null)
    assert(rows("a2").getAs[scala.collection.Seq[String]]("foliation_tesim") == Seq("fol"))

    // identifiers: ordered union with first-occurrence dedup; empty -> null
    assert(rows("a1").getAs[scala.collection.Seq[String]]("local_identifier_ssim") ==
      Seq("x", "y", "z"))
    assert(rows("a3").getAs[scala.collection.Seq[String]]("local_identifier_ssim") == null)
  }

  test("guardedDiff defaults: exclude list explains legacy fields; access/language cleanup") {
    import org.apache.spark.sql.functions._
    // year_isim is on the exclude list -> change explained; "registered" is
    // stripped from access groups on the original side; human_readable
    // language fields are ignored when language_tesim is populated
    val before = Seq(
      ("a1", Seq(1999), Seq("public", "registered"), Seq("eng"), Seq("BAD OLD NAME"))
    ).toDF("ark", "year_isim", "read_access_group_ssim", "language_tesim",
      "human_readable_language_tesim")
    val after = Seq(
      ("a1", Seq(2000), Seq("public"), Seq("eng"), Seq("English"))
    ).toDF("ark", "year_isim", "read_access_group_ssim", "language_tesim",
      "human_readable_language_tesim")
    // default exclude list: year_isim explained; language cleanup + the
    // "additions don't count" DeepDiff rule handle the rest — no custom set
    val (accepted, quarantined) = Reindex.guardedDiff(before, after, Seq("ark"))
    assert(accepted.count() == 1 && quarantined.count() == 0)

    // but an unexplained change still quarantines
    val after2 = after.withColumn("language_tesim", array(lit("fre")))
    val (acc2, q2) = Reindex.guardedDiff(before, after2, Seq("ark"))
    assert(acc2.count() == 0 && q2.count() == 1)
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
