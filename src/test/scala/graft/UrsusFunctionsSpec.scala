package graft

import graft.docprep.UrsusFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Docprep parity layer tested with the REFERENCE'S OWN test vectors
  * (/root/reference/tests/test_util.py, test_year_parser.py,
  * test_ursus_solr_record.py).
  */
class UrsusFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval1(c: Column): Any =
    spark.range(1).select(c.as("r")).collect()(0).get(0)

  private def evalStr(input: String, f: Column => Column): String =
    Seq(input).toDF("v").select(f(col("v")).as("r")).collect()(0).getString(0)

  test("parse_marc: reference vectors (tests/test_util.py:102-112)") {
    val cases = Seq(
      "One $a Two" -> "One Two",
      "$a Start" -> "Start",
      "End $z  " -> "End",
      "No symbols" -> "No symbols",
      " $b Multiple $c" -> "Multiple",
      " Whitespace  " -> "Whitespace")
    cases.foreach { case (in, want) =>
      assert(evalStr(in, parseMarc(_)) == want, s"parse_marc($in)")
    }
    assert(evalStr("abc $d xyz", parseMarcSubject) == "abc--xyz")
  }

  test("parse_list splits |~| (tests/test_util.py:146-152)") {
    val got = Seq("Item1|~|Item2|~|Item3").toDF("v")
      .select(parseList(col("v"))).collect()(0).getSeq[String](0)
    assert(got == Seq("Item1", "Item2", "Item3"))
  }

  test("parse_empty strips to null") {
    assert(evalStr("  x  ", parseEmpty(_)) == "x")
    assert(Seq(" \t  ").toDF("v").select(parseEmpty(col("v"))).collect()(0).isNullAt(0))
  }

  test("ensure_ark_prefix: reference vectors (tests/test_util.py:190-199)") {
    val cases = Seq(
      "ark:/21198/abc" -> "ark:/21198/abc",
      "21198/abc" -> "ark:/21198/abc",
      "ark:/21198/abc/xyz" -> "ark:/21198/abc/xyz",
      "21198/abc/xyz" -> "ark:/21198/abc/xyz",
      // non-arks unchanged (validation rejects them later; F4 only prefixes)
      "ark:/abc/abc" -> "ark:/abc/abc",
      "21198-abc" -> "21198-abc")
    cases.foreach { case (in, want) =>
      assert(evalStr(in, ensureArkPrefix(_)) == want, s"ensure_ark_prefix($in)")
    }
  }

  test("make_ursus_id: reference vectors (tests/test_util.py:230-245)") {
    assert(evalStr("cba-321", makeUrsusId(_)) == "cba-321") // already an id
    assert(evalStr("654-321", makeUrsusId(_)) == "654-321")
    assert(evalStr("ark:/123/abc", makeUrsusId(_)) == "cba-321")
    assert(evalStr("123/abc", makeUrsusId(_)) == "cba-321")
  }

  test("visibility decision table (ursus_solr_record.py:271-327 + tests:610-703)") {
    def vis(v: Option[String], status: Option[String]): String = {
      val df = Seq((v, status)).toDF("v", "s")
      Option(df.select(mapVisibility(col("v"), col("s")).as("r"))
        .collect()(0).getString(0)).orNull
    }
    assert(vis(Some("open"), None) == "open")
    assert(vis(Some("public"), None) == "open")
    assert(vis(Some("private"), Some("anything")) == "authenticated")
    assert(vis(Some("sinai"), None) == "authenticated")
    assert(vis(Some("discovery"), None) == "authenticated")
    assert(vis(Some(""), None) == "open")
    assert(vis(None, Some("Completed")) == "open")
    assert(vis(None, Some("Completed with minimal metadata")) == "open")
    assert(vis(None, Some("In progress")) == "authenticated")
    assert(vis(None, None) == "open")
    assert(vis(Some("garbage"), None) == "garbage") // passed through to validation
  }

  test("archival collection formatter (tests/test_ursus_solr_record.py:65-166)") {
    def fmt(t: Option[String], n: Option[String], b: Option[String], f: Option[String]): String = {
      val df = Seq((t, n, b, f)).toDF("t", "n", "b", "f")
      Option(df.select(archivalCollection(col("t"), col("n"), col("b"), col("f")).as("r"))
        .collect()(0).getString(0)).orNull
    }
    assert(fmt(Some("Coll"), Some("100"), None, None) == "Coll (100)")
    assert(fmt(Some("Coll"), None, None, None) == "Coll")
    assert(fmt(None, Some("100"), None, None) == "Archival Collection 100")
    assert(fmt(None, None, Some("3"), Some("7")) == null)
    assert(fmt(Some("Coll"), Some("100"), Some("Box 3"), Some("folder 7")) ==
      "Coll (100), Box 3, Folder 7")
    assert(fmt(Some("Coll"), Some("100"), Some("  BOX  3"), None) == "Coll (100), Box 3")
    assert(fmt(Some("Coll"), Some("100"), None, Some("Folder 12")) == "Coll (100), Folder 12")
  }

  test("get_year: single year only, ambiguity -> null (year_parser.py:38-51)") {
    def y(s: String): Option[Int] = {
      val r = Seq(s).toDF("v").select(getYear(col("v")).as("r")).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getInt(0))
    }
    assert(y("1990") == Some(1990))
    assert(y("around 1990 or so") == Some(1990))
    assert(y("850") == Some(850))
    assert(y("1990 or 1991") == None) // ambiguous
    assert(y("no year") == None)
    assert(y("12345") == None) // 5 digits: \b(\d{4}|\d{3})\b doesn't match
  }

  test("integer_years range expansion (year_parser.py:12-35, tests/test_year_parser.py)") {
    def years(ds: Seq[String]): Seq[Int] = {
      val df = Seq(Tuple1(ds)).toDF("v")
      df.select(integerYears(col("v")).as("r")).collect()(0).getSeq[Int](0)
    }
    assert(years(Seq("1941-10-01")) == Seq(1941))
    assert(years(Seq("1938/1941")) == Seq(1938, 1939, 1940, 1941))
    assert(years(Seq("1941", "1943/1945")) == Seq(1941, 1943, 1944, 1945))
    assert(years(Seq("not a date")) == Seq())
    assert(years(Seq("1941", "1941/1942")) == Seq(1941, 1942)) // distinct
  }

  test("get_dates endpoints incl. 3-digit-year padding (date_parser.py)") {
    def dates(ds: Seq[String]): Seq[String] = {
      val df = Seq(Tuple1(ds)).toDF("v")
      df.select(getDates(col("v")).as("r")).collect()(0).getSeq[String](0)
    }
    assert(dates(Seq("1941-10-01")) == Seq("1941-10-01"))
    assert(dates(Seq("1938/1941", "1940")) == Seq("1938", "1940", "1941"))
    assert(dates(Seq("950-01-01")) == Seq("0950-01-01")) // 3-digit year pad
  }

  test("iiif thumbnail suffix (ursus_solr_record.py:1514-1522)") {
    assert(evalStr("https://iiif.example.org/iiif/2/abc123", iiifThumbnail(_)) ==
      "https://iiif.example.org/iiif/2/abc123/full/!200,200/0/default.jpg")
    assert(evalStr("https://x.org/iiif/2/abc/full/400,/0/default.jpg", iiifThumbnail(_)) ==
      "https://x.org/iiif/2/abc/full/400,/0/default.jpg") // already has a path
  }

  test("filename from ark (sinai_json_importer.py:42-50)") {
    assert(evalStr("ark:/21198/z1h13zxq", filenameFromArk(_)) == "z1h13zxq.json")
    assert(evalStr("ark:/21198/a/b", filenameFromArk(_)) == "a-b.json")
  }

  test("object type mapping (ursus_solr_record.py:838-872)") {
    assert(evalStr("Manuscript", mapObjectType(_)) == "Work")
    assert(evalStr("Page", mapObjectType(_)) == "ChildWork")
    assert(evalStr("", mapObjectType(_)) == "Work")
    assert(evalStr("Collection", mapObjectType(_)) == "Collection")
  }

  test("order-preserving deduplicate (util.py:302-305)") {
    val df = Seq((Seq("b", "a"), Seq("a", "c"))).toDF("x", "y")
    val got = df.select(deduplicate(col("x"), col("y")).as("r")).collect()(0).getSeq[String](0)
    assert(got == Seq("b", "a", "c")) // first-seen order preserved
  }

  test("html link builder (importer.py:376-382)") {
    val df = Seq(("ark:/123/abc", "A Title")).toDF("a", "t")
    assert(df.select(htmlLink(col("a"), col("t"))).collect()(0).getString(0) ==
      "<a href='/catalog/ark:/123/abc'>A Title</a>")
  }
}
