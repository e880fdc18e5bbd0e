package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-file gate (FIXTURES.md §2): rebuilding the pinned corpus and
  * re-running the committed query set must reproduce the committed top-k
  * (docIds AND hex-exact double scores). Catches any unintended change to
  * the analyzer chain, BM25 math, norms, codec, or WAND behavior.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("engine reproduces fixtures/golden_topk.tsv bit-for-bit") {
    val expected = scala.io.Source.fromFile("fixtures/golden_topk.tsv")(scala.io.Codec.UTF8)
      .getLines().filter(_.nonEmpty).toSeq
    val got = Golden.run(spark)
    assert(got.length == expected.length,
      s"line count: got ${got.length}, expected ${expected.length}")
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"golden line $i differs:\n got: $g\n exp: $e")
    }
  }
}
