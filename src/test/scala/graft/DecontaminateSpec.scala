package graft

import graft.ops.Decontaminate
import org.scalatest.funsuite.AnyFunSuite

/** Gates for benchmark decontamination: planted overlap is flagged with the
  * right distinct-gram count and attribution, clean docs stay clean with
  * n_grams populated, and sub-n docs can never be flagged.
  */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(train: Seq[(Long, String)], eval: Seq[(Long, String)], n: Int) =
    Decontaminate.annotate(train.toDF("doc_id", "text"),
        eval.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))))
      .toMap

  test("planted eval window flags the doc; distinct shared grams counted once") {
    val leak = "alpha beta gamma delta epsilon" // 5 words -> two 4-grams
    val out = run(
      train = Seq(
        (1L, s"x1 x2 $leak x3"), // contains both leaked 4-grams
        (2L, s"$leak y1 $leak"), // leak twice: grams still DISTINCT-counted
        (3L, "c1 c2 c3 c4 c5 c6")), // clean
      eval = Seq((100L, s"e1 $leak e2")),
      n = 4)
    assert(out(1L) == ((5L, 2L, Some(100L), true)))
    // doc 2: 11 words -> 8 grams; shared distinct grams: the two leak grams
    // plus the wrap gram? no wrap shared with eval -> exactly 2
    assert(out(2L) == ((8L, 2L, Some(100L), true)))
    assert(out(3L) == ((3L, 0L, None, false)))
  }

  test("attribution is the smallest eval doc sharing a gram") {
    val out = run(
      train = Seq((1L, "w1 w2 w3 w4")),
      eval = Seq((9L, "w1 w2 w3 w4"), (5L, "w1 w2 w3 w4"), (7L, "z1 z2 z3 z4")),
      n = 4)
    assert(out(1L) == ((1L, 1L, Some(5L), true)))
  }

  test("docs shorter than n emit n_grams=0 and cannot be flagged") {
    val out = run(
      train = Seq((1L, "a b c"), (2L, "")),
      eval = Seq((50L, "a b c d")),
      n = 4)
    assert(out(1L) == ((0L, 0L, None, false)))
    assert(out(2L) == ((0L, 0L, None, false)))
  }

  test("case-insensitive matching (both sides lowercase)") {
    val out = run(
      train = Seq((1L, "Alpha BETA Gamma Delta")),
      eval = Seq((2L, "alpha beta gamma delta")),
      n = 4)
    assert(out(1L) == ((1L, 1L, Some(2L), true)))
  }

  test("corpus query shape agrees with a brute-force reference") {
    // deterministic mini-corpus with a small vocabulary so overlaps occur
    def words(seed: Long, n: Int): Seq[String] = {
      var x = seed * 0x9E3779B97F4A7C15L + 1
      (0 until n).map { _ =>
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        s"w${java.lang.Long.remainderUnsigned(x, 12)}"
      }
    }
    val docs = (0L until 60L).map(i => (i, words(i, 30 + (i % 20).toInt).mkString(" ")))
    val (ev, tr) = docs.partition(_._1 % 7 == 0)
    val out = run(tr, ev, n = 3)
    // brute force: distinct 3-gram sets per doc, intersect with eval union
    def grams(t: String): Set[Seq[String]] =
      t.split("\\s+").toSeq.sliding(3).filter(_.size == 3).toSet
    val evalGrams: Map[Seq[String], Long] = ev.flatMap { case (id, t) =>
      grams(t).map(g => g -> id)
    }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    tr.foreach { case (id, t) =>
      val shared = grams(t).flatMap(g => evalGrams.get(g).map(g -> _))
      val expect = (math.max(t.split("\\s+").length - 2, 0).toLong,
        shared.size.toLong,
        if (shared.isEmpty) None else Some(shared.map(_._2).min),
        shared.nonEmpty)
      assert(out(id) == expect, s"doc $id")
    }
    assert(out.values.count(_._4) > 0, "corpus must contain planted overlap")
  }
}
