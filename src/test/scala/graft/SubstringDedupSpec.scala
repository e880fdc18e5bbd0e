package graft

import graft.ops.SubstringDedup
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the exact-substring span dedup (Lee et al. regime): maximal
  * cross-doc spans, the cut text, and the cross-doc-only scoping.
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], span: Int) =
    SubstringDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", span)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap

  test("planted shared window becomes one maximal span in both docs, cut exactly") {
    // docs 1 and 2 share tokens "c1..c7" (7 tokens); span=5 marks gram
    // positions covering exactly that window; singles elsewhere never match
    val shared = (1 to 7).map(i => s"c$i").mkString(" ")
    val d1 = s"a1 a2 a3 $shared z1 z2"
    val d2 = s"b1 $shared y1 y2 y3"
    val d3 = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    val out = run(Seq((1L, d1), (2L, d2), (3L, d3)), span = 5)
    assert(out.keySet == Set(1L, 2L))
    // d1: shared at tokens 4..10 -> gram starts 4,5,6 merge -> span 4-10
    assert(out(1L) == ((12L, 1L, 7L, "4-10", "a1 a2 a3 z1 z2")))
    // d2: shared at tokens 2..8 -> span 2-8
    assert(out(2L) == ((11L, 1L, 7L, "2-8", "b1 y1 y2 y3")))
  }

  test("within-doc repetition alone is out of scope (cross-doc only)") {
    val rep = "r1 r2 r3 r4 r5"
    val out = run(Seq(
      (1L, s"$rep x1 x2 $rep"),
      (2L, "q1 q2 q3 q4 q5 q6 q7 q8")), span = 5)
    assert(out.isEmpty)
  }

  test("two separated shared windows stay two spans; fully-duplicated doc cuts to empty") {
    val s1 = (1 to 5).map(i => s"p$i").mkString(" ")
    val s2 = (1 to 5).map(i => s"q$i").mkString(" ")
    val out = run(Seq(
      (1L, s"$s1 m1 m2 m3 $s2"),
      (2L, s"$s1 n1 n2 n3 n4 $s2"),
      (3L, s1)), span = 5)
    // doc 3 IS the first shared window: one span covering everything
    assert(out(3L) == ((5L, 1L, 5L, "1-5", "")))
    val (n1, nSpans1, dup1, spans1, clean1) = out(1L)
    assert((n1, nSpans1, dup1, spans1) == ((13L, 2L, 10L, "1-5|9-13")))
    assert(clean1 == "m1 m2 m3")
  }

  test("marked positions 2..span-1 apart merge into ONE span (no overlap double-count)") {
    // doc 1's grams at positions 1 and 3 are each shared (with different
    // partners); the gram at position 2 is unique. The covered windows
    // [1..5] and [3..7] overlap, so the result must be ONE span 1-7 with
    // dup_tokens = 7 — the pre-fix gap>1 islands emitted "1-5|3-7" and
    // counted 10 duplicated tokens in a 7-token doc
    val out = run(Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7"),
      (2L, "x1 x2 x3 x4 x5"),
      (3L, "x3 x4 x5 x6 x7")), span = 5)
    assert(out(1L) == ((7L, 1L, 7L, "1-7", "")))
    assert(out(2L) == ((5L, 1L, 5L, "1-5", "")))
    assert(out(3L) == ((5L, 1L, 5L, "1-5", "")))
    // abutting windows (gap exactly span) still merge: coverage is contiguous
    val ab = run(Seq(
      (1L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5 z1"),
      (2L, "a1 a2 a3 a4 a5"),
      (3L, "b1 b2 b3 b4 b5")), span = 5)
    assert(ab(1L) == ((11L, 1L, 10L, "1-10", "z1")))
    // gap span+1: token between the windows is uncovered -> two spans
    val sep = run(Seq(
      (1L, "a1 a2 a3 a4 a5 gap b1 b2 b3 b4 b5"),
      (2L, "a1 a2 a3 a4 a5"),
      (3L, "b1 b2 b3 b4 b5")), span = 5)
    assert(sep(1L) == ((11L, 2L, 10L, "1-5|7-11", "gap")))
  }

  test("10^4 spans in one doc reconstruct linearly (two-pointer cut, not per-token exists)") {
    // 10,000 shared 5-token windows separated by gap tokens (> span apart so
    // every window is its own span). The round-5 per-token exists() shape was
    // O(tokens x spans) — ~6.6e8 lambda evals for this row; the two-pointer
    // aggregate is O(tokens + spans) and must finish inside the suite budget.
    val nSpans = 10000
    val d1 = (0 until nSpans).map { i =>
      (1 to 5).map(j => s"s${i}_$j").mkString(" ") + s" gap$i"
    }.mkString(" ")
    val d2 = (0 until nSpans).map { i =>
      (1 to 5).map(j => s"s${i}_$j").mkString(" ") + s" sep$i"
    }.mkString(" ")
    val out = run(Seq((1L, d1), (2L, d2)), span = 5)
    val (n1, nSpans1, dup1, spans1, clean1) = out(1L)
    assert((n1, nSpans1, dup1) == ((nSpans * 6L, nSpans.toLong, nSpans * 5L)))
    assert(spans1.take(9) == "1-5|7-11|")
    assert(clean1 == (0 until nSpans).map(i => s"gap$i").mkString(" "))
    val (_, _, _, _, clean2) = out(2L)
    assert(clean2 == (0 until nSpans).map(i => s"sep$i").mkString(" "))
  }

  test("hot gram shared by most of the corpus still yields exact spans") {
    // boilerplate header planted in 80% of docs — the skew class the
    // groupBy(g) partial-aggregate + semi-join shape exists for; output
    // must equal the per-doc expectation regardless of the gram's heat
    val header = (1 to 7).map(i => s"lic$i").mkString(" ")
    val docs = (0 until 50).map { i =>
      val body = (1 to 6).map(j => s"u${i}_$j").mkString(" ")
      if (i % 5 != 0) (i.toLong, s"$header $body") else (i.toLong, body)
    }
    val out = run(docs, span = 5)
    assert(out.keySet == docs.filter(_._1 % 5 != 0).map(_._1).toSet)
    out.foreach { case (_, (n, ns, dup, spans, clean)) =>
      assert((n, ns, dup, spans) == ((13L, 1L, 7L, "1-7")))
      assert(clean.startsWith("u") && clean.split(" ").length == 6)
    }
  }

  test("agrees with a brute-force reference on the testdata corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val span = 8
    val got = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", span)
      .collect().map(r => r.getLong(0) -> (r.getString(4), r.getString(5))).toMap

    // brute force: hash every span-gram, mark cross-doc duplicated positions,
    // merge runs — the same semantics computed imperatively
    val raw = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.split("\\s+") }
    val byGram = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    raw.foreach { case (id, w) =>
      if (w.length >= span)
        (0 to w.length - span).foreach { i =>
          byGram.getOrElseUpdate(w.slice(i, i + span).mkString(" "),
            scala.collection.mutable.Set.empty) += id
        }
    }
    val expect = raw.flatMap { case (id, w) =>
      val marked = (0 to w.length - span).filter { i =>
        w.length >= span && byGram(w.slice(i, i + span).mkString(" ")).size > 1
      }.map(_ + 1)
      if (marked.isEmpty) None
      else {
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var s = marked.head; var prev = marked.head
        marked.tail.foreach { p =>
          // interval union: windows [p, p+span-1] merge while they overlap
          // or abut (gap <= span); only a gap > span starts a new span
          if (p > prev + span) { spans += ((s, prev + span - 1)); s = p }
          prev = p
        }
        spans += ((s, prev + span - 1))
        val covered = spans.flatMap { case (a, b) => a to b }.toSet
        val clean = w.indices.filterNot(i => covered(i + 1)).map(w).mkString(" ")
        Some(id -> (spans.map { case (a, b) => s"$a-$b" }.mkString("|"), clean))
      }
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty) // the gate bites: planted duplicates exist at sf0.001
  }
}
