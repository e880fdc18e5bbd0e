package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class SmallFloatSpec extends AnyFunSuite {
  test("small values are exact") {
    (0 until SmallFloat.NumFreeValues).foreach { i =>
      assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(i)) == i)
    }
  }
  test("known Lucene free-value count") {
    // MAX_INT4 = longToInt4(Int.MaxValue) = 231 => 24 free values, exact 0..23
    assert(SmallFloat.NumFreeValues == 24)
  }
  test("quantization is monotonic and a lower bound") {
    var prev = -1
    Seq(0, 1, 23, 24, 25, 100, 1000, 65535, 1 << 20, Int.MaxValue).foreach { v =>
      val q = SmallFloat.quantizeLength(v)
      assert(q <= v, s"q($v)=$q")
      assert(q >= prev)
      prev = q
    }
  }
  test("quantization idempotent on decoded values (1k seeded cases)") {
    val rng = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      val v = rng.nextInt(Int.MaxValue)
      val q = SmallFloat.quantizeLength(v)
      assert(SmallFloat.quantizeLength(q) == q)
    }
  }
}

class CodecSpec extends AnyFunSuite {
  test("docId delta+varint round trip (1k seeded arrays)") {
    val rng = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val n = 1 + rng.nextInt(300)
      val ids = Array.fill(n)(math.abs(rng.nextLong()) % (1L << 40)).distinct.sorted
      val enc = Codec.encodeDocIds(ids)
      assert(Codec.decodeDocIds(enc, ids.length).toSeq == ids.toSeq)
    }
  }
  test("tf varint round trip incl. extremes") {
    val rng = new scala.util.Random(11)
    (1 to 500).foreach { _ =>
      val tfs = Array.fill(1 + rng.nextInt(200))(1 + rng.nextInt(Int.MaxValue - 1))
      val enc = Codec.encodeTfs(tfs)
      assert(Codec.decodeTfs(enc, tfs.length).toSeq == tfs.toSeq)
    }
    val edge = Array(1, Int.MaxValue, 127, 128, 16383, 16384)
    assert(Codec.decodeTfs(Codec.encodeTfs(edge), edge.length).toSeq == edge.toSeq)
  }
  test("single-doc block") {
    val enc = Codec.encodeDocIds(Array(123456789L))
    assert(Codec.decodeDocIds(enc, 1).toSeq == Seq(123456789L))
  }
  test("gap compression is compact for dense ids") {
    val ids = (1000L until 2000L).toArray
    assert(Codec.encodeDocIds(ids).length < 1010) // ~1 byte/gap + first id
  }
  test("FOR packing: dense run is header-only; all-tf-1 is one byte") {
    val dense = (1000L until 2000L).toArray
    // 0x01 + varlong(1000) + width byte 0, nothing else
    assert(Codec.encodeDocIds(dense).length == 4)
    assert(Codec.encodeTfs(Array.fill(128)(1)).length == 1)
  }
  test("FOR packing: width-32 gaps and the >32-bit legacy fallback round-trip") {
    val wide = Array(0L, 0xFFFFFFFFL + 1L, 2L * 0xFFFFFFFFL + 2L) // gap-1 = 2^32-1
    val encW = Codec.encodeDocIds(wide)
    assert(encW(0) == 0x01.toByte)
    assert(Codec.decodeDocIds(encW, 3).toSeq == wide.toSeq)
    val huge = Array(5L, 5L + (1L << 41)) // gap-1 > 32 bits -> legacy
    val encH = Codec.encodeDocIds(huge)
    assert(encH(0) == 0x00.toByte)
    assert(Codec.decodeDocIds(encH, 2).toSeq == huge.toSeq)
  }
  test("FOR packing: mixed widths round-trip at every bit width 1..31 (tfs)") {
    (1 to 31).foreach { b =>
      // top value: tf-1 = 2^b - 1 needs exactly b bits (2^31-1+1 overflows
      // Int at b=31, so top out at Int.MaxValue there)
      val max = if (b == 31) Int.MaxValue else (1 << b)
      val tfs = Array(1, max, 1 + max / 2, max, 1, 2)
      assert(Codec.decodeTfs(Codec.encodeTfs(tfs), tfs.length).toSeq == tfs.toSeq,
        s"width $b")
    }
  }
}

class BM25Spec extends AnyFunSuite {
  test("idf matches Lucene formula") {
    assert(math.abs(BM25.idf(100, 10) - math.log(1 + 90.5 / 10.5)) < 1e-12)
  }
  test("termScore monotonic in tf, antitonic in len") {
    val idf = BM25.idf(1000, 5)
    val avg = 120.0
    val s1 = BM25.termScore(idf, 1, BM25.lengthNorm(100, avg))
    val s2 = BM25.termScore(idf, 5, BM25.lengthNorm(100, avg))
    val s3 = BM25.termScore(idf, 5, BM25.lengthNorm(200, avg))
    assert(s2 > s1 && s2 > s3)
  }
  test("maxTermScore bounds every member of a block") {
    val idf = BM25.idf(5000, 37)
    val avg = 87.3
    val lens = Seq(24, 40, 110, 1000)
    val tfs = Seq(1, 2, 7)
    val ub = BM25.maxTermScore(idf, tfs.max, lens.min, avg)
    for (l <- lens; t <- tfs)
      assert(BM25.termScore(idf, t, BM25.lengthNorm(l, avg)) <= ub + 1e-12)
  }
  test("mm tiers: 2<-1 5<-2 6<90%") {
    assert(BM25.minShouldMatch(1) == 1)
    assert(BM25.minShouldMatch(2) == 2)
    assert(BM25.minShouldMatch(3) == 2)
    assert(BM25.minShouldMatch(5) == 4)
    assert(BM25.minShouldMatch(6) == 4)
    assert(BM25.minShouldMatch(7) == 6)
    assert(BM25.minShouldMatch(10) == 9)
  }
  test("dismax = max + tie*(sum-max)") {
    val s = BM25.dismax(Array(2.0, 1.0, 0.5))
    assert(math.abs(s - (2.0 + 0.01 * 1.5)) < 1e-12)
  }
}
