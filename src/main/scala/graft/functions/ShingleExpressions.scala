package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared MinHash family constants — one source for [[MinHashSigs]] and
  * [[ShingleSigs]]; mirrors graft.ops.Dedup's formulas (OpsSpec gates the
  * bit-identity through the builtins chain, the DuckDB oracles mirror the
  * same constants).
  */
private[functions] object MinhashConsts {
  val P = 4294967311L
  def affA(n: Int): Array[Long] =
    Array.tabulate(n)(k => (2654435761L * (k + 1)) % 2147483647L)
  def affC(n: Int): Array[Long] =
    Array.tabulate(n)(k => (2246822519L * (k + 1)) % 2147483647L)
  def combK(rows: Int): Array[Long] = {
    val ks = Array(1000000007L, 1000000033L, 1000000087L, 1000000093L,
      1000000097L, 1000000103L, 1000000123L, 1000000181L)
    Array.tabulate(rows)(j => ks(j % 8))
  }
}

/** Shared one-pass shingle digesting: md5 over the EXACT bytes
  * `concat_ws(" ", w(i..i+k-1))` would produce (UTF-8 word bytes joined by
  * 0x20, null words skipped with their separator — concat_ws semantics), so
  * the fused forms are bit-identical to the builtins chain
  * `md5(concat_ws(" ", ...))` they replace. Word byte arrays are extracted
  * ONCE per row (O(tokens) allocations) instead of one shingle STRING per
  * position (O(tokens·k) bytes + an interpreted concat_ws HOF eval per
  * element — the dominant CPU of the 1M-doc banding stage after the
  * native-sigs change).
  */
private[functions] object ShingleDigest {
  private val mdTL = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Feed shingle (i..i+k-1) of `words` into a fresh digest; returns the
    * 16-byte md5.
    */
  def digestShingle(md: java.security.MessageDigest,
                    words: Array[Array[Byte]], i: Int, k: Int): Array[Byte] = {
    md.reset()
    var first = true
    var j = i
    while (j < i + k) {
      val w = words(j)
      if (w != null) {
        if (!first) md.update(0x20.toByte)
        md.update(w)
        first = false
      }
      j += 1
    }
    md.digest()
  }

  def md(): java.security.MessageDigest = mdTL.get()

  /** Extract UTF-8 bytes of every word once (null elements stay null). */
  def wordBytes(arr: ArrayData): Array[Array[Byte]] = {
    val n = arr.numElements()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    out
  }
}

/** Fused shingle -> 64-bit hash: `graft_shingle_hash64s(w, k)` ==
  * `transform(Dedup.shingles(w, k), s -> graft_hash64(s))` bit for bit
  * (OpsSpec gates it), minus the k-gram STRING per position and the
  * interpreted concat_ws lambda. Returns the EMPTY array when the input has
  * fewer than k words (matching shingles()' when/otherwise), so
  * explode/posexplode drop such rows identically. One row of output element
  * i is the hash of the 1-based gram at position i+1 — positions are
  * preserved for the posexplode consumers (SubstringDedup).
  */
case class ShingleHash64s(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash64s expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash64s"

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64s =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val words = ShingleDigest.wordBytes(arr)
    val md = ShingleDigest.md()
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val d = ShingleDigest.digestShingle(md, words, i, k)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused winnowing fingerprints (Schleimer et al. 2003): `graft_winnow(w, k,
  * win)` == `TextOps.winnowFingerprints(w, k, win)` bit for bit (OpsSpec
  * gates it): md5-hex each k-gram straight from the word byte arrays, slide
  * a `win`-wide monotonic-deque minimum (O(grams), vs the builtins form's
  * O(grams·win) slice+array_min allocations under interpreted HOF eval —
  * and the HOF tree re-evaluated its gram array per reference site, the
  * 4-5 s battery entry r7 measured), collect sorted-distinct minima.
  * Gram hex strings are lowercase ASCII, so UTF8String binary order ==
  * the builtins' string order; a doc with grams but fewer than `win` of
  * them contributes its global minimum; no grams -> empty array (explode
  * drops the doc identically).
  */
case class Winnow(child: Expression, k: Int, win: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  private val hexChars = "0123456789abcdef".getBytes

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[AnyRef])
    val words = ShingleDigest.wordBytes(arr)
    val md = ShingleDigest.md()
    val nGrams = n - k + 1
    val grams = new Array[UTF8String](nGrams)
    var i = 0
    while (i < nGrams) {
      val d = ShingleDigest.digestShingle(md, words, i, k)
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(d(b) & 0xf)
        b += 1
      }
      grams(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    val out = new java.util.TreeSet[UTF8String]()
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < nGrams) {
      while (!dq.isEmpty && grams(dq.peekLast()).compareTo(grams(i)) >= 0)
        dq.pollLast()
      dq.addLast(i)
      if (i >= win - 1) {
        while (dq.peekFirst() <= i - win) dq.pollFirst()
        out.add(grams(dq.peekFirst()))
      }
      i += 1
    }
    // fewer grams than the window: the global minimum (deque front)
    if (nGrams < win) out.add(grams(dq.peekFirst()))
    val res = new Array[AnyRef](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    new GenericArrayData(res)
  }
}

/** Fused shingle -> MinHash band signatures: `graft_shingle_sigs(w, k,
  * bands, rows)` == the whole builtins chain `array_distinct(shingles(w,k))
  * -> minhashHashes -> minhashBandsFromHashes` bit for bit (OpsSpec gates
  * it): ONE pass over the word array digests each k-gram (no shingle
  * strings, no distinct — duplicates cannot change a minimum), takes the
  * top-32 digest bits (== shiftrightunsigned(hash64, 32)) and folds all
  * bands·rows affine minima inline. NULL when the input has fewer than k
  * words, matching array_min-of-empty = null through the chain, so the
  * `sig IS NULL` shingle-less-doc filter behaves identically.
  */
case class ShingleSigs(child: Expression, k: Int, bands: Int, rows: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_sigs expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // NULL for shingle-less docs even though the child is non-null (same
  // rationale as MinHashSigs.nullable)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_sigs"

  override protected def withNewChildInternal(newChild: Expression): ShingleSigs =
    copy(child = newChild)

  @transient private lazy val affA = MinhashConsts.affA(bands * rows)
  @transient private lazy val affC = MinhashConsts.affC(bands * rows)
  @transient private lazy val combK = MinhashConsts.combK(rows)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return null
    val words = ShingleDigest.wordBytes(arr)
    val md = ShingleDigest.md()
    val nh = bands * rows
    val mins = new Array[Long](nh)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val P = MinhashConsts.P
    var i = 0
    while (i <= n - k) {
      val d = ShingleDigest.digestShingle(md, words, i, k)
      // top-32 digest bits as an unsigned long — identical to
      // shiftrightunsigned(graft_hash64, 32) / conv(hex[1,8],16,10)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var kk = 0
      while (kk < nh) {
        val v = (affA(kk) * h + affC(kk)) % P
        if (v < mins(kk)) mins(kk) = v
        kk += 1
      }
      i += 1
    }
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var s = 0L
      var j = 0
      while (j < rows) { s += (mins(b * rows + j) * combK(j)) % P; j += 1 }
      sigs(b) = s % P
      b += 1
    }
    new GenericArrayData(sigs)
  }
}
