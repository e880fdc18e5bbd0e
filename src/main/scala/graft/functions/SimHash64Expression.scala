package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for SimHash-64 over a token array — ONE pass
  * per row instead of the 64 `aggregate()` passes of the pure-column form in
  * [[graft.ops.Dedup.simhash64]] (the preferred extension ladder: compose
  * builtins if cheap enough, else a native Expression, never a Scala UDF).
  *
  * Bit-for-bit identical semantics to the column form:
  *  - token hash = first 8 bytes of md5(token) as a big-endian long
  *    (== (conv(hex[0,8],16,10) << 32) | conv(hex[8,8],16,10))
  *  - first `maxTokens` tokens vote +1/-1 per bit; bit set iff votes > 0
  *
  * Interpreted eval (CodegenFallback): the md5 loop dominates either way;
  * a doGenCode variant would only inline the loop shell.
  */
case class SimHash64(child: Expression, maxTokens: Int = 128)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  // per-thread digest (see Hash64.md — same concurrent-eval hazard class)
  @transient private lazy val mdTL =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), maxTokens)
    val votes = new Array[Int](64)
    val md = mdTL.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) sig |= (1L << bit); bit += 1 }
    sig
  }
}

/** Native one-pass 64-bit token hash: first 8 bytes of md5(string) as a
  * big-endian SIGNED long — value-identical to [[graft.ops.Dedup.tokenHash64]]
  * (`(conv(hex[0,8],16,10) << 32) | conv(hex[8,8],16,10)`, OpsSpec gates the
  * bit-identity) but with NO hex-string intermediate: the column form
  * allocates a 32-char hex string plus two substrings per value, which at
  * one hash per exploded gram (SubstringDedup, Decontaminate — hundreds of
  * millions of rows at the 1M-doc bench) is the hot allocation site.
  * Interpreted eval (CodegenFallback): the md5 digest dominates either way.
  */
case class Hash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash64 expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override protected def withNewChildInternal(newChild: Expression): Hash64 =
    copy(child = newChild)

  // one digest per THREAD, not per instance: tasks normally deserialize
  // their own tree, but a plan evaluated driver-side (e.g. a Dataset shared
  // across caller threads, ConvertToLocalRelation) can hit one instance
  // concurrently — a shared MessageDigest then interleaves reset()/digest()
  // and silently corrupts hashes (ADVICE r5). ThreadLocal keeps the
  // provider lookup off the per-value path either way.
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any = {
    val m = md.get()
    m.reset()
    val d = m.digest(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h
  }
}

/** Native one-pass MinHash band signatures over a pre-hashed shingle array:
  * ONE traversal computes all bands·rows affine minima and folds each band's
  * r minima into its LONG signature — bit-identical to the builtins form
  * ([[graft.ops.Dedup.minhashBandsFromHashes]]: bands·rows separate
  * `array_min(transform(...))` interpreted-HOF passes, each allocating an
  * intermediate array; at r=4 that stage was 2,386 CPU-s of the 1M-doc
  * dedupCorpus leg). Constants duplicate Dedup's three one-line formulas;
  * OpsSpec gates element-wise identity against the builtins form, the same
  * discipline as graft_hash64 / the DuckDB oracle mirrors.
  *
  * Returns array<long> of `bands` signatures; NULL for an empty (or
  * all-null) hash array, matching array_min-of-empty = null so
  * bandedProjection's `sig IS NULL` shingle-less-doc filter behaves
  * identically on both paths.
  */
case class MinHashSigs(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sigs expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // NULL on an empty/all-null hash array even when the child is non-null —
  // without this override the inherited child.nullable=false would let the
  // optimizer constant-fold a `sig IS NULL` shingle-less-doc filter away
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sigs"

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  private val P = MinhashConsts.P
  @transient private lazy val affA = MinhashConsts.affA(bands * rows)
  @transient private lazy val affC = MinhashConsts.affC(bands * rows)
  @transient private lazy val combK = MinhashConsts.combK(rows)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nh = bands * rows
    val mins = new Array[Long](nh)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen += 1
        val h = arr.getLong(i)
        var k = 0
        while (k < nh) {
          val v = (affA(k) * h + affC(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (seen == 0) return null
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var s = 0L
      var j = 0
      while (j < rows) { s += (mins(b * rows + j) * combK(j)) % P; j += 1 }
      sigs(b) = s % P
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }
}

object GraftFunctions {
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"graft native function arg '$what' must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
        (exprs: Seq[Expression]) => SimHash64(exprs.head)),
      (FunctionIdentifier("graft_hash64"),
        new ExpressionInfo(classOf[Hash64].getName, "graft_hash64"),
        (exprs: Seq[Expression]) => Hash64(exprs.head)),
      (FunctionIdentifier("graft_minhash_sigs"),
        new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
        (exprs: Seq[Expression]) => MinHashSigs(exprs.head,
          litInt(exprs(1), "bands"), litInt(exprs(2), "rows"))),
      (FunctionIdentifier("graft_shingle_hash64s"),
        new ExpressionInfo(classOf[ShingleHash64s].getName, "graft_shingle_hash64s"),
        (exprs: Seq[Expression]) => ShingleHash64s(exprs.head, litInt(exprs(1), "k"))),
      (FunctionIdentifier("graft_shingle_sigs"),
        new ExpressionInfo(classOf[ShingleSigs].getName, "graft_shingle_sigs"),
        (exprs: Seq[Expression]) => ShingleSigs(exprs.head, litInt(exprs(1), "k"),
          litInt(exprs(2), "bands"), litInt(exprs(3), "rows"))),
      (FunctionIdentifier("graft_winnow"),
        new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
        (exprs: Seq[Expression]) => Winnow(exprs.head, litInt(exprs(1), "k"),
          litInt(exprs(2), "win"))),
      (FunctionIdentifier("graft_cms"),
        new ExpressionInfo(classOf[CmsSketch].getName, "graft_cms"),
        // an AggregateFunction from the registry is wrapped in its
        // AggregateExpression by the analyzer (ResolveFunctions)
        (exprs: Seq[Expression]) => CmsSketch(exprs.head,
          litInt(exprs(1), "depth"), litInt(exprs(2), "width"))))

  /** Register graft's native expressions on a session (idempotent); after
    * this, `call_function("graft_simhash64", col)` / SQL resolve to the
    * one-pass expressions.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    entries.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}

/** SparkSessionExtensions entry point — the spark-submit-friendly form of
  * [[GraftFunctions.register]]:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *
  * injects graft's native expressions into EVERY session built from that
  * config (new sessions, cloned sessions, thrift connections), with no code
  * change in the submitting application. EngineSpec proves the injected
  * function resolves in SQL on a fresh session.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[Hash64].getName, "graft_hash64"),
      (exprs: Seq[Expression]) => Hash64(exprs.head)))
  }
}
