package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-Min sketch aggregate (Cormode & Muthukrishnan, J. Algorithms 2005)
  * as a native [[TypedImperativeAggregate]] — the single-pass frequency
  * summary a 100-TB pipeline uses where an exact `groupBy(term).count()`
  * would shuffle one row per distinct key: executors fold their partitions
  * into local d×w counter matrices and only the FIXED-SIZE sketches merge
  * (vector add), so the exchange is O(partitions · d · w) regardless of
  * corpus size or key skew. Point estimate = min over the d rows of the
  * probed cell — an upper bound on the true count with the classic
  * (ε = e/w, δ = e^-d) guarantee.
  *
  * Everything is merge-order independent (cell updates are sums; estimates
  * are mins of sums), so results are bit-identical at any parallelism —
  * which is what lets `q_cms_wordfreq` carry a full DuckDB replay oracle
  * rather than a rows-only check.
  *
  * Hash family: row i probes cell ((a_i·h + c_i) mod P) mod w with h the
  * unsigned high 32 bits of graft_hash64(value) and (a_i, c_i, P) the
  * repo-wide MinHash affine family ([[MinhashConsts]]) — already mirrored
  * verbatim in the DuckDB oracles, and a_i·h < 2^63 so the arithmetic never
  * overflows a long on either engine.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 1, "graft_cms needs depth >= 1 and width >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a string column, got ${other.catalogString}")
  }

  @transient private lazy val affA = MinhashConsts.affA(depth)
  @transient private lazy val affC = MinhashConsts.affC(depth)
  @transient private lazy val mdTL =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val md = mdTL.get()
      md.reset()
      val d = md.digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      // unsigned high 32 bits of the md5 == ('0x' || substr(md5(x),1,8))::BIGINT
      var h = 0L
      var b = 0
      while (b < 4) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var i = 0
      while (i < depth) {
        val cell = (((affA(i) * h + affC(i)) % MinhashConsts.P) % width).toInt
        buffer(i * width + cell) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

/** Column-side companions for [[CmsSketch]] — builtins-only, so estimates
  * stay codegen'd and DuckDB-expressible.
  */
object Cms {

  /** The sketch aggregate as a Column: `df.agg(Cms.sketch($"word", 4, 64))`.
    * Registers graft functions on `spark` (idempotent).
    */
  def sketch(spark: SparkSession, value: Column, depth: Int, width: Int): Column = {
    GraftFunctions.register(spark)
    call_function("graft_cms", value, lit(depth), lit(width))
  }

  /** Point estimate for `key` from a sketch column produced by [[sketch]]
    * with the same (depth, width): min over the d probed cells. Pure
    * builtins (the literal affine-constant arrays index by row), so the
    * probe side needs no native function and mirrors 1:1 in the oracle SQL.
    */
  def estimate(spark: SparkSession, sketchCol: Column, key: Column,
               depth: Int, width: Int): Column = {
    GraftFunctions.register(spark)
    val h = shiftrightunsigned(call_function("graft_hash64", key), 32)
    val a = typedlit(MinhashConsts.affA(depth).toSeq)
    val c = typedlit(MinhashConsts.affC(depth).toSeq)
    array_min(transform(sequence(lit(0), lit(depth - 1)), i => {
      val cell = (element_at(a, i + 1) * h + element_at(c, i + 1)) % lit(MinhashConsts.P) % lit(width)
      element_at(sketchCol, (lit(1) + i * lit(width) + cell).cast("int"))
    }))
  }
}
