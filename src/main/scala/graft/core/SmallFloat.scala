package graft.core

/** Lucene-compatible 1-byte norm encoding ("SmallFloat" int4/byte4 scheme).
  *
  * The reference's Solr config leaves similarity at the Lucene default
  * (/root/reference/solr/config/schema.xml:374-377), which stores the document
  * field length quantized to one byte. BM25 scores computed without this
  * quantization diverge from the reference; with it, length values decode to
  * the exact integers Lucene would use. The algorithm is public (Apache Lucene
  * `org.apache.lucene.util.SmallFloat`, re-derived here from the published
  * scheme: 3 mantissa bits + 5 exponent bits, with the low 24 values exact).
  */
object SmallFloat {

  /** Encode a non-negative long into 4 bits of mantissa-ish precision
    * (values 0-7 exact, larger values keep the top 4 significant bits).
    */
  def longToInt4(i: Long): Int = {
    require(i >= 0, s"Only supports positive values, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) {
      i.toInt // subnormal: exact
    } else {
      val shift = numBits - 4
      var encoded = (i >>> shift).toInt
      encoded &= 0x07 // drop the implicit most-significant bit
      encoded |= (shift + 1) << 3 // 0 reserved for subnormals
      encoded
    }
  }

  /** Inverse of [[longToInt4]] (lossy: returns the lower bound of the bucket). */
  def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private val MaxInt4 = longToInt4(Int.MaxValue)
  /** Values below this encode exactly into the free byte space. */
  val NumFreeValues: Int = 255 - MaxInt4

  /** Encode a non-negative int into a single byte; small values (< ~24) exact. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"Only supports positive values, got $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4((i - NumFreeValues).toLong)).toByte
  }

  /** Decode a norm byte back to the (bucketed) field length. */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else {
      val decoded = NumFreeValues + int4ToLong(i - NumFreeValues)
      Math.toIntExact(decoded)
    }
  }

  /** The quantized field length Lucene would use for a field of `len` terms. */
  def quantizeLength(len: Int): Int = byte4ToInt(intToByte4(len))
}
