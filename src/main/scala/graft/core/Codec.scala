package graft.core

import java.nio.ByteBuffer

/** Delta + varint compression for posting blocks.
  *
  * docIDs within a block are sorted ascending; we store the first docID
  * absolute (as a varlong against the block's `firstDoc` metadata the value
  * is 0) and subsequent gaps (delta - since ids are strictly increasing the
  * gap is >= 1, we store gap as-is). Term frequencies are stored as plain
  * varints. Standard public scheme (same family as Lucene/Kafka varints).
  */
object Codec {

  /** Append an unsigned varlong (LEB128) to `buf`. */
  def writeVarLong(buf: ByteBuffer, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      buf.put(((v & 0x7F) | 0x80).toByte)
      v >>>= 7
    }
    buf.put(v.toByte)
  }

  def readVarLong(buf: ByteBuffer): Long = {
    var shift = 0
    var result = 0L
    var b = buf.get()
    while ((b & 0x80) != 0) {
      result |= (b & 0x7FL) << shift
      shift += 7
      b = buf.get()
    }
    result | ((b & 0x7FL) << shift)
  }

  /** Encode a strictly-increasing docID array as first-absolute + gaps. */
  def encodeDocIds(docIds: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(docIds.length * 10)
    var prev = 0L
    var i = 0
    while (i < docIds.length) {
      val v = if (i == 0) docIds(0) else docIds(i) - prev
      writeVarLong(buf, v)
      prev = docIds(i)
      i += 1
    }
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  def decodeDocIds(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    decodeDocIdsInto(bytes, n, out)
    out
  }

  /** [[decodeDocIds]] into a caller-owned buffer (>= n), raw index-based
    * varint reads — no ByteBuffer or output array allocated per block. The
    * posting kernel decodes millions of blocks per query batch; at 32
    * threads the decode loop sits on the memory-bandwidth ceiling
    * (QueryScalingBench round 5), so the two fresh arrays + ByteBuffer per
    * block were measurable allocation traffic on the hottest path.
    */
  def decodeDocIdsInto(bytes: Array[Byte], n: Int, out: Array[Long]): Unit = {
    var p = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = bytes(p); p += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(p); p += 1
      }
      v |= (b & 0x7FL) << shift
      prev = if (i == 0) v else prev + v
      out(i) = prev
      i += 1
    }
  }

  /** Encode term frequencies (>=1) as varints. */
  def encodeTfs(tfs: Array[Int]): Array[Byte] = {
    val buf = ByteBuffer.allocate(tfs.length * 5)
    var i = 0
    while (i < tfs.length) {
      writeVarLong(buf, tfs(i).toLong)
      i += 1
    }
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  def decodeTfs(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    decodeTfsInto(bytes, n, out)
    out
  }

  /** [[decodeTfs]] into a caller-owned buffer (>= n) — see
    * [[decodeDocIdsInto]] for why.
    */
  def decodeTfsInto(bytes: Array[Byte], n: Int, out: Array[Int]): Unit = {
    var p = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = bytes(p); p += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(p); p += 1
      }
      v |= (b & 0x7FL) << shift
      out(i) = v.toInt
      i += 1
    }
  }
}
