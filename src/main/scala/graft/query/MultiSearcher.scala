package graft.query

import graft.core._
import graft.index.{IndexMeta, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Search ACROSS index segments — the base index plus streaming delta
  * segments ([[graft.streaming.StreamingIngest]]) — with globally correct
  * BM25 statistics, the way Lucene merges per-segment stats at search time:
  *
  *   N      = sum of segment doc counts
  *   df(t)  = sum of segment dictionary dfs
  *   avgLen = sum of segment length totals / N
  *
  * Each segment's kernel runs with these GLOBAL stats and segment-LOCAL
  * norms; hits return a global docId = segment offset + local docId
  * (segments ordered as given, offsets cumulative), with Lucene tie-breaking
  * on the global id. A query over segments [A, B] therefore scores every
  * document exactly as a single merged index of A then B would.
  */
class MultiSearcher(spark: SparkSession, segmentDirs: Seq[String]) {
  import spark.implicits._

  /** Per-segment state. Dictionary lookups go through the same probe-or-
    * collect [[DictProbe]] as the single-index Searcher (vocab never forced
    * to the driver); the dense norm table is built lazily ONCE per segment
    * and reused across queries (round 1 paid a full docstats collect per
    * query per segment — MultiSearcherSpec now gates one read per segment).
    */
  private final class Segment(val dir: String, val meta: IndexMeta, val offset: Long) {
    val dict = new DictProbe(spark, s"$dir/dictionary", DictionaryMaxDriverTerms)
    lazy val tombstones: Set[Long] = graft.index.Tombstones.loadSet(spark, dir)
    lazy val norms: Array[Array[Byte]] = {
      normBuilds.incrementAndGet()
      val n = meta.nDocs.toInt
      val lens = Array.ofDim[Byte](3, n)
      spark.read.parquet(s"$dir/docstats")
        .select($"docId", $"lenContent", $"lenPath", $"lenRepo")
        .as[(Long, Int, Int, Int)].collect()
        .foreach { case (id, lc, lp, lr) =>
          lens(0)(id.toInt) = SmallFloat.intToByte4(lc)
          lens(1)(id.toInt) = SmallFloat.intToByte4(lp)
          lens(2)(id.toInt) = SmallFloat.intToByte4(lr)
        }
      lens
    }
  }

  val DefaultFields: Seq[String] = Seq("content", "path", "repo")

  /** Same semantics as Searcher.DictionaryMaxDriverTerms; set before use. */
  var DictionaryMaxDriverTerms: Long = 1L << 22

  /** Norm-table builds (tests assert one docstats read per segment). */
  private[graft] val normBuilds = new java.util.concurrent.atomic.AtomicLong(0)

  private lazy val segments: Seq[Segment] = {
    var offset = 0L
    segmentDirs.map { dir =>
      val meta = IndexMeta.fromProps(new Snapshot(dir).readProps())
      val seg = new Segment(dir, meta, offset)
      offset += meta.nDocs
      seg
    }
  }

  val totalDocs: Long = segments.map(_.meta.nDocs).sum

  /** Global average field length: length sums merged across segments. */
  val globalAvgLen: Map[String, Double] = {
    val sums = mutable.Map.empty[String, Double]
    segments.foreach { s =>
      s.meta.avgLen.foreach { case (f, avg) =>
        sums(f) = sums.getOrElse(f, 0.0) + avg * s.meta.nDocs
      }
    }
    sums.map { case (f, sum) => f -> sum / totalDocs }.toMap
  }

  def globalDf(key: (String, String)): Long =
    segments.map(_.dict.dfOf(Set(key)).getOrElse(key, 0L)).sum

  def search(query: String, k: Int, fields: Seq[String] = DefaultFields): Array[Hit] = {
    val cls = QueryPlan.clauses(query, fields)
    if (cls.isEmpty) return Array.empty
    val needed = cls.flatMap(_.perField.toSeq).toSet
    // one batched df resolution per segment (probe- or driver-cached)
    val perSegDf = segments.map(_.dict.dfOf(needed))
    val idfMap = needed.toSeq
      .map(k2 => k2 -> perSegDf.map(_.getOrElse(k2, 0L)).sum).filter(_._2 > 0)
      .map { case (k2, df) => k2 -> BM25.idf(totalDocs, df) }.toMap
    if (idfMap.isEmpty) return Array.empty
    val minMatch = BM25.minShouldMatch(cls.length)
    val fieldArr = DefaultFields.toArray
    val avg = globalAvgLen

    val top = new TopK(k)
    segments.foreach { seg =>
      val termList = idfMap.keySet.map(_._2).toSeq
      val fieldList = idfMap.keySet.map(_._1).toSeq
      val bucketList = termList
        .map(t => graft.index.IndexBuilder.bucketOf(t, seg.meta.buckets)).distinct
      val runs = spark.read.parquet(s"${seg.dir}/postings")
        .filter($"bucket".isin(bucketList: _*) &&
          $"term".isin(termList: _*) && $"field".isin(fieldList: _*))
        .as[PostingRun].collect()
      if (runs.nonEmpty) {
        val lens = seg.norms // lazily built once per segment, query-reused
        runs.groupBy(_.salt).valuesIterator.foreach { rs =>
          Kernel.scoreSalt(rs, (fi, d) => SmallFloat.byte4ToInt(lens(fi)(d.toInt)),
            cls, fieldArr, idfMap, avg, minMatch, k, seg.tombstones.contains)
            .foreach(h => top.offer(Hit(seg.offset + h.docId, h.score)))
        }
      }
    }
    top.sortedHits
  }

  /** Resolve a global docId back to (segmentDir, localDocId). */
  def locate(globalId: Long): (String, Long) = {
    val seg = segments.reverse.find(_.offset <= globalId).get
    (seg.dir, globalId - seg.offset)
  }
}
