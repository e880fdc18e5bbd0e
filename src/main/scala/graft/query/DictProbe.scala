package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path dictionary lookup: per-query pushed-filter probes of the
  * range-partitioned dictionary table, with a resolved-(field, term) -> df
  * cache (negative results cached as 0 so absent terms never re-probe).
  *
  * The dictionary is written `repartitionByRange(field, term)` +
  * `sortWithinPartitions` (IndexBuilder), so a probe's `term IN (...)` filter
  * prunes to O(query terms) parquet row groups via min/max stats — one tiny
  * job per batch of unseen terms, never a vocabulary-sized driver collect.
  * For small vocabularies (below `maxDriverTerms`) the whole table is
  * collected once instead — lowest latency when it safely fits. Set
  * `maxDriverTerms = 0` to force the probe path (the strategies are
  * answer-identical; EngineSpec gates this).
  */
final class DictProbe(spark: SparkSession, dictPath: String,
                      maxDriverTerms: Long = 1L << 22) extends Serializable {
  import spark.implicits._

  private lazy val dictDF: DataFrame = spark.read.parquet(dictPath)

  /** one count job, metadata-cheap on a (field,term,df,cf) columnar table */
  private lazy val vocabSize: Long =
    if (maxDriverTerms <= 0) Long.MaxValue else dictDF.count()

  private lazy val full: Option[Map[(String, String), Long]] =
    if (vocabSize <= maxDriverTerms)
      Some(dictDF.select($"field", $"term", $"df").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap)
    else None

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  /** Probe jobs issued (tests assert repeat queries stay at 0 extra). */
  private[graft] val probes = new java.util.concurrent.atomic.AtomicLong(0)

  /** df per key; keys with no dictionary entry are absent from the result. */
  def dfOf(keys: Set[(String, String)]): Map[(String, String), Long] = full match {
    case Some(d) => keys.iterator.flatMap(k => d.get(k).map(k -> _)).toMap
    case None =>
      val missing = keys.filterNot(cache.containsKey)
      if (missing.nonEmpty) {
        probes.incrementAndGet()
        val terms = missing.map(_._2).toSeq
        val fields = missing.map(_._1).toSeq
        val found = dictDF
          .filter($"term".isin(terms: _*) && $"field".isin(fields: _*))
          .select($"field", $"term", $"df")
          .collect()
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
        missing.foreach(k => cache.put(k, Long.box(found.getOrElse(k, 0L))))
      }
      keys.iterator.flatMap { k =>
        val df = cache.get(k)
        if (df == null || df.longValue == 0L) None else Some(k -> df.longValue)
      }.toMap
  }
}
