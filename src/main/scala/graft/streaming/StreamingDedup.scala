package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch streaming deduplication — the stateful ingest-side twin of
  * the batch dedup operators (graft.ops.Dedup): a document whose canonical
  * fingerprint was already emitted in ANY earlier micro-batch is dropped,
  * and within a batch one deterministic representative survives.
  *
  * Custom keyed state via `flatMapGroupsWithState` (Structured Streaming's
  * arbitrary-state operator): state per fingerprint is a single boolean
  * ("seen"), so state size is O(distinct fingerprints), partitioned by the
  * fingerprint hash across executors — no driver state, scales with the
  * state store. This is what `dropDuplicates` cannot express when the
  * survivor must be chosen by a caller-defined preference (e.g. longest
  * text, lowest id) rather than arrival order.
  */
object StreamingDedup {

  /** Deduplicate a (possibly streaming) Dataset by fingerprint.
    *
    * @param ds     input rows (use `readStream` sources for streaming)
    * @param fpOf   canonical fingerprint (e.g. md5 of normalized text)
    * @param prefer survivor choice within a batch (total order, e.g. min id)
    */
  def dedupByFingerprint[T: Encoder](ds: Dataset[T], fpOf: T => String,
                                     prefer: (T, T) => T): Dataset[T] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(fpOf)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.reduce(prefer))
          }
      }
  }
}
