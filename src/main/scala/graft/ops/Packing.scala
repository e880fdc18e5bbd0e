package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GPT-style sequence-packing prep: conceptually concatenate the corpus in
  * doc order and split at a fixed token budget — every document maps to its
  * GLOBAL token offset and the packed-sequence ids its tokens land in (the
  * "concat-and-chunk" regime most LLM pipelines actually train on; a doc
  * with n_seqs > 1 straddles a sequence boundary).
  *
  * The offset computation is the scale-critical part: a running-sum window
  * with no partition key collapses Spark to ONE task over the whole corpus.
  * This reuses the docId-assignment shape (IndexBuilder.withDocIds):
  * range-partition by the order key, per-partition token sums (one tiny
  * collect of O(partitions) rows), broadcast prefix offsets, per-partition
  * imperative running sum — ONE shuffle, no global sort, no single-task
  * stage. The partitioned table is persisted across the two passes because
  * repartitionByRange SAMPLES its bounds (two executions may split
  * differently, which would break the pid-keyed offsets); the result is
  * localCheckpointed so the cache can be released eagerly.
  */
object Packing {

  /** (doc_id, n_tokens, offset, first_seq, last_seq, n_seqs) per document,
    * offsets in doc_id order, sequences of `seqLen` tokens. Output is
    * parallelism-independent (CurationPropertySpec gates 2 vs 16
    * partitions bit-identical).
    *
    * Null handling (explicit, like the sibling curation ops): a NULL text
    * counts 0 tokens — the doc keeps its row and its stream offset but
    * contributes nothing (first_seq = last_seq = the sequence its offset
    * falls in, so the schema stays non-nullable). An EMPTY string counts 1
    * token (split("") = [""]), matching the oracle's len(string_split_regex)
    * and the tokenizer convention everywhere else in the battery.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        // coalesce BEFORE the typed pass: size(split(null)) is null, and a
        // null in the non-nullable tuple encoder kills the job mid-stage
        greatest(
          coalesce(size(split(trim(col(textCol)), "\\s+")).cast("long"), lit(0L)),
          lit(0L)).as("n_tokens"))
      .repartitionByRange(p, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = toks.groupBy(spark_partition_id().as("pid"))
      .agg(sum("n_tokens").as("s")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = sums.map { case (pid, s) =>
      val e = pid -> acc; acc += s; e
    }.toMap
    val len = seqLen.toLong
    val out = toks.as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var off = offsets.getOrElse(pid, 0L)
        it.map { case (id, n) =>
          val o = off; off += n
          // max(n,1) pins a 0-token doc's last_seq to first_seq instead of
          // the previous sequence (o-1)/len — n_seqs stays 1, never 0 or
          // negative, and the inverse view filters the zero contribution
          (id, n, o, o / len, (o + math.max(n, 1L) - 1L) / len)
        }
      }
      .toDF("doc_id", "n_tokens", "offset", "first_seq", "last_seq")
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .localCheckpoint()
    toks.unpersist()
    out
  }

  /** The consumer-facing inverse of [[packSequences]]: one row per
    * (packed sequence, contributing document) — `seq_id -> (doc_id,
    * doc_token_start, n_tokens)`, where doc_token_start is 1-based within
    * the document and n_tokens is the portion landing in that sequence (a
    * doc straddling a boundary emits one row per sequence it touches). A
    * trainer reads SEQUENCES, not docs: this is the lookup that says which
    * document slices to concatenate to materialize sequence s. Map-only
    * from the packing offsets (explode of first_seq..last_seq — each doc
    * emits n_seqs rows, so output size is O(docs + sequences)); 0-token
    * docs contribute no rows.
    */
  def packedSequenceView(packed: DataFrame, seqLen: Int): DataFrame = {
    val len = lit(seqLen.toLong)
    packed
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("offset"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .withColumn("g_start", greatest(col("offset"), col("seq_id") * len))
      .select(col("seq_id"), col("doc_id"),
        (col("g_start") - col("offset") + 1).as("doc_token_start"),
        (least(col("offset") + col("n_tokens"), (col("seq_id") + 1) * len)
          - col("g_start")).as("n_tokens"))
  }
}
