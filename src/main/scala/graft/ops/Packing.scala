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
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
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
          (id, n, o, o / len, (o + n - 1) / len)
        }
      }
      .toDF("doc_id", "n_tokens", "offset", "first_seq", "last_seq")
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .localCheckpoint()
    toks.unpersist()
    out
  }
}
