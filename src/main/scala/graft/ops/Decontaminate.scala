package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share any word
  * n-gram with an evaluation/benchmark set (the GPT-3/PaLM-style n-gram
  * overlap check every serious pre-training pipeline runs before the corpus
  * ships). Re-expressed Spark-first:
  *
  *  1. both sides tokenize (lowercased whitespace words) and shingle into
  *     n-grams keyed by a 64-bit hash (first 16 md5 hex chars — the same
  *     engine-portable key [[SubstringDedup]] uses; at 10^10 grams the
  *     birthday expectation is a handful of collisions, each worth one
  *     falsely-flagged doc, never a missed one);
  *  2. the eval side collapses to DISTINCT grams with a min-doc attribution
  *     (groupBy(g).min — map-side partials, hot boilerplate grams never
  *     materialize a member list). Benchmarks are MBs against a corpus of
  *     TBs, so this side is broadcast-sized BY CONSTRUCTION;
  *  3. the train gram stream dedups to (doc, gram) pairs and inner-joins the
  *     eval gram set — AQE broadcasts the eval side, so the corpus-sized
  *     stream never shuffles for the probe;
  *  4. per-doc counts of matched grams aggregate over the (tiny) matched
  *     pairs only, then a final broadcast join annotates the full corpus —
  *     every train doc emerges with its contamination evidence, so the
  *     caller chooses drop/keep/quarantine policy downstream.
  *
  * The one corpus-sized shuffle is the (doc, gram) distinct in step 3; at
  * the 100 TB target that is the same O(total tokens) exchange the substring
  * and MinHash dedups already pay, and it exists only to make per-doc match
  * counts DISTINCT-gram counts (drop the distinct and counts become
  * occurrence counts, flag semantics unchanged).
  */
object Decontaminate {

  private def gramKeys(docs: DataFrame, idCol: String, textCol: String, n: Int) =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
      .select(col("doc_id"), explode(Dedup.shingles(col("w"), n)).as("gram"))
      .select(col("doc_id"), substring(md5(col("gram")), 1, 16).as("g"))

  /** Annotate every `train` document with its n-gram overlap against `eval`:
    * (doc_id, n_grams, n_dirty_grams = distinct shared grams, first_eval_doc
    * = smallest eval doc sharing one (null when clean), contaminated).
    */
  def annotate(train: DataFrame, eval: DataFrame, idCol: String,
               textCol: String, n: Int): DataFrame = {
    val evalGrams = gramKeys(eval, idCol, textCol, n)
      .groupBy("g").agg(min("doc_id").as("eval_doc"))
    val dirty = gramKeys(train, idCol, textCol, n)
      .distinct()
      .join(evalGrams, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dirty_grams"), min("eval_doc").as("first_eval_doc"))
    train
      .select(col(idCol).cast("long").as("doc_id"),
        greatest(size(split(lower(trim(col(textCol))), "\\s+")) - (n - 1), lit(0))
          .cast("long").as("n_grams"))
      .join(dirty, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dirty_grams"), lit(0L)).as("n_dirty_grams"),
        col("first_eval_doc"),
        (coalesce(col("n_dirty_grams"), lit(0L)) > 0).as("contaminated"))
  }
}
