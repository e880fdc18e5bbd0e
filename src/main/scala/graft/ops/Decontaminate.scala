package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share any word
  * n-gram with an evaluation/benchmark set (the GPT-3/PaLM-style n-gram
  * overlap check every serious pre-training pipeline runs before the corpus
  * ships). Re-expressed Spark-first:
  *
  *  1. both sides tokenize (lowercased whitespace words) and shingle into
  *     n-grams keyed by a 64-bit LONG hash ([[Dedup.tokenHash64]] — the
  *     same engine-portable key [[SubstringDedup]] uses, 8 B across the
  *     shuffle instead of a 16 B hex string; at 10^10 grams the birthday
  *     expectation is a handful of collisions, each worth one
  *     falsely-flagged doc, never a missed one);
  *  2. the eval side collapses to DISTINCT grams with a min-doc attribution
  *     (groupBy(g).min — map-side partials, hot boilerplate grams never
  *     materialize a member list). Benchmarks are MBs against a corpus of
  *     TBs, so this side is broadcast-sized BY CONSTRUCTION;
  *  3. the train gram stream inner-joins the eval gram set FIRST — AQE
  *     broadcasts the eval side, so the probe is a map-side filter and the
  *     corpus-sized stream NEVER shuffles. Per-doc distinct-gram counts
  *     aggregate over the (tiny) matched pairs only — distinct-before-join
  *     was the original shape and its (doc, gram) dedup of the whole
  *     corpus spilled 31 GB at the 1M-doc DedupScaleBench; distinct-after-
  *     join is value-identical and free;
  *  4. a final broadcast join annotates the full corpus — every train doc
  *     emerges with its contamination evidence, so the caller chooses
  *     drop/keep/quarantine policy downstream.
  *
  * Net: NO corpus-sized shuffle anywhere — the op is tokenize/hash-bound,
  * which is the property that matters at 100 TB.
  */
object Decontaminate {

  private def gramKeys(docs: DataFrame, idCol: String, textCol: String, n: Int) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // fused shingle->hash64 (see SubstringDedup.gramStream): no gram string
    // per position, one native pass, bit-identical values
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
      .select(col("doc_id"),
        explode(call_function("graft_shingle_hash64s", col("w"), lit(n))).as("g"))
  }

  /** Annotate every `train` document with its n-gram overlap against `eval`:
    * (doc_id, n_grams, n_dirty_grams = distinct shared grams, first_eval_doc
    * = smallest eval doc sharing one (null when clean), contaminated).
    */
  def annotate(train: DataFrame, eval: DataFrame, idCol: String,
               textCol: String, n: Int): DataFrame = {
    val evalGrams = gramKeys(eval, idCol, textCol, n)
      .groupBy("g").agg(min("doc_id").as("eval_doc"))
    // explicit broadcast: the eval side is broadcast-sized BY CONTRACT
    // (benchmark sets are MBs). Left to AQE, the probe planned as SMJ and
    // the whole gram stream took a 4.4 GB disk round-trip before AQE's
    // local-read BHJ downgrade (measured, 1M-doc DedupScaleBench); the
    // hint keeps the probe a pure map-side filter
    val dirty = gramKeys(train, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(countDistinct("g").as("n_dirty_grams"), min("eval_doc").as("first_eval_doc"))
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
