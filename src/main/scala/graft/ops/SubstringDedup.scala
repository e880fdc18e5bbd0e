package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-substring spans — the exact-substring dedup
  * regime of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (ACL 2022), re-expressed Spark-first. Where the paper builds a
  * monolithic suffix array, the distributed shape is a span-gram inverted
  * index: any duplicated substring of >= `span` tokens necessarily contains
  * a duplicated span-gram, so marking every token position whose span-gram
  * occurs in MORE THAN ONE document and merging marked positions whose
  * windows overlap or abut yields the maximal cross-document duplicated
  * spans exactly (at span-token granularity), with no suffix array and no
  * driver state.
  *
  * Plan shape, built for the 100 TB regime:
  *  1. tokenize + posexplode span-grams — map-only, O(total tokens) rows;
  *  2. gram -> 64-bit LONG key (wrapping signed md5 halves,
  *     [[Dedup.tokenHash64]]: engine-portable, and at 10^10 grams the
  *     birthday expectation is a handful of collisions — each worth one
  *     falsely-marked span, never a lost one);
  *  3. ONE shuffle of (8 B key, docId, pos): min/max docId as WINDOW
  *     functions over each gram key, filter `min != max` (= "appears in
  *     2+ docs") — replaces the original groupBy + semi-join, which
  *     computed AND shuffled the whole gram stream twice and spilled 122
  *     GB at the 1M-doc DedupScaleBench (318 s -> this shape, measured
  *     there). Hot grams (boilerplate in millions of docs) cost a large
  *     sort group, never a driver structure;
  *  4. per-doc sort + run-merge of marked positions into maximal spans —
  *     collect_list bounded by the doc's own length, merge is a linear
  *     index-arithmetic pass (no O(n^2) array_contains).
  *
  * Self-repetition WITHIN a doc is deliberately out of scope here (that is
  * the Gopher repetition signal, `q_quality_repetition`); a gram must occur
  * in two distinct documents to mark its positions.
  */
object SubstringDedup {

  /** Per-document maximal cross-document duplicated spans of `span`+ tokens.
    *
    * Returns one row per document that HAS at least one duplicated span:
    * (doc_id, n_tokens, n_spans, dup_tokens, spans "s-e|s-e" 1-based
    * inclusive token positions, clean_text = the document with every
    * duplicated span removed — the Lee et al. cut operation).
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      span: Int): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("w"))
    val grams = toks.filter(size(col("w")) >= span)
      .select(col("doc_id"), posexplode(Dedup.shingles(col("w"), span)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        Dedup.tokenHash64Native(docs.sparkSession, col("col")).as("g"))
    val perGram = Window.partitionBy("g")
    val marked = grams
      .withColumn("mn", min("doc_id").over(perGram))
      .withColumn("mx", max("doc_id").over(perGram))
      .filter(col("mn") =!= col("mx"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("ps"))

    // gaps-and-islands over the sorted marked positions, at COVERAGE
    // granularity: position p covers tokens [p, p+span-1], so positions p
    // and q (p < q) belong to one maximal covered interval iff q <= p +
    // span (overlapping or abutting windows). Splitting only at gap > span
    // keeps spans disjoint — splitting at gap > 1 (the original shape)
    // emitted OVERLAPPING spans whenever marked positions sat 2..span-1
    // apart (e.g. grams at p and p+2 duplicated, p+1 not), double-counting
    // dup_tokens past n_tokens. Runs pair 1:1 in order; a run [p..q]
    // covers tokens [p, q + span - 1].
    val idx = sequence(lit(1), size(col("ps")))
    val starts = transform(
      filter(idx, i => i === 1 ||
        element_at(col("ps"), i) - element_at(col("ps"), i - 1) > span),
      i => element_at(col("ps"), i))
    val ends = transform(
      filter(idx, i => i === size(col("ps")) ||
        element_at(col("ps"), i + 1) - element_at(col("ps"), i) > span),
      i => element_at(col("ps"), i))
    val withSpans = marked.select(col("doc_id"),
      zip_with(starts, ends,
        (s, e) => struct(s.as("s"), (e + lit(span) - 1).as("e"))).as("sp"))

    toks.join(withSpans, Seq("doc_id"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(col("sp")).cast("long").as("n_spans"),
        aggregate(col("sp"), lit(0L),
          (acc, sp) => acc + sp.getField("e") - sp.getField("s") + 1)
          .as("dup_tokens"),
        array_join(transform(col("sp"),
          sp => concat(sp.getField("s").cast("string"), lit("-"),
            sp.getField("e").cast("string"))), "|").as("spans"),
        array_join(transform(
          filter(sequence(lit(1), size(col("w"))),
            i => !exists(col("sp"),
              sp => i >= sp.getField("s") && i <= sp.getField("e"))),
          i => element_at(col("w"), i)), " ").as("clean_text"))
  }
}
