package graft.ops

import org.apache.spark.sql.DataFrame
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
  *  3. the gram stream is PERSISTED (tokenize+digest runs once — the
  *     unpersisted round-5 shape recomputed it per consumer), duplicated
  *     grams come from a map-side-combinable groupBy(g) min/max(doc_id)
  *     (a hot gram collapses to one partial row per map partition — no
  *     single task ever owns all of a boilerplate gram's occurrences),
  *     and marked positions are the stream SEMI-JOINED back on the 8-byte
  *     key. The round-5 window form (min/max over Window.partitionBy(g))
  *     shuffled once but forced EVERY occurrence of a gram into one task's
  *     sort group: a license-header 10-gram present in 10^8 docs became a
  *     single straggler task. Here the aggregate side is skew-proof by
  *     partial aggregation and the probe side is an equi-join AQE can
  *     skew-split (OptimizeSkewedJoin handles left-semi), so the worst key
  *     costs parallel work, not one task. DedupScaleBench's `hotspans` leg
  *     (a boilerplate span planted in >= 20% of 1M docs) gates max/median
  *     task duration on the heavy stages;
  *  4. per-doc sort + run-merge of marked positions into maximal spans —
  *     collect_list bounded by the doc's own length; span reconstruction
  *     and the clean-text cut are both LINEAR two-pointer passes over the
  *     sorted disjoint spans (the round-5 per-token `exists` over the span
  *     array was O(tokens x spans) per doc — quadratic on a pathological
  *     row).
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
    *
    * Eager at the marked-positions step: the gram stream is cached for its
    * two consumers (dup-gram aggregate, semi-join probe) and released once
    * the per-doc marked positions — doc-count-sized — are materialized via
    * localCheckpoint, so the returned frame holds no reference to the
    * corpus-sized gram cache.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      span: Int): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("w"))
    val grams = toks.filter(size(col("w")) >= span)
      .select(col("doc_id"), posexplode(Dedup.shingles(col("w"), span)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        Dedup.tokenHash64Native(docs.sparkSession, col("col")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // "appears in 2+ docs" as a map-side-combinable aggregate: min/max are
    // algebraic, so a hot gram contributes ONE partial row per map
    // partition and the post-aggregate exchange carries ~distinct-gram
    // rows of (8 B key, 2 longs) — never a straggler sort group
    val dup = grams.groupBy("g")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("g")
    val marked = grams.join(dup, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("ps"))
      .localCheckpoint()
    grams.unpersist()

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

    // clean_text = tokens outside every span. Spans are sorted and
    // DISJOINT by construction, so one two-pointer pass suffices: the
    // accumulator carries (p = last covered position, parts = kept slices)
    // and each span appends the gap slice (p, s) before jumping p to its
    // end — O(tokens + spans) per doc, vs the per-token exists() scan of
    // the span array (O(tokens x spans): 10^5 tokens x 10^4 spans was 10^9
    // lambda evals in ONE row).
    val emptyParts = array().cast("array<string>")
    val cleanText = aggregate(
      col("sp"),
      struct(lit(0).as("p"), emptyParts.as("parts")),
      (acc, sp) => struct(
        sp.getField("e").cast("int").as("p"),
        concat(acc.getField("parts"),
          slice(col("w"), acc.getField("p") + 1,
            sp.getField("s").cast("int") - acc.getField("p") - 1)).as("parts")),
      acc => array_join(
        concat(acc.getField("parts"),
          slice(col("w"), acc.getField("p") + 1,
            size(col("w")) - acc.getField("p"))), " "))

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
        cleanText.as("clean_text"))
  }
}
