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
  *  3. dup marking in ONE corpus-sized exchange, skew-proof by SAMPLED
  *     HEAVY-HITTER ROUTING. "g occurs in 2+ docs" is min(doc) != max(doc)
  *     over a window partitioned by g — one shuffle+sort, but a boilerplate
  *     gram present in 10^8 docs would make one task sort that whole group
  *     (the round-5 straggler; the round-6 groupBy+semi-join attempt fixed
  *     the skew but REGRESSED 4x: a hash aggregate over mostly-unique gram
  *     keys spills its whole input on both sides, and the semi-join
  *     re-exchanged + re-sorted the corpus stream — 475 s / 79 GB spill vs
  *     the window's 117 s / 15 GB at 1M docs). So: a cheap 1% DOC sample
  *     counts gram occurrences and nominates heavy hitters (bounded by
  *     construction: <= sampleRows/minSampled, capped); hot grams get their
  *     dup verdict from a tiny exact aggregate (partial agg collapses
  *     perfectly on few distinct keys) and their window partition is SALTED
  *     256 ways so no task owns the group, while the cold stream — per-key
  *     cardinality bounded at ~the sampling threshold whp — takes the plain
  *     window. EXACTNESS NEVER DEPENDS ON THE SAMPLE: a missed heavy hitter
  *     only costs one large-ish sort group (skew, not wrongness), a false
  *     positive only routes through the exact aggregate. DedupScaleBench's
  *     `hotspans` leg (a boilerplate span planted in 25% of 1M docs) gates
  *     max/median task duration on the heavy stages;
  *  4. per-doc sort + run-merge of marked positions into maximal spans —
  *     collect_list bounded by the doc's own length; span reconstruction
  *     and the clean-text cut are both LINEAR two-pointer passes over the
  *     sorted disjoint spans (the round-5 per-token `exists` over the span
  *     array was O(tokens x spans) per doc — quadratic on a pathological
  *     row).
  *
  * Self-repetition WITHIN a doc is deliberately out of scope here (that is
  * the Gopher repetition signal, `q_quality_repetition`); a gram must occur
  * in two distinct documents to mark its positions. (A within-doc-repeated
  * gram CAN be nominated hot by the sample — the exact aggregate then
  * correctly rules it non-duplicated unless a second doc holds it.)
  */
object SubstringDedup {

  /** Doc-sample fraction for heavy-hitter nomination. */
  private val HotSampleFraction = 0.01

  /** Min sampled occurrences to nominate a gram as hot: at 1% doc sampling
    * this catches grams in >= ~3000 docs whp — far below straggler size,
    * far above a window group that matters.
    */
  private val HotMinSampled = 32L

  /** Driver-set cap on nominated hot grams (top by sampled count). The
    * Zipf head IS the straggler class; anything past the cap is at most
    * ~the cap-th frequency and sorts as an ordinary window group.
    */
  private val HotCap = 1 << 16

  /** Salt fan-out for hot grams' window partitions. */
  private val HotSalt = 256

  /** Per-document maximal cross-document duplicated spans of `span`+ tokens.
    *
    * Returns one row per document that HAS at least one duplicated span:
    * (doc_id, n_tokens, n_spans, dup_tokens, spans "s-e|s-e" 1-based
    * inclusive token positions, clean_text = the document with every
    * duplicated span removed — the Lee et al. cut operation).
    *
    * Eager at the marked-positions step: when hot grams exist the gram
    * stream is cached for its two consumers (hot-dup aggregate, salted
    * window) and released once the per-doc marked positions — doc-count-
    * sized — are materialized via localCheckpoint, so the returned frame
    * holds no reference to the corpus-sized gram cache. With no hot grams
    * the whole marking is one unpersisted pipeline (sample pass aside).
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      span: Int): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("w"))

    graft.functions.GraftFunctions.register(spark)
    // fused shingle->hash64 (ONE native pass, no gram strings): element i of
    // graft_shingle_hash64s == graft_hash64(concat_ws(" ", w[i..i+span-1])),
    // OpsSpec-gated bit-identical to the two-step form this replaces
    def gramStream(t: DataFrame): DataFrame = t
      .filter(size(col("w")) >= span)
      .select(col("doc_id"),
        posexplode(call_function("graft_shingle_hash64s", col("w"), lit(span))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("g"))

    // 1. heavy-hitter nomination from a 1% doc sample: tokenize/hash cost is
    //    1% of the corpus; collect is bounded (<= sample/HotMinSampled rows,
    //    capped at HotCap). Routing-only — exactness never depends on it.
    val hotCand: Array[Long] = gramStream(toks.sample(HotSampleFraction, 42L))
      .groupBy("g").count()
      .filter(col("count") >= HotMinSampled)
      .orderBy(desc("count")).limit(HotCap)
      .select("g").collect().map(_.getLong(0))

    val grams = gramStream(toks)
    val marked =
      if (hotCand.isEmpty) {
        // no heavy hitters: the single-exchange window pipeline, unpersisted
        val w = Window.partitionBy("g")
        grams
          .withColumn("mn", min("doc_id").over(w))
          .withColumn("mx", max("doc_id").over(w))
          .filter(col("mn") =!= col("mx"))
          .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("ps"))
          .localCheckpoint()
      } else {
        val cached = grams
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // 2. exact dup verdict for the hot grams only: few distinct keys, so
        //    map-side min/max partials collapse to <= |hot| rows/partition —
        //    the one shape where a groupBy aggregate is skew-AND-spill-proof
        val hotDup: Array[Long] = cached
          .filter(col("g").isInCollection(hotCand))
          .groupBy("g").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select("g").collect().map(_.getLong(0))
        // 3. ONE exchange of the full stream: hot grams' window partitions
        //    salted HotSalt ways (their min/max is ignored — the verdict
        //    comes from hotDup), cold grams keep salt 0 (exact window min/max)
        val isHot = col("g").isInCollection(hotCand)
        val w = Window.partitionBy(col("g"), col("ws"))
        val m = cached
          .withColumn("ws", when(isHot,
            pmod(hash(col("doc_id"), col("pos")), lit(HotSalt))).otherwise(lit(0)))
          .withColumn("mn", min("doc_id").over(w))
          .withColumn("mx", max("doc_id").over(w))
          .filter(when(isHot,
            if (hotDup.isEmpty) lit(false) else col("g").isInCollection(hotDup))
            .otherwise(col("mn") =!= col("mx")))
          .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("ps"))
          .localCheckpoint()
        cached.unpersist()
        m
      }

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
