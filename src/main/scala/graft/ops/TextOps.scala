package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: BPE-style token
  * segmentation and winnowing document fingerprints. Pure column
  * expressions (regexp + higher-order array functions) — codegen'd,
  * map-only, no UDFs; each has a DuckDB-oracle driver query.
  */
object TextOps {

  /** GPT-2-flavored pre-tokenizer pattern, ASCII-restricted so the regex
    * behaves identically across engines: contraction suffixes, space-glued
    * letter runs, digit runs, punctuation runs. The real BPE merge table is
    * a model artifact; the SEGMENTATION (what bounds token counts and
    * training-cost estimates) is this split.
    */
  val BpePattern: String =
    "(?:'(?:s|t|re|ve|m|ll|d))| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** Token pieces of `text` under [[BpePattern]]. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** PII patterns for the redaction pass every public-web training corpus
    * runs before release (C4/Dolma-style anonymization). ASCII-restricted
    * and free of backreferences/lookaround so Java regex (Spark) and RE2
    * (DuckDB) match identically — the oracle replays them verbatim.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern: String = "\\+\\d[\\d-]{7,}"

  /** `text` with every email, then phone, then dotted-quad IP replaced by a
    * typed placeholder. Order matters and is fixed: emails go first (their
    * local parts may contain `+digits` a later phone pass would mangle);
    * IPs go last (nothing in the earlier placeholders contains a dotted
    * quad). Pure codegen'd column expression — map-only at any scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Pre-redaction match count for one of the patterns above. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
    * hash every k-gram of `words`, slide a window of `w` consecutive hashes,
    * keep each window's minimum — the classic local document fingerprint
    * with guaranteed match coverage for overlaps of length >= w + k - 1.
    * Hashes are md5 hex strings (any total order works for winnowing, and
    * strings compare identically in every engine). Documents with fewer
    * than `w` k-grams contribute one fingerprint (the global min).
    */
  def winnowFingerprints(words: Column, k: Int, w: Int): Column =
    winnowFromGramHashes(transform(Dedup.shingles(words, k), g => md5(g)), w)

  /** [[winnowFingerprints]] over an ALREADY-HASHED gram array. Split out so
    * pipelines can alias the gram hashes as their own projected column
    * before windowing (r7): `grams` is referenced at size/slice/array_min
    * sites inside interpreted-eval HOF lambdas, where Catalyst performs no
    * common-subexpression elimination — an inlined gram expression re-runs
    * the full shingle+digest pass once per window per row (the O(words·w·
    * words) blowup measured as q_winnow's 4-5 s battery entry; same hazard
    * class as Dedup.bandedProjection's `_w`/`_hs` aliases). A multi-
    * referenced non-cheap alias is exactly what CollapseProject keeps
    * materialized.
    */
  def winnowFromGramHashes(grams: Column, w: Int): Column = {
    val nWin = size(grams) - (w - 1)
    when(nWin >= 1,
      array_sort(array_distinct(transform(sequence(lit(1), nWin),
        i => array_min(slice(grams, i, lit(w)))))))
      .when(size(grams) > 0, array(array_min(grams)))
      .otherwise(array().cast("array<string>"))
  }
}
