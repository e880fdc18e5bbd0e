package graft.docprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's reindex path (SURVEY.md §3.3): scan -> data repairs ->
  * re-validate -> DIFF GUARD -> writeback.
  *
  * feed_ursus/reindex.py applies `fix_for_reindex` repairs then compares the
  * repaired record against the original with DeepDiff, excluding a list of
  * legacy paths; any UNEXPLAINED change aborts that record
  * (UnexplainedChangesError, reindex.py:141-240). Re-expressed relationally:
  * a column-wise normalized comparison where rows with changes outside the
  * `explained` column set go to a quarantine output instead of the new
  * snapshot — collect-don't-throw, same as the ingest error channel.
  */
object Reindex {

  /** normalize_value (reindex.py:243-301): strip the time portion from
    * ISO datetimes, trim whitespace, empty -> null — applied to BOTH sides
    * before comparison so cosmetic drift never counts as a change.
    */
  def normalizeValue(c: Column): Column =
    nullif(trim(regexp_replace(c.cast("string"), "T\\d\\d:\\d\\d:\\d\\d(\\.\\d+)?Z?", "")), lit(""))

  /** normalize_record's access-copy escape (reindex.py:247-248): literal
    * `{}` placeholders in access_copy_ssi URLs are percent-encoded to
    * `%7B%7D` before comparison/writeback.
    */
  def escapeAccessCopy(c: Column): Column =
    regexp_replace(c, "\\{\\}", "%7B%7D")

  /** normalize_record (reindex.py:243-258): escape access_copy_ssi when the
    * column exists; falsy-value removal is the per-column nullif in
    * [[normalizeValue]].
    */
  def normalizeRecord(df: DataFrame): DataFrame =
    if (df.columns.contains("access_copy_ssi"))
      df.withColumn("access_copy_ssi", escapeAccessCopy(col("access_copy_ssi")))
    else df

  /** Split the transformed table into (accepted, quarantined).
    *
    * @param before     original table
    * @param after      transformed table (same natural key)
    * @param keyCols    natural key columns
    * @param explained  columns where changes are expected (the repair's
    *                   surface — the DeepDiff exclude list analog)
    * @return (rows of `after` whose only differences vs `before` are in
    *         `explained`, quarantined rows with a `_changed_cols` reason)
    */
  def guardedDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
                  explained: Set[String]): (DataFrame, DataFrame) = {
    val shared = before.columns.toSet.intersect(after.columns.toSet)
      .diff(keyCols.toSet).toSeq.sorted
    val unexplainedCols = shared.filterNot(explained.contains)

    val b = before.select((keyCols ++ shared).map(col): _*)
      .select(keyCols.map(col) ++ shared.map(c => normalizeValue(col(c)).as(s"_b_$c")): _*)
    val joined = after.join(b, keyCols, "left")

    val changeFlags = unexplainedCols.map { c =>
      val same = normalizeValue(col(c)) <=> col(s"_b_$c")
      when(!same, lit(c)).otherwise(lit(null.asInstanceOf[String]))
    }
    val withChanges = joined.withColumn("_changed_cols",
      array_compact(array(changeFlags: _*)))

    val accepted = withChanges.filter(size(col("_changed_cols")) === 0)
      .drop((shared.map(c => s"_b_$c") :+ "_changed_cols"): _*)
    val quarantined = withChanges.filter(size(col("_changed_cols")) > 0)
      .drop(shared.map(c => s"_b_$c"): _*)
    (accepted, quarantined)
  }

  /** fix_for_reindex analog (reindex.py:50-105): a repair that relocates and
    * cleans known-bad fields. Here: dedupe a multivalued identifier column
    * and strip MARC markers from a title column — the repair shape, applied
    * as column expressions.
    */
  def repair(df: DataFrame): DataFrame = {
    var out = df
    if (df.columns.contains("local_identifiers"))
      out = out.withColumn("local_identifiers", array_distinct(col("local_identifiers")))
    if (df.columns.contains("title"))
      out = out.withColumn("title", UrsusFunctions.parseMarc(col("title")))
    out
  }
}
