package graft.docprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Sinai pipeline's Solr-record projection over the merged manuscript
  * graph (feed_sinai/solr_record.py:35-345, 520-600): sorted-set facet
  * fields deep-collected from the nested layers -> text_units -> works ->
  * agents structure, the fixed Blacklight fields, and the full nested record
  * serialized back to JSON (`manuscript_json_ts`, solr_record.py:543-545 —
  * the F19 write side).
  *
  * Pure column expressions over [[SinaiMerge.mergeManuscripts]] output:
  * the deep collections are nested `transform`/`filter`/`flatten` chains
  * (null-guarded at every level — a layer with no text units contributes
  * nothing), `sorted(set(...))` is `array_sort(array_distinct(...))`
  * (solr_record.py:35-42 generator_field). Map-only; scales with the
  * manuscript count.
  */
object SinaiRecord {

  private val emptyStr: Column = array().cast("array<string>")

  private val notNull: Column => Column = c => c.isNotNull

  /** sorted(set(xs)) with nulls dropped — generator_field semantics. */
  private def sortedSet(c: Column): Column =
    array_sort(array_distinct(filter(coalesce(c, emptyStr), x => x.isNotNull)))

  /** All work titles nested under a layers array. */
  private def titlesOf(layers: Column): Column = {
    val perTu = (tu: Column) =>
      transform(tu.getField("works"), w => w.getField("title"))
    val perLayer = (l: Column) =>
      flatten(filter(transform(l.getField("text_units"), perTu), notNull))
    flatten(filter(transform(coalesce(layers, array()), perLayer), notNull))
  }

  /** All agent names nested under a layers array (one level deeper). */
  private def namesOf(layers: Column): Column = {
    val perTu = (tu: Column) =>
      flatten(filter(transform(tu.getField("works"),
        w => w.getField("agent_names")), notNull))
    val perLayer = (l: Column) =>
      flatten(filter(transform(l.getField("text_units"), perTu), notNull))
    flatten(filter(transform(coalesce(layers, array()), perLayer), notNull))
  }

  def project(merged: DataFrame): DataFrame = {
    val allLayers = concat(
      coalesce(col("ot_layers"), array()),
      coalesce(col("guest_layers"), array()),
      coalesce(col("uto_layers"), array()))
    merged.select(
      col("ark").as("ark_ssi"),
      col("ark").as("id"),
      col("type").as("ms_type_ssi"),
      col("shelfmark").as("shelfmark_ssi"),
      // Blacklight constants (solr_record.py:556-575)
      array(lit("Work")).as("has_model_ssim"),
      lit("open").as("visibility_ssi"),
      array(lit("public")).as("discover_access_group_ssim"),
      array(lit("public")).as("read_access_group_ssim"),
      array(lit("public")).as("download_access_person_ssim"),
      // header_index_tesim: shelfmark then extent when present (:594-600)
      when(col("extent").isNotNull, array(col("shelfmark"), col("extent")))
        .otherwise(array(col("shelfmark"))).as("header_index_tesim"),
      coalesce(col("reconstructed_from_shelfmarks"), emptyStr)
        .as("reconstructed_from_shelfmark_ssim"),
      // per-layer-type and global sorted-set facets (:210-300)
      sortedSet(titlesOf(col("ot_layers"))).as("ot_works_ssim"),
      sortedSet(titlesOf(col("guest_layers"))).as("guest_works_ssim"),
      sortedSet(titlesOf(col("uto_layers"))).as("uto_works_ssim"),
      sortedSet(titlesOf(allLayers)).as("works_ssim"),
      sortedSet(namesOf(allLayers)).as("names_ssim"),
      // the merged nested record round-tripped to JSON (:543-545)
      to_json(struct(merged.columns.map(col): _*)).as("manuscript_json_ts"))
  }
}
