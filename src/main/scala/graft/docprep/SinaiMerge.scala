package graft.docprep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Sinai pipeline's entity-graph denormalization re-expressed Spark-first
  * (SURVEY.md §2.1 S5, §2.3 J3/J4, §3.1 4th path).
  *
  * The reference (feed_sinai/sinai_json_importer.py:52-136, 265-310) keeps a
  * directory per entity type with one JSON file per ARK and stitches
  * manuscripts recursively in Python with memoized dict lookups. Here each
  * entity dir is ONE `spark.read.json` scan with the ARK recovered from the
  * filename (`input_file_name`, inverting sinai_json_importer.py:42-50), and
  * the recursive stitching becomes a chain of BROADCAST left joins (entity
  * dims are small relative to manuscripts) with `collect_list(struct(...))`
  * rebuilding the nested arrays — one shuffle per nesting level, dims
  * broadcast, manuscripts never re-shuffled by anything but their own ark.
  */
object SinaiMerge {

  /** S5: read an entity directory; ark column from the filename. */
  def readEntityDir(spark: SparkSession, root: String, entity: String): DataFrame =
    spark.read.json(s"$root/$entity")
      .withColumn("ark",
        concat(lit("ark:/21198/"),
          regexp_replace(regexp_extract(input_file_name(), "([^/]+)\\.json$", 1), "-", "/")))

  /** J3 + J4: denormalize manuscripts:
    *   ms_objs --explode layer_arks--> layers --explode text_unit_arks-->
    *   text_units --explode work_arks--> works --explode agent_arks--> agents
    * plus the reconstructed_from SELF-join resolving sibling shelfmarks
    * (sinai_json_importer.py:130-136, 302-308).
    *
    * Returns one row per manuscript with nested `layers` array (each layer
    * holding its text units, each with resolved works and agent names) and
    * `reconstructed_from_shelfmarks`.
    */
  def mergeManuscripts(spark: SparkSession, root: String): DataFrame = {
    val ms = readEntityDir(spark, root, "ms_objs")
    val layers = readEntityDir(spark, root, "layers")
    val textUnits = readEntityDir(spark, root, "text_units")
    val works = readEntityDir(spark, root, "works")
    val agents = readEntityDir(spark, root, "agents")

    // innermost first: works with resolved agent names
    val worksResolved = works
      .select(col("ark").as("work_ark"), col("title"),
        explode_outer(col("agent_arks")).as("agent_ark"))
      .join(broadcast(agents.select(col("ark").as("agent_ark"), col("name"))),
        Seq("agent_ark"), "left")
      .groupBy(col("work_ark"), col("title"))
      .agg(sort_array(collect_list(col("name"))).as("agent_names"))

    // text units with nested works
    val tuResolved = textUnits
      .select(col("ark").as("tu_ark"), col("label").as("tu_label"),
        explode_outer(col("work_arks")).as("work_ark"))
      .join(broadcast(worksResolved), Seq("work_ark"), "left")
      .groupBy(col("tu_ark"), col("tu_label"))
      .agg(sort_array(collect_list(struct(
        col("work_ark"), col("title"), col("agent_names")))).as("works"))

    // layers with nested text units; keep type.id for the ot/guest/uto split
    // (P7, sinai_json_importer.py:245-263)
    val layersResolved = layers
      .select(col("ark").as("layer_ark"), col("label").as("layer_label"),
        col("type").as("layer_type"),
        explode_outer(col("text_unit_arks")).as("tu_ark"))
      .join(broadcast(tuResolved), Seq("tu_ark"), "left")
      .groupBy(col("layer_ark"), col("layer_label"), col("layer_type"))
      .agg(sort_array(collect_list(struct(
        col("tu_ark"), col("tu_label"), col("works")))).as("text_units"))

    // J4 self-join: sibling manuscripts' shelfmarks
    val shelfmarks = ms.select(col("ark").as("sibling_ark"),
      col("shelfmark").as("sibling_shelfmark"))
    val recon = ms
      .select(col("ark"), explode_outer(col("reconstructed_from")).as("sibling_ark"))
      .join(broadcast(shelfmarks), Seq("sibling_ark"), "left")
      .groupBy(col("ark"))
      .agg(sort_array(collect_list(col("sibling_shelfmark")))
        .as("reconstructed_from_shelfmarks"))

    // top level: manuscripts with nested layers, split by type.id (P7)
    val msLayers = ms
      .select(col("ark"), explode_outer(col("layer_arks")).as("layer_ark"))
      .join(broadcast(layersResolved), Seq("layer_ark"), "left")
      .groupBy(col("ark"))
      .agg(
        sort_array(collect_list(when(col("layer_type") === "overtext",
          struct(col("layer_ark"), col("layer_label"), col("text_units")))))
          .as("ot_layers"),
        sort_array(collect_list(when(col("layer_type") === "guest",
          struct(col("layer_ark"), col("layer_label"), col("text_units")))))
          .as("guest_layers"),
        sort_array(collect_list(when(col("layer_type") === "undertext",
          struct(col("layer_ark"), col("layer_label"), col("text_units")))))
          .as("uto_layers"))

    ms.select(col("ark"), col("shelfmark"), col("type"), col("extent"))
      .join(msLayers, Seq("ark"), "left")
      .join(recon, Seq("ark"), "left")
      .orderBy(col("ark"))
  }
}
