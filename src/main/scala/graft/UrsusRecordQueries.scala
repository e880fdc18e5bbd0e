package graft

import graft.docprep.{ControlledVocab, UrsusRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the record-mapping surface (P2/F6/F18): shape
  * the `part` table into the reference's CSV headers deterministically, run
  * the full [[UrsusRecord.project]] (~170 columns), and select a
  * representative slice that a DuckDB oracle recomputes independently. The
  * mod-class inputs are fixed, so the oracle can assert exact expected values
  * per class — every branch of the visibility table, rights `pd` alias,
  * language-name lookup, resource-type URI serialization, year expansion,
  * date validity, archival-collection formatting, and has_model mapping is
  * exercised on 2000 rows.
  */
object UrsusRecordQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def csvShaped(s: SparkSession, dir: String): DataFrame = {
    val pk = col("p_partkey")
    def pick(m: Long, vals: String*) =
      element_at(array(vals.map(lit): _*), (pk % m + 1).cast("int"))
    t(s, dir, "part").select(
      concat(lit("21198/z1"), pk.cast("string")).as("Item ARK"),
      col("p_name").as("Title"),
      pick(5, "copyrighted", "unknown", "public domain", "pd", "").as("Rights.copyrightStatus"),
      pick(4, "eng", "eng|~|fre", "spa", "").as("Language"),
      pick(3, "text", "still image", "").as("Type.typeOfResource"),
      pick(5, "open", "public", "ucla", "private", "").as("Visibility"),
      pick(4, "Manuscript", "Page", "Collection", "").as("Object Type"),
      pick(4, "1941-10/1942", "935", "1950/1940", "").as("Date.normalized"),
      when(pk % 2 === 0, concat(lit("Coll "), (pk % 7).cast("string"))).otherwise(lit(""))
        .as("Archival Collection Title"),
      when(pk % 3 === 0, lit("123")).otherwise(lit("")).as("Archival Collection Number"),
      lit("box 4").as("Box"),
      lit("Folder 5").as("Folder"),
      col("p_name").as("Author"),
      substring_index(col("p_name"), " ", 1).as("Name.creator"),
      when(pk % 2 === 1, lit("1.0|~|2.0")).otherwise(lit("")).as("Description.latitude"),
      when(pk % 2 === 1, lit("3.0|~|4.0")).otherwise(lit("")).as("Description.longitude"),
      concat(lit("https://img.example/iiif/2/i"), pk.cast("string")).as("Thumbnail URL"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ursus_record" -> ((s, dir) => {
      val rec = UrsusRecord.project(csvShaped(s, dir))
      rec.select(
        col("ark_ssi"),
        col("id"),
        col("visibility_ssi"),
        array_join(col("rights_statement_tesim"), "|").as("rights"),
        array_join(col("human_readable_language_tesim"), "|").as("lang_names"),
        array_join(col("resource_type_sim"), "|").as("rtype_uris"),
        array_join(col("year_isim").cast("array<string>"), "|").as("years"),
        element_at(col("date_dtsim"), 1).as("date_first"),
        col("archival_collection_tesi").as("archival"),
        array_join(col("combined_names_ssim"), "|").as("names"),
        array_join(col("geographic_coordinates_ssim"), "|").as("coords"),
        element_at(col("has_model_ssim"), 1).as("model"),
        array_join(col("discover_access_group_ssim"), "|").as("access"),
        col("thumbnail_url_ss").as("thumb"),
        col("sort_title_tsort").as("sort_title"))
        .orderBy(col("ark_ssi"))
    }),

    // F18: the full 606-entry language_names table as a plan-literal map —
    // constant-folded lookup, no broadcast, no shuffle
    "q_language_names" -> ((s, dir) => {
      val codes = Seq("eng", "fre", "ger", "spa", "chi", "jpn", "rus", "ara", "heb", "zxx")
      val code = element_at(array(codes.map(lit): _*), (col("p_partkey") % 10 + 1).cast("int"))
      t(s, dir, "part")
        .select(col("p_partkey"), code.as("code"))
        .withColumn("language_name",
          coalesce(element_at(typedlit(ControlledVocab.languageNames), col("code")), col("code")))
        .orderBy(col("p_partkey"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q_ursus_record" ->
      """WITH src AS (
        |  SELECT p_partkey AS pk, p_name,
        |    'ark:/21198/z1' || p_partkey::varchar AS ark
        |  FROM part)
        |SELECT
        |  ark AS ark_ssi,
        |  reverse(replace(replace(ark, 'ark:/', ''), '/', '-')) AS id,
        |  CASE pk % 5 WHEN 0 THEN 'open' WHEN 1 THEN 'open' WHEN 2 THEN 'ucla'
        |    WHEN 3 THEN 'authenticated' ELSE 'open' END AS visibility_ssi,
        |  CASE pk % 5
        |    WHEN 0 THEN 'http://vocabs.library.ucla.edu/rights/copyrighted'
        |    WHEN 1 THEN 'http://vocabs.library.ucla.edu/rights/unknown'
        |    WHEN 2 THEN 'http://vocabs.library.ucla.edu/rights/publicDomain'
        |    WHEN 3 THEN 'http://vocabs.library.ucla.edu/rights/publicDomain'
        |    ELSE NULL END AS rights,
        |  CASE pk % 4 WHEN 0 THEN 'English' WHEN 1 THEN 'English|French'
        |    WHEN 2 THEN 'Spanish' ELSE NULL END AS lang_names,
        |  CASE pk % 3
        |    WHEN 0 THEN 'http://id.loc.gov/vocabulary/resourceTypes/txt'
        |    WHEN 1 THEN 'http://id.loc.gov/vocabulary/resourceTypes/img'
        |    ELSE NULL END AS rtype_uris,
        |  CASE pk % 4 WHEN 0 THEN '1941|1942' WHEN 1 THEN '935'
        |    ELSE NULL END AS years,
        |  CASE pk % 4 WHEN 0 THEN '1941-10-01T00:00:00Z'
        |    WHEN 1 THEN '935-01-01T00:00:00Z' ELSE NULL END AS date_first,
        |  CASE
        |    WHEN pk % 2 = 0 AND pk % 3 = 0
        |      THEN 'Coll ' || (pk % 7)::varchar || ' (123), Box 4, Folder 5'
        |    WHEN pk % 2 = 0
        |      THEN 'Coll ' || (pk % 7)::varchar || ', Box 4, Folder 5'
        |    WHEN pk % 3 = 0 THEN 'Archival Collection 123, Box 4, Folder 5'
        |    ELSE NULL END AS archival,
        |  p_name || '|' || split_part(p_name, ' ', 1) AS names,
        |  CASE WHEN pk % 2 = 1 THEN '1.0, 3.0|2.0, 4.0' ELSE NULL END AS coords,
        |  CASE pk % 4 WHEN 0 THEN 'Work' WHEN 1 THEN 'ChildWork'
        |    WHEN 2 THEN 'Collection' ELSE 'Work' END AS model,
        |  CASE WHEN pk % 5 = 3 THEN '' ELSE 'public' END AS access,
        |  'https://img.example/iiif/2/i' || pk::varchar ||
        |    '/full/!200,200/0/default.jpg' AS thumb,
        |  p_name AS sort_title
        |FROM src ORDER BY ark_ssi""".stripMargin,

    "q_language_names" ->
      """SELECT p_partkey,
        |  CASE p_partkey % 10 WHEN 0 THEN 'eng' WHEN 1 THEN 'fre' WHEN 2 THEN 'ger'
        |    WHEN 3 THEN 'spa' WHEN 4 THEN 'chi' WHEN 5 THEN 'jpn' WHEN 6 THEN 'rus'
        |    WHEN 7 THEN 'ara' WHEN 8 THEN 'heb' ELSE 'zxx' END AS code,
        |  CASE p_partkey % 10 WHEN 0 THEN 'English' WHEN 1 THEN 'French'
        |    WHEN 2 THEN 'German' WHEN 3 THEN 'Spanish' WHEN 4 THEN 'Chinese'
        |    WHEN 5 THEN 'Japanese' WHEN 6 THEN 'Russian' WHEN 7 THEN 'Arabic'
        |    WHEN 8 THEN 'Hebrew' ELSE 'No linguistic content' END AS language_name
        |FROM part ORDER BY p_partkey""".stripMargin)
}
