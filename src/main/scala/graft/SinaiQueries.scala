package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.docprep.SinaiSolr
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query for the Sinai Solr-record generator: shape the
  * `part` table into deterministic MERGED manuscript JSON (mod-class
  * structure, like UrsusRecordQueries does for the CSV surface), run the
  * full [[SinaiSolr.project]] (56 fields), and select the SQL-expressible
  * slice for the DuckDB oracle to recompute independently. The field
  * SEMANTICS are separately gated byte-exact against the reference's own
  * golden outputs in SinaiGoldenSpec; this query proves the Spark pipeline
  * shape (typed map over a Dataset, no shuffle) and pins the arithmetic on
  * 400 rows — including the reference's verbatim uto_date_tesim-reads-
  * ot-layers behavior (solr_record.py:624-633).
  */
object SinaiQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** One deterministic ManuscriptObjectMerged-shaped JSON per part row. */
  private[graft] def msJson(pk: Long, name: String): String = {
    val m = new ObjectMapper()
    val o = m.createObjectNode()
    def ct(node: ObjectNode, id: String, label: String): ObjectNode = {
      node.put("id", id); node.put("label", label); node
    }
    val ark = s"ark:/21198/z$pk"
    o.put("ark", ark)
    o.put("reconstruction", false)
    o.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(m.createObjectNode(),
      if (pk % 3 == 0) "manuscript" else if (pk % 3 == 1) "uto" else "reconstruction",
      if (pk % 3 == 0) "Manuscript" else if (pk % 3 == 1) "Undertext Object" else "Reconstruction"))
    o.put("shelfmark", s"Sinai MS $pk")
    if (pk % 5 != 0) o.put("extent", s"${pk % 30 + 1} ff.")
    o.set[com.fasterxml.jackson.databind.JsonNode]("state", ct(m.createObjectNode(),
      if (pk % 2 == 0) "codex" else "fragment",
      if (pk % 2 == 0) "Codex" else "Fragment"))
    val feats = o.putArray("features")
    if (pk % 2 == 0) feats.add(ct(m.createObjectNode(), "palimpsest", "Palimpsest"))
    if (pk % 3 == 0) feats.add(ct(m.createObjectNode(), "msi", "Multispectral Imaging"))

    val year = 1000 + pk % 900
    val part = m.createObjectNode()
    part.put("label", "Part 1")
    val sup = part.putArray("support")
    sup.add(ct(m.createObjectNode(), "parchment", "Parchment"))
    if (pk % 4 == 0) sup.add(ct(m.createObjectNode(), "paper", "Paper"))
    val ot = m.createObjectNode()
    ot.put("id", s"$ark/l1"); ot.put("label", "Overtext Layer")
    ot.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(m.createObjectNode(), "overtext", "Overtext"))
    val lr = m.createObjectNode()
    lr.put("ark", s"$ark/lr1"); lr.put("reconstruction", false)
    lr.set[com.fasterxml.jackson.databind.JsonNode]("state", ct(m.createObjectNode(), "original", "Original"))
    lr.put("label", name)
    val wr = m.createObjectNode()
    val scr = wr.putArray("script")
    val si = m.createObjectNode()
    si.put("id", s"s${pk % 4}"); si.put("label", s"Script ${pk % 4}")
    si.put("writing_system", s"WS ${pk % 3}")
    scr.add(si)
    lr.putArray("writing").add(wr)
    val ltu = m.createObjectNode()
    ltu.put("id", s"$ark/t1"); ltu.put("label", "TU link")
    val tur = m.createObjectNode()
    tur.put("ark", s"$ark/tu1"); tur.put("reconstruction", false)
    tur.put("label", s"Text unit $pk")
    tur.putArray("lang").add(ct(m.createObjectNode(), s"l${pk % 5}", s"Language ${pk % 5}"))
    val ww = m.createObjectNode()
    val work = m.createObjectNode()
    work.put("ark", s"$ark/w1"); work.put("pref_title", s"Work ${pk % 23}")
    ww.set[com.fasterxml.jackson.databind.JsonNode]("work", work)
    val ci = m.createObjectNode()
    ci.put("label", s"Contents ${pk % 7}"); ci.put("pref_title", s"Contents work ${pk % 9}")
    ww.putArray("contents").add(ci)
    tur.putArray("work_wit").add(ww)
    tur.putArray("parent").add(ark)
    ltu.set[com.fasterxml.jackson.databind.JsonNode]("text_unit_record", tur)
    lr.putArray("text_unit").add(ltu)
    val ad = m.createObjectNode()
    ad.put("value", s"c. $year CE")
    val iso = m.createObjectNode()
    iso.put("not_before", year.toString)
    iso.put("not_after", (year + pk % 3).toString)
    ad.set[com.fasterxml.jackson.databind.JsonNode]("iso", iso)
    ad.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(m.createObjectNode(), "origin", "Origin Date"))
    lr.putArray("assoc_date").add(ad)
    lr.putArray("parent").add(ark)
    ot.set[com.fasterxml.jackson.databind.JsonNode]("layer_record", lr)
    part.putArray("ot_layer").add(ot)
    if (pk % 4 == 0) {
      val uto = m.createObjectNode()
      uto.put("uto_layer_ark", s"$ark/u1"); uto.put("label", "Undertext")
      uto.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(m.createObjectNode(), "undertext", "Undertext"))
      uto.putArray("script").add(s"UScript ${pk % 3}")
      uto.putArray("lang").add(s"ULang ${pk % 2}")
      val uod = m.createObjectNode()
      uod.put("value", s"c. ${600 + pk % 300} CE")
      val uiso = m.createObjectNode()
      uiso.put("not_before", (600 + pk % 300).toString)
      uod.set[com.fasterxml.jackson.databind.JsonNode]("iso", uiso)
      uod.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(m.createObjectNode(), "origin", "Origin Date"))
      uto.putArray("orig_date").add(uod)
      part.putArray("uto").add(uto)
    }
    o.putArray("part").add(part)

    val loc = m.createObjectNode()
    loc.put("id", "loc")
    if (pk % 2 == 0) loc.put("collection", "Old Collection")
    loc.put("repository", s"Repository ${pk % 7}")
    o.putArray("location").add(loc)

    val an = m.createObjectNode()
    an.put("id", s"$ark/a1")
    val ag = m.createObjectNode()
    ag.put("ark", s"$ark/a1")
    ag.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(m.createObjectNode(), "person", "Person"))
    ag.put("pref_name", s"Agent ${pk % 13}")
    an.set[com.fasterxml.jackson.databind.JsonNode]("agent_record", ag)
    an.set[com.fasterxml.jackson.databind.JsonNode]("role", ct(m.createObjectNode(), "scribe", "Scribe"))
    o.putArray("assoc_name").add(an)

    val cats = o.putArray("cataloguer")
    def cat(day: Long, contributor: String): ObjectNode = {
      val c = m.createObjectNode()
      c.put("message", "edit"); c.put("added_by", "bot")
      c.putArray("contributor").add(contributor)
      c.put("timestamp", f"2025-06-${day}%02dT15:50:45Z")
      c
    }
    cats.add(cat(1 + pk % 28, s"Cat ${pk % 11}"))
    cats.add(cat(1 + pk % 15, s"Cat ${pk % 5}"))
    m.writeValueAsString(o)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sinai_record" -> ((s, dir) => {
      import s.implicits._
      val src = t(s, dir, "part").filter(col("p_partkey") <= 400)
        .select(col("p_partkey"), col("p_name"))
        .as[(Long, String)]
      val merged = src.map { case (pk, name) => (s"ark:/21198/z$pk", msJson(pk, name)) }
      SinaiSolr.records(merged).toDF().select(
        col("ark_ssi"),
        col("ms_type_ssi"),
        col("state_ssi"),
        col("shelfmark_ssi"),
        array_join(col("features_ssim"), "|").as("features"),
        array_join(col("support_ssim"), "|").as("supports"),
        array_join(col("repository_ssim"), "|").as("repos"),
        array_join(col("collection_ssim"), "|").as("colls"),
        array_join(col("names_ssim"), "|").as("names"),
        array_join(col("ot_script_ssim"), "|").as("ot_scripts"),
        array_join(col("ot_writing_system_ssim"), "|").as("ot_ws"),
        array_join(col("ot_language_ssim"), "|").as("ot_langs"),
        array_join(col("ot_works_ssim"), "|").as("ot_works"),
        array_join(col("ot_year_isim").cast("array<string>"), "|").as("ot_years"),
        array_join(col("ot_date_tesim"), "|").as("ot_dates"),
        array_join(col("uto_script_ssim"), "|").as("uto_scripts"),
        array_join(col("uto_language_ssim"), "|").as("uto_langs"),
        array_join(col("uto_year_isim").cast("array<string>"), "|").as("uto_years"),
        // pins the reference's verbatim ot_layers() read in uto_date_tesim
        array_join(col("uto_date_tesim"), "|").as("uto_dates"),
        array_join(col("cataloguer_tesim"), "|").as("cataloguers"),
        col("last_modified_dtsi").as("last_modified"),
        array_join(col("header_index_tesim"), "|").as("header_index"),
        col("visibility_ssi"),
        col("id"))
        .orderBy(col("ark_ssi"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q_sinai_record" ->
      """WITH src AS (
        |  SELECT p_partkey AS pk, 'ark:/21198/z' || p_partkey::varchar AS ark
        |  FROM part WHERE p_partkey <= 400),
        |f AS (SELECT *, 1000 + pk % 900 AS y FROM src)
        |SELECT
        |  ark AS ark_ssi,
        |  CASE pk % 3 WHEN 0 THEN 'Manuscript' WHEN 1 THEN 'Undertext Object'
        |    ELSE 'Reconstruction' END AS ms_type_ssi,
        |  CASE pk % 2 WHEN 0 THEN 'Codex' ELSE 'Fragment' END AS state_ssi,
        |  'Sinai MS ' || pk::varchar AS shelfmark_ssi,
        |  CASE WHEN pk % 2 = 0 AND pk % 3 = 0 THEN 'Multispectral Imaging|Palimpsest'
        |       WHEN pk % 2 = 0 THEN 'Palimpsest'
        |       WHEN pk % 3 = 0 THEN 'Multispectral Imaging'
        |       ELSE '' END AS features,
        |  CASE WHEN pk % 4 = 0 THEN 'Paper|Parchment' ELSE 'Parchment' END AS supports,
        |  'Repository ' || (pk % 7)::varchar AS repos,
        |  CASE WHEN pk % 2 = 0 THEN 'Old Collection' ELSE '' END AS colls,
        |  'Agent ' || (pk % 13)::varchar AS names,
        |  'Script ' || (pk % 4)::varchar AS ot_scripts,
        |  'WS ' || (pk % 3)::varchar AS ot_ws,
        |  'Language ' || (pk % 5)::varchar AS ot_langs,
        |  'Contents work ' || (pk % 9)::varchar || '|Work ' || (pk % 23)::varchar AS ot_works,
        |  array_to_string(list_transform(generate_series(y, y + pk % 3), x -> x::varchar), '|') AS ot_years,
        |  'c. ' || y::varchar || ' CE' AS ot_dates,
        |  CASE WHEN pk % 4 = 0 THEN 'UScript ' || (pk % 3)::varchar ELSE '' END AS uto_scripts,
        |  CASE WHEN pk % 4 = 0 THEN 'ULang ' || (pk % 2)::varchar ELSE '' END AS uto_langs,
        |  CASE WHEN pk % 4 = 0 THEN (600 + pk % 300)::varchar ELSE '' END AS uto_years,
        |  'c. ' || y::varchar || ' CE' AS uto_dates,
        |  array_to_string(list_sort(list_distinct(
        |    ['Cat ' || (pk % 11)::varchar, 'Cat ' || (pk % 5)::varchar])), '|') AS cataloguers,
        |  '2025-06-' || lpad(greatest(1 + pk % 28, 1 + pk % 15)::varchar, 2, '0')
        |    || 'T15:50:45Z' AS last_modified,
        |  'Sinai MS ' || pk::varchar ||
        |    CASE WHEN pk % 5 <> 0 THEN '|' || (pk % 30 + 1)::varchar || ' ff.' ELSE '' END
        |    AS header_index,
        |  'open' AS visibility_ssi,
        |  ark AS id
        |FROM f ORDER BY ark_ssi""".stripMargin)
}
