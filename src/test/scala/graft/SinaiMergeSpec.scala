package graft

import graft.docprep.SinaiMerge
import org.scalatest.funsuite.AnyFunSuite

/** Fixture tree mirroring the reference's directory-per-entity layout
  * (tests/sinai/export_test): one JSON file per ARK under
  * agents/ places/ works/ text_units/ layers/ ms_objs/.
  */
class SinaiMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeEntity(root: String, entity: String, ark: String, json: String): Unit = {
    val dir = java.nio.file.Paths.get(root, entity)
    java.nio.file.Files.createDirectories(dir)
    val fname = ark.stripPrefix("ark:/21198/").replace("/", "-") + ".json"
    java.nio.file.Files.writeString(dir.resolve(fname), json)
  }

  lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("sinai").toString
    writeEntity(r, "agents", "ark:/21198/a1", """{"name":"Ephrem the Syrian"}""")
    writeEntity(r, "agents", "ark:/21198/a2", """{"name":"John Climacus"}""")
    writeEntity(r, "works", "ark:/21198/w1",
      """{"title":"Hymns Against Heresies","agent_arks":["ark:/21198/a1"]}""")
    writeEntity(r, "works", "ark:/21198/w2",
      """{"title":"Ladder of Divine Ascent","agent_arks":["ark:/21198/a2"]}""")
    writeEntity(r, "works", "ark:/21198/w3",
      """{"title":"Anonymous Prayer","agent_arks":[]}""")
    writeEntity(r, "text_units", "ark:/21198/t1",
      """{"label":"TU 1","work_arks":["ark:/21198/w1","ark:/21198/w3"]}""")
    writeEntity(r, "text_units", "ark:/21198/t2",
      """{"label":"TU 2","work_arks":["ark:/21198/w2"]}""")
    writeEntity(r, "layers", "ark:/21198/l1",
      """{"label":"Overtext layer","type":"overtext","text_unit_arks":["ark:/21198/t1"]}""")
    writeEntity(r, "layers", "ark:/21198/l2",
      """{"label":"Undertext layer","type":"undertext","text_unit_arks":["ark:/21198/t2"]}""")
    writeEntity(r, "ms_objs", "ark:/21198/m1",
      """{"shelfmark":"Sinai Syriac 1","type":"manuscript","extent":"120 ff.",
        |"layer_arks":["ark:/21198/l1","ark:/21198/l2"],
        |"reconstructed_from":["ark:/21198/m2"]}""".stripMargin.replace("\n", ""))
    writeEntity(r, "ms_objs", "ark:/21198/m2",
      """{"shelfmark":"Sinai Syriac 2 (fragment)","type":"uto",
        |"extent":"4 ff.","layer_arks":[],"reconstructed_from":[]}""".stripMargin.replace("\n", ""))
    r
  }

  test("entity-dir source recovers arks from filenames (S5)") {
    val agents = SinaiMerge.readEntityDir(spark, root, "agents")
    val got = agents.select("ark", "name").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("ark:/21198/a1", "Ephrem the Syrian"),
      ("ark:/21198/a2", "John Climacus")))
  }

  test("multiway denormalizing merge resolves the full entity graph (J3)") {
    val merged = SinaiMerge.mergeManuscripts(spark, root).collect()
    assert(merged.length == 2)
    val m1 = merged.find(_.getString(0) == "ark:/21198/m1").get
    assert(m1.getAs[String]("shelfmark") == "Sinai Syriac 1")

    // layer split by type.id (P7)
    val ot = m1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ot_layers")
    val uto = m1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("uto_layers")
    assert(ot.length == 1 && uto.length == 1)
    assert(ot.head.getAs[String]("layer_label") == "Overtext layer")

    // nested text units -> works -> agent names resolved
    val tus = ot.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("text_units")
    assert(tus.length == 1)
    val worksArr = tus.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("works")
    val titles = worksArr.map(_.getAs[String]("title")).sorted
    assert(titles == Seq("Anonymous Prayer", "Hymns Against Heresies"))
    val agentsOfW1 = worksArr.find(_.getAs[String]("title") == "Hymns Against Heresies")
      .get.getAs[scala.collection.Seq[String]]("agent_names")
    assert(agentsOfW1 == Seq("Ephrem the Syrian"))
  }

  test("Sinai solr-record projection: sorted-set facets + json round-trip") {
    val rec = graft.docprep.SinaiRecord
      .project(SinaiMerge.mergeManuscripts(spark, root)).collect()
    val m1 = rec.find(_.getAs[String]("ark_ssi") == "ark:/21198/m1").get
    assert(m1.getAs[String]("id") == "ark:/21198/m1")
    assert(m1.getAs[String]("ms_type_ssi") == "manuscript")
    assert(m1.getAs[String]("visibility_ssi") == "open")
    assert(m1.getAs[scala.collection.Seq[String]]("has_model_ssim") == Seq("Work"))
    assert(m1.getAs[scala.collection.Seq[String]]("discover_access_group_ssim") == Seq("public"))
    assert(m1.getAs[scala.collection.Seq[String]]("header_index_tesim") ==
      Seq("Sinai Syriac 1", "120 ff."))
    // ot layer works only; uto works separate; global union sorted+dedup'd
    assert(m1.getAs[scala.collection.Seq[String]]("ot_works_ssim") ==
      Seq("Anonymous Prayer", "Hymns Against Heresies"))
    assert(m1.getAs[scala.collection.Seq[String]]("uto_works_ssim") ==
      Seq("Ladder of Divine Ascent"))
    assert(m1.getAs[scala.collection.Seq[String]]("works_ssim") ==
      Seq("Anonymous Prayer", "Hymns Against Heresies", "Ladder of Divine Ascent"))
    assert(m1.getAs[scala.collection.Seq[String]]("names_ssim") ==
      Seq("Ephrem the Syrian", "John Climacus"))
    assert(m1.getAs[scala.collection.Seq[String]]("reconstructed_from_shelfmark_ssim") ==
      Seq("Sinai Syriac 2 (fragment)"))
    // manuscript_json_ts round-trips (solr_record.py:543-545)
    val json = m1.getAs[String]("manuscript_json_ts")
    assert(json.contains("\"ark\":\"ark:/21198/m1\"") &&
      json.contains("Hymns Against Heresies"))
    // a manuscript with no layers projects empty facets, not nulls/errors
    val m2 = rec.find(_.getAs[String]("ark_ssi") == "ark:/21198/m2").get
    assert(m2.getAs[scala.collection.Seq[String]]("works_ssim").isEmpty)
    assert(m2.getAs[scala.collection.Seq[String]]("names_ssim").isEmpty)
  }

  test("reconstructed_from self-join resolves sibling shelfmarks (J4)") {
    val merged = SinaiMerge.mergeManuscripts(spark, root).collect()
    val m1 = merged.find(_.getString(0) == "ark:/21198/m1").get
    assert(m1.getAs[scala.collection.Seq[String]]("reconstructed_from_shelfmarks") ==
      Seq("Sinai Syriac 2 (fragment)"))
    val m2 = merged.find(_.getString(0) == "ark:/21198/m2").get
    assert(Option(m2.getAs[scala.collection.Seq[String]]("reconstructed_from_shelfmarks"))
      .forall(_.isEmpty))
  }
}
