package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.docprep.{SinaiEntityMerge, SinaiSolr, SinaiSolrRecord}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parity against the reference's OWN golden outputs: the export_test
  * fixture tree ships both the expected merged manuscripts
  * (tests/sinai/export_test/merged/<ark>.json — importer.save_merged_records)
  * and the expected Solr records (solr/<ark>.json — save_solr_records).
  *
  * The two golden sets were generated at different times and are mutually
  * inconsistent with the CURRENT reference code + data in two enumerable
  * ways (verified against the reference source):
  *  - merged/ predates get_uto's para-origin-date fallback
  *    (sinai_json_importer.py:228-243): merged/ten02zkr.json's second uto
  *    has no orig_date although its layer's para carries an origin date.
  *  - solr/ was generated from OLDER RAW DATA (e.g. layers/te5fp1ol.json's
  *    para iso now reads 1290 where solr/te5f0f9b.json's embedded
  *    manuscript_json_ts reads 1292), so year/date fields differ vs today's
  *    entity files.
  *
  * The gates therefore are:
  *  1. full-pipeline merge vs merged/ goldens — semantic equality, with the
  *     single documented orig_date exemption;
  *  2. record generator vs solr/ goldens over each golden's OWN embedded
  *     merged JSON — every field exact, including byte equality of
  *     manuscript_json_ts (this also proves the compact serializer matches
  *     pydantic model_dump_json byte for byte on real data);
  *  3. full pipeline (entity dirs -> merge -> record) runs end to end under
  *     Spark and emits one record per manuscript.
  *
  * Skipped cleanly when the reference checkout is absent.
  */
class SinaiGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val root = "/root/reference/tests/sinai/export_test"
  private def available: Boolean = Files.isDirectory(Paths.get(root, "merged"))
  private val mapper = new ObjectMapper()

  private lazy val merged: Map[String, String] = {
    import spark.implicits._
    SinaiEntityMerge.mergeAll(spark, root).collect().toMap
  }

  private def goldenFiles(sub: String): Seq[java.nio.file.Path] =
    Files.list(Paths.get(root, sub)).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".json")).sortBy(_.toString)

  // the ark -> filename mapping is lossy ("/" and "-" collide); the record's
  // own ark (ark_ssi for solr goldens) is authoritative
  private def arkOf(p: java.nio.file.Path): String = {
    val n = mapper.readTree(Files.readString(p))
    Option(n.get("ark")).orElse(Option(n.get("ark_ssi"))).get.asText()
  }

  test("merge: every manuscript merges; none skipped") {
    assume(available)
    val expected = goldenFiles("merged").map(arkOf).toSet
    assert(merged.keySet == expected)
  }

  test("merge: semantic equality with the reference's merged goldens") {
    assume(available)
    goldenFiles("merged").foreach { p =>
      val want = mapper.readTree(Files.readString(p))
      val got = mapper.readTree(merged(arkOf(p)))
      // documented exemption: current importer code backfills uto orig_date
      // from para origin dates; the merged/ goldens predate that fallback.
      // Drop orig_date from OUR utos wherever the golden's counterpart has
      // none — everything else must match exactly.
      def utos(n: JsonNode): Seq[ObjectNode] =
        (n.get("part") match {
          case null => Seq.empty
          case parts => parts.elements().asScala.toSeq.flatMap(pp =>
            Option(pp.get("uto")).toSeq.flatMap(_.elements().asScala))
        }) ++ Option(n.get("uto")).toSeq.flatMap(_.elements().asScala) map
          (_.asInstanceOf[ObjectNode])
      utos(got).zip(utos(want)).foreach { case (g, w) =>
        if (!w.has("orig_date") && g.has("orig_date")) { g.remove("orig_date"); () }
      }
      assert(got == want, s"merged tree differs for ${arkOf(p)}")
    }
  }

  test("solr record: EVERY field matches the reference's solr goldens " +
    "(generator run over each golden's own embedded merged record)") {
    assume(available)
    goldenFiles("solr").foreach { p =>
      val ark = arkOf(p)
      val want = mapper.readTree(Files.readString(p)).asInstanceOf[ObjectNode]
      val ms = mapper.readTree(want.get("manuscript_json_ts").asText())
        .asInstanceOf[ObjectNode]
      val rec = SinaiSolr.project(ms)
      val byName: Map[String, Any] =
        rec.productElementNames.zip(rec.productIterator).toMap
      want.fields().asScala.foreach { e =>
        val (field, w) = (e.getKey, e.getValue)
        val got = byName.getOrElse(field, fail(s"[$ark] field $field not produced"))
        val gotNorm: Any = got match {
          case s: Seq[_] => s.map(_.toString)
          case Some(v) => v.toString
          case None => null
          case other => other.toString
        }
        val wantNorm: Any =
          if (w.isNull) null
          else if (w.isArray) w.elements().asScala.map(_.asText()).toSeq
          else w.asText()
        assert(gotNorm == wantNorm, s"[$ark] $field")
      }
    }
  }

  test("full pipeline under Spark: entity dirs -> merged -> one record each") {
    assume(available)
    val df = SinaiSolr.fromEntityDirs(spark, root)
    val rows = df.select("ark_ssi", "shelfmark_ssi", "visibility_ssi").collect()
    assert(rows.length == goldenFiles("merged").length)
    assert(rows.forall(_.getString(2) == "open"))
    assert(df.columns.length == 56)
  }
}
