package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Dump (merged manuscript JSON, Spark Solr record) pairs for the Sinai
  * parity harness (tools/sinai_parity.py), which replays the REFERENCE'S OWN
  * pydantic ManuscriptSolrRecord over the same merged inputs and diffs every
  * field — the Sinai analog of tools/ursus_parity.py, usable on ANY corpus,
  * not just the 7 reference fixtures.
  *
  * Usage:
  *   runMain graft.SinaiParityDump entities <entityRoot> <outDir>
  *     — full pipeline: entity dirs -> merge -> records
  *   runMain graft.SinaiParityDump synthetic <n> <outDir>
  *     — n deterministic mod-class manuscripts (SinaiQueries.msJson shapes)
  */
object SinaiParityDump {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val outDir = Paths.get(args(2))
    Files.createDirectories(outDir.resolve("merged"))
    val mapper = new ObjectMapper()
    mapper.registerModule(DefaultScalaModule)

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val merged: Seq[(String, String)] = mode match {
      case "entities" =>
        graft.docprep.SinaiEntityMerge.mergeAll(spark, args(1)).collect().toSeq
      case "synthetic" =>
        val n = args(1).toInt
        (1 to n).map { i =>
          // shape like mergeAll output (declaration order, defaults pruned)
          // so manuscript_json_ts byte-compares against the pydantic dump
          val shaped = graft.docprep.SinaiSchema.dumpShape(
            mapper.readTree(SinaiQueries.msJson(i.toLong, s"Synthetic work $i title")),
            "ms_obj")
          (s"ark:/21198/z$i", mapper.writeValueAsString(shaped))
        }
      case "rich" => // guest layers, paras, places, excerpts, bib, iiif, ...
        val n = args(1).toInt
        (1 to n).map { i =>
          val shaped = graft.docprep.SinaiSchema.dumpShape(
            mapper.readTree(SinaiRichGen.msJson(i.toLong)), "ms_obj")
          (s"ark:/21198/zr$i", mapper.writeValueAsString(shaped))
        }
      case other => sys.error(s"unknown mode $other")
    }

    val recLines = new StringBuilder
    merged.foreach { case (ark, json) =>
      val fname = ark.stripPrefix("ark:/21198/").replace("/", "-") + ".json"
      Files.writeString(outDir.resolve("merged").resolve(fname), json)
      val rec = graft.docprep.SinaiSolr.project(
        mapper.readTree(json).asInstanceOf[ObjectNode])
      recLines.append(mapper.writeValueAsString(rec)).append('\n')
    }
    Files.writeString(outDir.resolve("records.jsonl"), recLines.toString)
    println(s"dumped ${merged.size} manuscripts to $outDir")
    spark.stop()
  }
}
