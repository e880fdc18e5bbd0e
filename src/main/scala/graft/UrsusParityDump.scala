package graft

import graft.docprep.UrsusRecord
import org.apache.spark.sql.SparkSession

/** Dump the full UrsusRecord projection of a CSV to JSON for the Python
  * parity harness (tools/ursus_parity.py), which runs the REFERENCE'S OWN
  * pydantic model over the same rows and diffs field by field.
  *
  * Usage: runMain graft.UrsusParityDump <csv> <outDir>
  */
object UrsusParityDump {
  def main(args: Array[String]): Unit = {
    val Array(csv, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.option("header", "true").csv(csv)
    UrsusRecord.project(df, now = Some("2026-05-19T19:20:00Z"))
      .coalesce(1).write.mode("overwrite").json(outDir)
    spark.stop()
  }
}
