package graft

import graft.core.CodeDoc
import graft.corpus.CodeCorpus
import graft.index.IndexConfig
import graft.query.Searcher
import graft.streaming.StreamingIngest
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming ingest: delta segments committed, quarantine captures bad rows") {
    val src = java.nio.file.Files.createTempDirectory("graftstreamsrc").toString
    val out = java.nio.file.Files.createTempDirectory("graftstreamout").toString
    // two "arriving" files: one good batch + one with invalid rows
    CodeCorpus.generate(spark, 200, nRepos = 5, partitions = 2)
      .write.mode("overwrite").parquet(src)
    Seq(
      CodeDoc("", "p", "c", "scala", "some content here"), // missing repo
      CodeDoc("r", "q", "c", "scala", ""), // empty content
      CodeDoc("repo-ok", "path-ok", "c", "scala", "valid late arrival buffer")
    ).toDS().write.mode("append").parquet(src)

    val q = StreamingIngest.ingestStream(spark, src, out,
      IndexConfig(buckets = 8, saltRange = 128, shufflePartitions = 4))
    q.awaitTermination()

    val deltas = StreamingIngest.committedDeltas(out)
    assert(deltas.nonEmpty, "at least one committed delta segment")
    // quarantine holds exactly the two invalid rows with reasons
    val quarantined = spark.read.parquet(s"$out/quarantine")
      .select("_reason").collect().map(_.getString(0)).sorted
    assert(quarantined.toSeq == Seq("empty content", "missing repo"))
    // total docs across deltas == 201 valid rows
    val total = deltas.map(d => spark.read.parquet(s"$d/docstats").count()).sum
    assert(total == 201)
    // a delta index answers queries
    val hits = new Searcher(spark, deltas.head).search("buffer", 5)
    assert(hits.nonEmpty)
  }

  test("error budget aborts the stream (importer.py:323-329 analog)") {
    val src = java.nio.file.Files.createTempDirectory("graftstreamsrc2").toString
    val out = java.nio.file.Files.createTempDirectory("graftstreamout2").toString
    Seq(
      CodeDoc("", "p1", "c", "scala", "x"),
      CodeDoc("", "p2", "c", "scala", "y")
    ).toDS().write.mode("overwrite").parquet(src)
    val q = StreamingIngest.ingestStream(spark, src, out,
      IndexConfig(buckets = 8, saltRange = 128, shufflePartitions = 4), maxErrors = 1)
    val failed = intercept[Exception] { q.awaitTermination() }
    assert(failed.getMessage.contains("error budget") ||
      Option(failed.getCause).exists(_.getMessage.contains("error budget")))
  }
}
