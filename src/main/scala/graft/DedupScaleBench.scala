package graft

import org.apache.spark.sql.functions._

/** One-shot empirical validation of the dedup family's scaling claims at
  * 1M+ docs (VERDICT r4 #6): the battery only ever times `dedupCorpus` /
  * `connectedComponents` at sf0.1 (50k docs), so the star-edge + CC scaling
  * argument was analytical until this run. Times the full corpus-dedup
  * pipeline (shingle -> hash-once MinHash -> banded star edges -> connected
  * components -> anti-join survivors) on the deterministic synthetic corpus
  * at a configurable size, and reports wall time, docs/s and total shuffle
  * volume (StageMetrics). Results are curated into BENCH/BASELINE.md; the
  * run also writes BENCH/DEDUP_SCALE_LAST.md.
  *
  * Usage: runMain graft.DedupScaleBench [nDocs] [cpus]
  * (defaults 1000000, 32; SPARK_DRIVER_MEM sizes the forked heap)
  */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = Bench.newSession(cpus)
    import spark.implicits._

    def corpus(n: Long) = spark.range(n)
      .as[Long].map(i => graft.corpus.CodeCorpus.genDoc(i, nRepos = 1000))
      .toDF()
      // documents-table shape: (doc_id, text); path ordinal = unique id
      .select(monotonically_increasing_id().as("doc_id"), col("content").as("text"))

    // materialize the input untimed (dedup reads an EXISTING table; corpus
    // generation is bench scaffolding, not engine work)
    val src = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
        else System.getProperty("java.io.tmpdir")), "graftdedupscale").toString
    corpus(nDocs).write.mode("overwrite").parquet(src)
    val docs = spark.read.parquet(src)

    // JIT/codegen warm-up on a small slice, untimed (same protocol as Bench)
    graft.ops.Dedup.dedupCorpus(docs.limit(5000), "doc_id", "text").count()

    val sm = StageMetrics.install(spark)
    val (survivors, sec) = Bench.time {
      graft.ops.Dedup.dedupCorpus(docs, "doc_id", "text").count()
    }
    val shufWriteMB = sm.rows.map(_.shufWriteMB).sum
    val shufReadMB = sm.rows.map(_.shufReadMB).sum
    val spillMB = sm.rows.map(_.spillMB).sum
    sm.report(s"dedupCorpus nDocs=$nDocs")

    val md =
      f"""# BENCH/DEDUP_SCALE_LAST — dedup family at $nDocs docs
         |
         || metric | value |
         ||---|---|
         || corpus docs | $nDocs |
         || survivors | $survivors |
         || wall sec (dedupCorpus end-to-end) | $sec%.2f |
         || docs/sec | ${nDocs / sec}%.0f |
         || shuffle write MB (all stages) | $shufWriteMB%.0f |
         || shuffle read MB (all stages) | $shufReadMB%.0f |
         || spill MB | $spillMB%.0f |
         |
         |Pipeline: shingle(k=3) -> hash-once MinHash -> 8-band star edges ->
         |connected components (hybrid driver-union-find / label propagation)
         |-> anti-join survivors, local[$cpus].
         |""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH/DEDUP_SCALE_LAST.md"), md)
    println(md)
    println(f"""{"metric":"dedup_docs_per_sec","value":${nDocs / sec}%.1f,"unit":"docs/sec","nDocs":$nDocs,"survivors":$survivors,"shuffle_write_mb":$shufWriteMB%.0f,"shuffle_read_mb":$shufReadMB%.0f}""")
    import scala.reflect.io.Directory
    new Directory(new java.io.File(src)).deleteRecursively()
    spark.stop()
  }
}
