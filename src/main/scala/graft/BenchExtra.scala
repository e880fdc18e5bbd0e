package graft

/** Round-7 optimization evidence harness (guide §1.1/§1.4): for a list of
  * battery queries, writes `plans/r07/<name>_<tag>.txt` (`explain formatted`)
  * and times min-of-3 passes in ONE warm session with a noop-sink-equivalent
  * action (the frozen Bench methodology's `.count()` — kept identical so the
  * numbers compare 1:1 with BENCH_LAST.json entries).
  *
  * Usage: runMain graft.BenchExtra <tag> [sfDir] [q1,q2,...]
  */
/** Builds the QueryScalingBench corpus/index ONCE into a fixed dir so
  * kernel-optimization iterations can re-run `QueryScalingBench qleg <cores>
  * <dir> <batch>` legs without paying the 1.6M-doc build each time.
  * Usage: runMain graft.QScaleIndex <dir> [nDocs]
  */
object QScaleIndex {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(1600000L)
    val spark = Bench.newSession("32")
    try {
      import spark.implicits._
      val src = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "qsrc").toString
      graft.corpus.CodeCorpus.generate(spark, nDocs, nRepos = 100, partitions = 64)
        .write.mode("overwrite").parquet(src)
      graft.index.IndexBuilder.build(spark,
        spark.read.parquet(src).as[graft.core.CodeDoc], dir,
        graft.index.IndexConfig(buckets = 64, saltRange = 8192,
          shufflePartitions = 64, bucketDirs = true))
      import scala.reflect.io.Directory
      new Directory(new java.io.File(src)).deleteRecursively()
      println(s"index at $dir")
    } finally spark.stop()
  }
}

object BenchExtra {
  val DefaultQueries: Seq[String] = Seq(
    "q_year_expand", "q_anti_join", "q_semi_join", "q_multiway_join",
    "q_last_wins", "q_tfidf_keywords", "q_lm_quality", "q_cosine_topk",
    "q_minhash_lsh", "q_dedup_clusters", "q_dedup_corpus",
    "q_pipeline_curation", "q_stream_window", "q_winnow",
    "q_line_dedup_first", "q_line_dedup_boiler", "q_pipeline_preprocess",
    "q_substring_spans", "q_pack_sequences", "q_pack_inverse",
    "q_embed_neardup", "q1_agg")

  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(DefaultQueries)
    val spark = Bench.newSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag")).count().collect()
    // the HOF warm-up Bench.main runs, so dedup-family cold numbers compare
    locally {
      import org.apache.spark.sql.functions._
      val d = graft.ops.Dedup.bandedProjection(
        spark.range(3).select(col("id").as("doc_id"),
          concat(lit("a b c d e f "), col("id").cast("string")).as("text")),
        "doc_id", "text", 3, 8)
      d.as("l").join(d.as("r"), Seq("band", "sig"))
        .groupBy(col("l._id")).count().collect()
    }
    val outDir = java.nio.file.Paths.get("plans/r07")
    java.nio.file.Files.createDirectories(outDir)
    val report = new StringBuilder
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchextra:$name")
      val df0 = fn(spark, sfDir)
      val plan = df0.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"),
        if (plan.length <= 60000) plan
        else plan.take(60000) + s"\n... [truncated, ${plan.length} chars total]\n")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val line = f"$name%-24s min ${times.min}%7.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}"
      println(s"[benchextra] $line")
      report.append(line).append('\n')
    }
    java.nio.file.Files.writeString(outDir.resolve(s"times_$tag.txt"), report.toString)
    spark.stop()
  }
}
