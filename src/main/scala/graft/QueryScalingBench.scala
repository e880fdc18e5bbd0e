package graft

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** The north rule's two-cluster-size criterion applied to the QUERY side:
  * batched distributed retrieval (`searchManyDistributed` — the only batch
  * shape that exists at the 10^12-doc target) over the SAME index at N and
  * 4N cores, throughput at both plus scaling efficiency.
  *
  * Protocol mirrors ScalingBench where it applies: the index is built ONCE
  * (untimed) to a shared dir; each leg runs in a FRESH child JVM (no
  * GC/JIT contamination between legs); ABBA order, best-of-2 per leg;
  * per-leg warm-up batches untimed; the measured number is best-of-3
  * batch runs. The index is built with saltRange 8192 so the batch job has
  * ~nDocs/8192 salt groups of work — parallelism is data-driven, not capped
  * by a handful of fat groups (at the real target salts outnumber cores by
  * orders of magnitude; the same knob, documented in IndexConfig).
  *
  * Usage: runMain graft.QueryScalingBench [nDocs] [N] [batch] (defaults
  * 400000, 8, 256). Single-leg child mode: ... qleg <cores> <indexDir> [batch].
  */
object QueryScalingBench {

  private def buildBatch(n: Int): Seq[String] = {
    val words = Bench.BenchQueries.flatMap(_.split(" ")).distinct
    (0 until n).map(i => s"${words(i % words.size)} ${words((i * 7 + 3) % words.size)}")
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "qleg") {
      // batch defaults like the parent's, so the documented 3-arg child
      // form works (the guard used to pass at length 3 then read args(3))
      runLegInProcess(args(1).toInt, args(2),
        if (args.length > 3) args(3).toInt else 256)
      return
    }
    val nDocs = if (args.length > 0) args(0).toLong else 400000L
    val n = if (args.length > 1) args(1).toInt else 8
    val batchSize = if (args.length > 2) args(2).toInt else 256

    // shared index, built once, untimed
    val root = java.nio.file.Paths.get(
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-qscale-tmp"
      else System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createDirectories(root)
    val idxDir = java.nio.file.Files.createTempDirectory(root, "qscaleidx").toString
    locally {
      val spark = Bench.newSession("32")
      try {
        import spark.implicits._
        val src = java.nio.file.Files.createTempDirectory(root, "qscalesrc").toString
        CodeCorpus.generate(spark, nDocs, nRepos = 100, partitions = 64)
          .write.mode("overwrite").parquet(src)
        IndexBuilder.build(spark, spark.read.parquet(src).as[graft.core.CodeDoc], idxDir,
          IndexConfig(buckets = 64, saltRange = 8192, shufflePartitions = 64,
            bucketDirs = true))
        import scala.reflect.io.Directory
        new Directory(new java.io.File(src)).deleteRecursively()
      } finally spark.stop()
    }

    def runLeg(cores: Int): Double = {
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
        .defaultModuleOptions().trim.split("\\s+").toSeq
      val cmd = Seq(javaBin) ++ moduleOpts ++ Seq(
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.QueryScalingBench", "qleg", cores.toString, idxDir, batchSize.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      require(p.waitFor() == 0, s"query-scaling leg at $cores cores failed")
      val line = out.find(_.contains("\"qleg\""))
        .getOrElse(sys.error(s"no qleg line from $cores-core child"))
      """"qps":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    }

    val legs = Seq(n, 4 * n, 4 * n, n) // ABBA
    val samples = legs.map { c =>
      val q = runLeg(c)
      System.err.println(s"[query-scaling] leg cores=$c -> $q q/s")
      c -> q
    }
    def best(c: Int): Double = samples.filter(_._1 == c).map(_._2).max
    val thrN = best(n)
    val thr4N = best(4 * n)
    val eff = (thr4N / thrN) / 4.0
    val md =
      f"""# BENCH/QUERY_SCALING_LAST — batched distributed retrieval at N vs 4N cores
         |
         |searchManyDistributed over one shared $nDocs-doc index (saltRange
         |8192 ⇒ ~${nDocs / 8192} salt groups), batch of $batchSize two-term
         |queries, k=10; fresh child JVM per leg, ABBA best-of-2, per-leg
         |warm-up untimed, best-of-3 batch runs measured.
         |
         || metric | $n cores (N) | ${4 * n} cores (4N) |
         ||---|---|---|
         || batched throughput q/s | $thrN%.1f | $thr4N%.1f |
         |
         |**Scaling efficiency N -> 4N: $eff%.3f**
         |
         |All samples (ABBA): ${samples.map { case (c, q) => f"$c%d:$q%.1f" }.mkString(", ")} q/s.
         |""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/QUERY_SCALING_LAST.md"), md)
    println(md)
    println(f"""{"metric":"query_scaling_efficiency","value":$eff%.4f,"unit":"ratio","thrN":$thrN%.1f,"thr4N":$thr4N%.1f,"nDocs":$nDocs,"batch":$batchSize}""")
    import scala.reflect.io.Directory
    new Directory(new java.io.File(idxDir)).deleteRecursively()
  }

  /** One leg in THIS process: local[cores], warm, best-of-3 batch runs.
    * SPARK_GRAFT_TIMING=1 adds the per-stage CPU/shuffle attribution table.
    */
  private def runLegInProcess(cores: Int, idxDir: String, batchSize: Int): Unit = {
    val spark = Bench.newSession(cores.toString)
    try {
      val batch = buildBatch(batchSize)
      val s = new Searcher(spark, idxDir)
      s.searchManyDistributed(batch.take(8), 10) // warm: JIT + dict + norms
      s.searchManyDistributed(batch, 10) // warm: full batch once
      val sm = if (sys.env.get("SPARK_GRAFT_TIMING").contains("1"))
        Some(StageMetrics.install(spark)) else None
      val t = (1 to 3).map(_ => Bench.time(s.searchManyDistributed(batch, 10))._2).min
      sm.foreach(_.report(s"batch=$batchSize cores=$cores (3 timed runs)"))
      s.close()
      println(f"""{"metric":"qleg","cores":$cores,"qps":${batch.size / t}%.2f,"sec":$t%.3f}""")
    } finally spark.stop()
  }
}
