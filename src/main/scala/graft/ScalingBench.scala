package graft

/** The north rule's two-cluster-size scaling evidence: run the SAME index
  * build on the SAME input at N and 4N executor cores, report throughput at
  * both and efficiency = (thr@4N / thr@N) / 4.
  *
  * Measurement protocol (each choice fixes a bias measured on this box):
  *  - `local-cluster`: real separate executor JVMs (own heap/GC/JIT — like
  *    real nodes), workers of 4 cores each. local[n] threads share one heap,
  *    so the shared GC becomes a bottleneck no real cluster has.
  *  - Every leg runs in a FRESH child driver JVM. Running both legs in one
  *    process contaminated the second leg (~3x executor-CPU inflation from
  *    lingering first-leg processes/GC debt — measured, see BENCH/BASELINE.md
  *    round 1 "4N-leg GC-debt bias").
  *  - ABBA order (N, 4N, 4N, N) and best-of-2 per leg: cancels monotone
  *    environment drift on a shared VM; best-of-k is the standard
  *    noise-robust estimator.
  *  - Per-leg JIT warm-up build inside each child (not measured).
  *
  * Writes BENCH/SCALING_LAST.md (BENCH/BASELINE.md is curated by hand).
  *
  * Usage: runMain graft.ScalingBench [nDocs] [N] [cluster|threads|single] [execMemMB]
  * (defaults 400000, 4, cluster, 4096). `single` = one in-process leg at
  * exactly N cores — the unit the cluster mode spawns as child processes.
  * Scale execMemMB with nDocs (the 4-core leg holds the whole fused-pass
  * cache partition set in one executor).
  */
object ScalingBench {
  private val coresPerWorker = 4

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 400000L
    val n = if (args.length > 1) args(1).toInt else 4
    val mode = if (args.length > 2) args(2) else "cluster"
    val execMemMB = if (args.length > 3) args(3).toInt else 4096

    def runInProcess(cores: Int, threads: Boolean): Map[String, Double] = {
      val spark =
        if (threads) Bench.newSession(cores.toString)
        else Bench.newClusterSession(math.max(1, cores / coresPerWorker),
          math.min(cores, coresPerWorker), execMemMB)
      // JIT/classloading warm-up: a small throwaway build, NOT measured —
      // without it the first measured run absorbs all compilation cost and
      // the N->4N ratio comes out dishonestly super-linear.
      try {
        Bench.engineBench(spark, math.min(5000L, nDocs / 4))
        Bench.engineBench(spark, nDocs)
      } finally spark.stop()
    }

    if (mode == "single" || mode == "threads-single") {
      val m = runInProcess(n, threads = mode == "threads-single")
      println(f"""{"metric":"single_leg","cores":$n,"docs_per_sec":${m("ix_build_docs_per_sec")}%.1f,"build_sec":${m("ix_build_sec")}%.2f,"p50_ms":${m("ix_query_p50_ms")}%.1f}""")
      return
    }

    // spawn one fresh child JVM per leg so legs cannot contaminate each other
    def runLeg(cores: Int): Map[String, Double] = {
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
        .defaultModuleOptions().trim.split("\\s+").toSeq
      val childMode = if (mode == "threads") "threads-single" else "single"
      val cmd = Seq(javaBin) ++ moduleOpts ++ Seq(
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.ScalingBench", nDocs.toString, cores.toString, childMode,
        execMemMB.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      val code = p.waitFor()
      require(code == 0, s"scaling leg at $cores cores exited $code")
      val line = out.find(_.contains("\"single_leg\""))
        .getOrElse(sys.error(s"no single_leg line from $cores-core child"))
      def field(k: String): Double =
        (s""""$k":([0-9.]+)""".r.findFirstMatchIn(line)
          .getOrElse(sys.error(s"missing $k in: $line")).group(1)).toDouble
      Map("docs_per_sec" -> field("docs_per_sec"),
        "build_sec" -> field("build_sec"), "p50_ms" -> field("p50_ms"))
    }

    val legs = Seq(n, 4 * n, 4 * n, n) // ABBA
    val samples = legs.map { c =>
      val r = runLeg(c)
      System.err.println(s"[scaling] leg cores=$c -> ${r("docs_per_sec")} docs/s")
      c -> r
    }
    def best(c: Int): Map[String, Double] =
      samples.filter(_._1 == c).map(_._2).maxBy(_("docs_per_sec"))
    val atN = best(n)
    val at4N = best(4 * n)
    val thrN = atN("docs_per_sec")
    val thr4N = at4N("docs_per_sec")
    val eff = (thr4N / thrN) / 4.0

    val shape =
      if (mode == "cluster")
        s"local-cluster: ${math.max(1, n / coresPerWorker)} vs ${4 * n / coresPerWorker} executor JVMs x $coresPerWorker cores, fresh child driver JVM per leg, ABBA best-of-2"
      else s"local[$n] vs local[${4 * n}] threads, fresh child JVM per leg, ABBA best-of-2"

    val md =
      f"""# BENCH/BASELINE — measured engine numbers
         |
         |Index build over the deterministic synthetic code corpus
         |(FIXTURES.md §1), identical input at both parallelism levels —
         |$shape — the sandbox proxy for N vs 4N executors (driver
         |instruction; BASELINE.md §2 scaling gate: efficiency >= 0.8).
         |
         || metric | $n cores (N) | ${4 * n} cores (4N) |
         ||---|---|---|
         || corpus docs | $nDocs | $nDocs |
         || index build sec | ${atN("build_sec")}%.2f | ${at4N("build_sec")}%.2f |
         || build docs/sec | $thrN%.1f | $thr4N%.1f |
         || query p50 ms (k=10) | ${atN("p50_ms")}%.1f | ${at4N("p50_ms")}%.1f |
         |
         |**Scaling efficiency N -> 4N: ${eff}%.3f** (gate: >= 0.8)
         |
         |All samples (ABBA order): ${samples.map { case (c, r) => f"$c%d:${r("docs_per_sec")}%.0f" }.mkString(", ")} docs/s.
         |
         |Queries: bench set of ${Bench.BenchQueries.length} (head/mid/tail df,
         |multi-term mm tiers, planted phrases) at k=10, warm index.
         |""".stripMargin

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/SCALING_LAST.md"), md)
    println(md)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.4f,"unit":"ratio","thrN":$thrN%.1f,"thr4N":$thr4N%.1f,"nDocs":$nDocs,"mode":"$mode%s"}""")
  }
}
