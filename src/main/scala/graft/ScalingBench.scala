package graft

/** The north rule's two-cluster-size scaling evidence: run the SAME index
  * build on the SAME input at N and 4N executor cores, report throughput at
  * both and efficiency = (thr@4N / thr@N) / 4.
  *
  * Default mode is `local-cluster`: real separate executor JVMs (own heap,
  * own GC, own JIT — like real nodes), 2 workers vs 8 workers of 4 cores
  * each. This is the faithful single-box proxy for "N vs 4N executors" —
  * local[n] threads share one heap, so the shared GC becomes a bottleneck no
  * real cluster has. Pass `threads` as the 3rd arg to measure the old
  * local[N] vs local[4N] shape instead.
  *
  * Writes BENCH/SCALING_LAST.md (BENCH/BASELINE.md is curated by hand).
  *
  * Usage: runMain graft.ScalingBench [nDocs] [N] [cluster|threads]
  * (defaults 200000, 8, cluster)
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val n = if (args.length > 1) args(1).toInt else 8
    val mode = if (args.length > 2) args(2) else "cluster"
    val coresPerWorker = 4

    def runAt(cores: Int): Map[String, Double] = {
      val spark =
        if (mode == "cluster")
          Bench.newClusterSession(cores / coresPerWorker, coresPerWorker)
        else Bench.newSession(cores.toString)
      // JIT/classloading warm-up: a small throwaway build, NOT measured —
      // without it the first measured run absorbs all compilation cost and
      // the N->4N ratio comes out dishonestly super-linear.
      try {
        Bench.engineBench(spark, math.min(5000L, nDocs / 4))
        Bench.engineBench(spark, nDocs)
      } finally spark.stop()
    }

    val atN = runAt(n)
    val at4N = runAt(4 * n)
    val thrN = atN("ix_build_docs_per_sec")
    val thr4N = at4N("ix_build_docs_per_sec")
    val eff = (thr4N / thrN) / 4.0

    val shape =
      if (mode == "cluster")
        s"local-cluster: ${n / coresPerWorker} vs ${4 * n / coresPerWorker} executor JVMs x $coresPerWorker cores"
      else s"local[$n] vs local[${4 * n}] threads, one shared JVM"

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
         || index build sec | ${atN("ix_build_sec")}%.2f | ${at4N("ix_build_sec")}%.2f |
         || build docs/sec | $thrN%.1f | $thr4N%.1f |
         || query p50 ms (k=10) | ${atN("ix_query_p50_ms")}%.1f | ${at4N("ix_query_p50_ms")}%.1f |
         |
         |**Scaling efficiency N -> 4N: ${eff}%.3f** (gate: >= 0.8)
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
