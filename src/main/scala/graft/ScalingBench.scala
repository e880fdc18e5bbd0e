package graft

/** The north rule's two-cluster-size scaling evidence: run the SAME index
  * build on the SAME input at local[N] and local[4N] (the sandbox proxy for N
  * vs 4N executors, per the driver's instruction), report throughput at both
  * and efficiency = (thr@4N / thr@N) / 4. Writes BENCH/SCALING_LAST.md (BENCH/BASELINE.md is curated by hand from it).
  *
  * Usage: runMain graft.ScalingBench [nDocs] [N]   (defaults 50000, 8)
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 50000L
    val n = if (args.length > 1) args(1).toInt else 8

    def runAt(cores: Int): Map[String, Double] = {
      val spark = Bench.newSession(cores.toString)
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

    val md =
      f"""# BENCH/BASELINE — measured engine numbers
         |
         |Index build over the deterministic synthetic code corpus
         |(FIXTURES.md §1), identical input at both parallelism levels —
         |the sandbox proxy for N vs 4N executors (driver instruction;
         |BASELINE.md §2 scaling gate: efficiency >= 0.8).
         |
         || metric | local[$n] (N) | local[${4 * n}] (4N) |
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
    println(f"""{"metric":"scaling_efficiency","value":$eff%.4f,"unit":"ratio","thrN":$thrN%.1f,"thr4N":$thr4N%.1f,"nDocs":$nDocs}""")
  }
}
