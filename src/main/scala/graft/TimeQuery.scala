package graft

/** Ad-hoc per-query timing harness: runs one battery query N times in one
  * session (cold first run exposes codegen/JIT cost, warm repeats expose the
  * steady-state work). Usage: runMain graft.TimeQuery <name> [reps] [sfDir]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = Bench.newSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warm-up
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%8.3f s ($n rows)")
    }
    spark.stop()
  }
}
