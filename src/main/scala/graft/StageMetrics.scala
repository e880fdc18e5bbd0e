package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage telemetry for scaling diagnosis: wall vs summed executor CPU vs
  * GC vs shuffle volume. CPU/wall ≈ effective parallelism of the stage; a
  * stage whose CPU stays flat while wall grows is overhead-bound, one whose
  * GC grows with cores is allocation-bound — different fixes, so measure
  * before optimizing. Enabled by [[install]]; dump with [[report]].
  */
final class StageMetrics extends SparkListener {
  case class Row(stageId: Int, name: String, tasks: Int, wallMs: Long,
                 cpuMs: Long, runMs: Long, gcMs: Long,
                 shufWriteMB: Double, shufReadMB: Double, spillMB: Double)

  val rows: mutable.ArrayBuffer[Row] = mutable.ArrayBuffer.empty

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val m = si.taskMetrics
    val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
    rows.synchronized {
      rows += Row(si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
        wall, m.executorCpuTime / 1000000, m.executorRunTime,
        m.jvmGCTime, m.shuffleWriteMetrics.bytesWritten / 1e6,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
    }
  }

  def reset(): Unit = rows.synchronized(rows.clear())

  /** Table of stages ≥ minWallMs, stderr. cpu/wall = effective parallelism. */
  def report(label: String, minWallMs: Long = 300): Unit = rows.synchronized {
    System.err.println(s"[stage-metrics] === $label ===")
    System.err.println(f"[stage-metrics] ${"stage"}%-42s tasks  wall_s  cpu_s  run_s  gc_s  cpu/wall  shW_MB shR_MB spill")
    rows.filter(_.wallMs >= minWallMs).foreach { r =>
      System.err.println(f"[stage-metrics] ${r.stageId}%4d ${r.name.take(36)}%-37s ${r.tasks}%5d ${r.wallMs / 1e3}%7.2f ${r.cpuMs / 1e3}%6.1f ${r.runMs / 1e3}%6.1f ${r.gcMs / 1e3}%5.1f ${r.cpuMs.toDouble / math.max(1, r.wallMs)}%9.2f ${r.shufWriteMB}%7.1f ${r.shufReadMB}%6.1f ${r.spillMB}%5.0f")
    }
  }
}

object StageMetrics {
  def install(spark: SparkSession): StageMetrics = {
    val l = new StageMetrics
    spark.sparkContext.addSparkListener(l)
    l
  }
}
