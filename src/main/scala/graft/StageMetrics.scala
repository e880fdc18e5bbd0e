package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage telemetry for scaling diagnosis: wall vs summed executor CPU vs
  * GC vs shuffle volume, plus the per-stage max/median TASK duration (the
  * skew statistic — a straggler shows up as maxTask >> medTask long before
  * it dominates stage wall time on an underloaded box). CPU/wall ≈ effective
  * parallelism of the stage; a stage whose CPU stays flat while wall grows
  * is overhead-bound, one whose GC grows with cores is allocation-bound —
  * different fixes, so measure before optimizing. Enabled by [[install]];
  * dump with [[report]].
  */
final class StageMetrics extends SparkListener {
  case class Row(stageId: Int, name: String, tasks: Int, wallMs: Long,
                 cpuMs: Long, runMs: Long, gcMs: Long,
                 shufWriteMB: Double, shufReadMB: Double, spillMB: Double,
                 maxTaskMs: Long, medTaskMs: Long)

  val rows: mutable.ArrayBuffer[Row] = mutable.ArrayBuffer.empty
  // per-stage task durations, retired into the Row when the stage completes
  private val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    if (te.taskInfo != null && te.taskInfo.finished) rows.synchronized {
      taskMs.getOrElseUpdate(te.stageId, mutable.ArrayBuffer.empty) +=
        te.taskInfo.duration
    }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val m = si.taskMetrics
    val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
    rows.synchronized {
      val durs = taskMs.remove(si.stageId).getOrElse(mutable.ArrayBuffer.empty)
      val sortedDurs = durs.sorted
      rows += Row(si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
        wall, m.executorCpuTime / 1000000, m.executorRunTime,
        m.jvmGCTime, m.shuffleWriteMetrics.bytesWritten / 1e6,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
        if (sortedDurs.isEmpty) 0L else sortedDurs.last,
        if (sortedDurs.isEmpty) 0L else sortedDurs(sortedDurs.length / 2))
    }
  }

  def reset(): Unit = rows.synchronized { rows.clear(); taskMs.clear() }

  /** Worst max/median task-duration ratio among recorded stages with at
    * least `minTasks` tasks and median >= `minMedianMs` (tiny stages are
    * noise: a 3 ms median makes any scheduling hiccup look like skew).
    * Returns (ratio, stage row); 0-ratio placeholder when nothing
    * qualifies. This is the straggler gate DedupScaleBench's planted-hot-
    * gram leg reports against.
    */
  def worstTaskSkew(minTasks: Int = 8, minMedianMs: Long = 200): (Double, Option[Row]) =
    rows.synchronized {
      val qualified = rows.filter(r => r.tasks >= minTasks && r.medTaskMs >= minMedianMs)
      if (qualified.isEmpty) (0.0, None)
      else {
        val worst = qualified.maxBy(r => r.maxTaskMs.toDouble / math.max(1L, r.medTaskMs))
        (worst.maxTaskMs.toDouble / math.max(1L, worst.medTaskMs), Some(worst))
      }
    }

  /** Table of stages ≥ minWallMs, stderr. cpu/wall = effective parallelism. */
  def report(label: String, minWallMs: Long = 300): Unit = rows.synchronized {
    System.err.println(s"[stage-metrics] === $label ===")
    System.err.println(f"[stage-metrics] ${"stage"}%-42s tasks  wall_s  cpu_s  run_s  gc_s  cpu/wall  shW_MB shR_MB spill maxT_ms medT_ms")
    rows.filter(_.wallMs >= minWallMs).foreach { r =>
      System.err.println(f"[stage-metrics] ${r.stageId}%4d ${r.name.take(36)}%-37s ${r.tasks}%5d ${r.wallMs / 1e3}%7.2f ${r.cpuMs / 1e3}%6.1f ${r.runMs / 1e3}%6.1f ${r.gcMs / 1e3}%5.1f ${r.cpuMs.toDouble / math.max(1, r.wallMs)}%9.2f ${r.shufWriteMB}%7.1f ${r.shufReadMB}%6.1f ${r.spillMB}%5.0f ${r.maxTaskMs}%7d ${r.medTaskMs}%7d")
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
