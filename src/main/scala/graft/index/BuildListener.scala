package graft.index

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import scala.collection.mutable

/** Lineage/metrics listener: per-stage wall time, task count, task-time
  * skew, shuffle and spill volumes. Registered during builds and benches;
  * the summary is printed at the end (north-rule requirement: per-task
  * metrics + lineage per partition).
  */
final class BuildListener extends SparkListener {
  final case class StageRow(
      stageId: Int, name: String, durMs: Long, tasks: Int,
      taskTimeMs: Long, maxTaskMs: Long,
      shuffleReadMB: Double, shuffleWriteMB: Double,
      spillMB: Double, inputMB: Double, outputMB: Double)

  private val stages = new mutable.ArrayBuffer[StageRow]()
  private val taskMax = new mutable.HashMap[Int, Long]()

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
    val ms = if (t.taskInfo != null) t.taskInfo.duration else 0L
    taskMax(t.stageId) = math.max(taskMax.getOrElse(t.stageId, 0L), ms)
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
    val si = sc.stageInfo
    val m = si.taskMetrics
    if (m != null) {
      stages += StageRow(
        si.stageId,
        si.name.takeWhile(_ != '\n').take(60),
        si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
        si.numTasks,
        m.executorRunTime,
        taskMax.getOrElse(si.stageId, 0L),
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
        m.inputMetrics.bytesRead / 1e6,
        m.outputMetrics.bytesWritten / 1e6)
    }
  }

  /** machine-readable lineage: one object per Spark stage (persisted into
    * the index dir as build_metrics.json so the per-task evidence travels
    * with the artifact). Best-effort: the listener bus is async, so a
    * stage completing in the final milliseconds may be absent. */
  def reportJson(): String = synchronized {
    stages.sortBy(_.stageId).map { s =>
      s"""{"stage":${s.stageId},"name":"${s.name.replaceAll("[\"\\\\]", " ")}",""" +
        s""""dur_ms":${s.durMs},"tasks":${s.tasks},"task_time_ms":${s.taskTimeMs},""" +
        s""""max_task_ms":${s.maxTaskMs},"shuffle_read_mb":${s.shuffleReadMB},""" +
        s""""shuffle_write_mb":${s.shuffleWriteMB},"spill_mb":${s.spillMB},""" +
        s""""input_mb":${s.inputMB},"output_mb":${s.outputMB}}"""
    }.mkString("[", ",", "]")
  }

  def report(): String = synchronized {
    val sb = new StringBuilder("[graft-stages]\n")
    stages.sortBy(_.stageId).foreach { s =>
      sb.append(f"  stage ${s.stageId}%3d ${s.durMs / 1000.0}%7.1fs tasks=${s.tasks}%4d " +
        f"cpuSum=${s.taskTimeMs / 1000.0}%7.1fs maxTask=${s.maxTaskMs / 1000.0}%6.1fs " +
        f"in=${s.inputMB}%8.1fMB out=${s.outputMB}%8.1fMB " +
        f"sRead=${s.shuffleReadMB}%8.1fMB sWrite=${s.shuffleWriteMB}%8.1fMB " +
        f"spill=${s.spillMB}%8.1fMB  ${s.name}\n")
    }
    sb.toString
  }
}
