package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import scala.jdk.CollectionConverters._

/** Per-entry benchmark evidence (round-6 verdict ask: the bench "cannot
  * attribute deltas until it records per-entry evidence"). Two sources:
  *
  *  - JVM-level counters (GarbageCollectorMXBean total collection time,
  *    process CPU time, 1-min system load). local[N] runs executors in
  *    the driver JVM, so these cover the WHOLE query — a GC pause or a
  *    loaded host shows up here even when Spark's own metrics look clean.
  *  - A SparkListener summing stage-completed task metrics (executor run
  *    time, task-observed GC, shuffle bytes, stage/task counts) — the
  *    shape evidence: "the plan did 40 stages and shuffled 2 GB" vs "the
  *    plan was fine and the JVM stalled".
  *
  * Listener events are asynchronous; snapshot() waits briefly for the bus
  * to drain after the timed count() returns (jobs are already done, so
  * only delivery lag remains). */
final class BenchMetrics extends SparkListener {
  private val runTimeMs = new LongAdder
  private val taskGcMs = new LongAdder
  private val shufReadB = new LongAdder
  private val shufWriteB = new LongAdder
  private val stages = new LongAdder
  private val tasks = new LongAdder

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val m = e.stageInfo.taskMetrics
    if (m != null) {
      runTimeMs.add(m.executorRunTime)
      taskGcMs.add(m.jvmGCTime)
      shufReadB.add(m.shuffleReadMetrics.totalBytesRead)
      shufWriteB.add(m.shuffleWriteMetrics.bytesWritten)
    }
    stages.add(1)
    tasks.add(e.stageInfo.numTasks.toLong)
  }

  private def gcMsNow: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum

  private def cpuNsNow: Long =
    ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  private def jitMsNow: Long = {
    val c = ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported)
      c.getTotalCompilationTime
    else -1L
  }

  /** (used MB, max MB) summed over the JIT code-heap pools — the
    * round-10 drift postmortem instrument: a 160-entry pack generates
    * enough Janino classes to exhaust the default 240 MB code cache,
    * after which HotSpot stops (or thrashes) JIT compilation and
    * micro-batch-heavy streaming entries run partially interpreted.
    * used ~= max in this column IS the diagnosis. */
  private def codeHeap: (Double, Double) = {
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
    val used = pools.map(_.getUsage.getUsed).sum / 1e6
    val max = pools.map(p => math.max(0L, p.getUsage.getMax)).sum / 1e6
    (used, max)
  }

  /** Counters at a point in time; subtract two marks for a per-entry row. */
  final case class Mark(gcMs: Long, cpuNs: Long, runMs: Long, tGcMs: Long,
                        readB: Long, writeB: Long, nStages: Long,
                        nTasks: Long, jitMs: Long)

  def mark(): Mark = Mark(gcMsNow, cpuNsNow, runTimeMs.sum(), taskGcMs.sum(),
    shufReadB.sum(), shufWriteB.sum(), stages.sum(), tasks.sum(), jitMsNow)

  /** JSON object of deltas since `m0` plus current 1-min load average. */
  def evidenceJson(m0: Mark, wallSec: Double): String = {
    // listener-bus delivery lag: jobs are done, give events a beat to land
    Thread.sleep(30)
    val m1 = mark()
    val load = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val cpuSec =
      if (m0.cpuNs < 0 || m1.cpuNs < 0) -1.0 else (m1.cpuNs - m0.cpuNs) / 1e9
    // -1 is the "unavailable" sentinel for cpu_sec, cpu_over_wall, and
    // load1m (getSystemLoadAverage returns -1 where unsupported) — it must
    // propagate, not leak into a ratio a consumer would read as measured.
    val cpuOverWall =
      if (cpuSec < 0) -1.0 else if (wallSec > 0) cpuSec / wallSec else 0.0
    f"""{"gc_ms":${m1.gcMs - m0.gcMs},"cpu_sec":$cpuSec%.2f,""" +
      f""""cpu_over_wall":$cpuOverWall%.1f,""" +
      f""""load1m":$load%.1f,"run_ms":${m1.runMs - m0.runMs},""" +
      f""""task_gc_ms":${m1.tGcMs - m0.tGcMs},""" +
      f""""shuffle_read_mb":${(m1.readB - m0.readB) / 1e6}%.1f,""" +
      f""""shuffle_write_mb":${(m1.writeB - m0.writeB) / 1e6}%.1f,""" +
      f""""stages":${m1.nStages - m0.nStages},"tasks":${m1.nTasks - m0.nTasks},""" +
      f""""jit_ms":${if (m0.jitMs < 0 || m1.jitMs < 0) -1L
        else m1.jitMs - m0.jitMs},""" +
      f""""code_heap_mb":${codeHeap._1}%.0f,""" +
      f""""code_heap_max_mb":${codeHeap._2}%.0f}"""
  }
}
