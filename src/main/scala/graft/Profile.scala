package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Local profiling harness: runs ONE SparkEntry query and prints a
  * stage-by-stage breakdown (run/cpu/gc time, shuffle bytes, task count).
  * This is how the round-7 q_pagerank cut was found — per-stage evidence
  * (`sbt "runMain graft.Profile q_pagerank"`) instead of blind rewrites.
  * Note: fresh JVM, no Bench warm-up — absolute numbers include cold
  * codegen/parquet costs; compare stages against each other, or use
  * `SPARK_GRAFT_BENCH_ONLY` with graft.Bench for warm wall times. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q_pagerank")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=${wall}%6dms " +
          f"run=${m.executorRunTime}%7dms gc=${m.jvmGCTime}%6dms " +
          f"cpu=${m.executorCpuTime / 1000000}%7dms " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1000000}%5dMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1000000}%5dMB  " +
          si.name.take(60))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(200)
    spark.stop()
  }
}
