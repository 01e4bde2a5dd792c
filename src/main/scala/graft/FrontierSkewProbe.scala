package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Skew evidence for the crawl frontier's two-level prefix rank
  * (round-13 verdict ask #1's "done" bar): rank a POWER-LAW frontier —
  * one mega-host holding ~95% of the urls, far past the ≥50% bar — at
  * the 100×-crawl scale, and print per-stage task-balance evidence. The
  * old `row_number() OVER (PARTITION BY host)` put the mega-host's
  * whole queue into ONE window task (stage wall == that task's wall);
  * the range-partitioned two-level rank must show every wide stage's
  * max task at a small multiple of the median.
  *
  * Evidence-printing only: per-task durations come off the listener
  * bus, which is BEST-EFFORT (events can drop under bus pressure), so
  * a stage's task histogram may undercount — stage wall/shuffle totals
  * come from the stage-completed event and stay authoritative.
  *
  * Usage: tools/run_class.sh graft.FrontierSkewProbe [nMega]
  */
object FrontierSkewProbe {
  def main(args: Array[String]): Unit = {
    val nMega = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-stage max/median task durations (the skew signature)
    val durs = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        durs.getOrElseUpdate(e.stageId,
          scala.collection.mutable.ArrayBuffer.empty) += e.taskInfo.duration
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val d = synchronized(durs.getOrElse(si.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]).toArray.sorted)
        if (d.nonEmpty) {
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%5d " +
            f"wall=${wall}%7dms maxTask=${d.last}%7dms " +
            f"medTask=${(d((d.length - 1) / 2) + d(d.length / 2)) / 2}%7dms " +
            f"sr=${si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1000000}%5dMB " +
            si.name.take(50))
        }
      }
    })

    // power-law frontier: mega-host ~95%, six small hosts for restarts
    val mega = spark.range(nMega).select(
      lit("big.example.com").as("host"),
      concat(lit("http://big.example.com/"),
        format_string("%04x", (col("id") % 4096).cast("int")),
        lit("/p"), format_string("%09d", col("id"))).as("url"),
      (col("id") % 17 + 1).as("n_refs"))
    val small = spark.range(nMega / 20).select(
      concat(lit("s"), (col("id") % 6).cast("string"),
        lit(".example.com")).as("host"),
      concat(lit("http://s"), (col("id") % 6).cast("string"),
        lit(".example.com/page"), col("id").cast("string")).as("url"),
      (col("id") % 5 + 1).as("n_refs"))
    val fr = mega.unionAll(small).repartition(cpus)

    val t0 = System.nanoTime()
    // `window` mode = the replaced per-host row_number form, for the
    // before/after row (the mega-host sorts in ONE task there)
    val ranked = if (args.length > 1 && args(1) == "window")
      fr.withColumn("fetch_order", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("host")
            .orderBy(col("n_refs").desc, col("url"))).cast("int"))
        .select("host", "fetch_order", "url", "n_refs")
    else graft.queries.CorpusBuild.frontierRank(fr)
    val n = ranked.queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    // spot-pin the order contract at this scale: top of the mega queue
    val top = ranked.where(col("host") === "big.example.com")
      .orderBy("fetch_order").limit(3).collect()
      .map(r => s"${r.getAs[Int]("fetch_order")}:${r.getAs[String]("url")}")
    println(f"RANKED $n%d rows in $wall%.1fs; mega head: ${top.mkString(" ")}")
    spark.stop()
  }
}
