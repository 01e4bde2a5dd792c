package graft

import org.apache.spark.sql.functions._

/** 100x STREAMING probe: `u_stream_session`'s dataflow (5-minute
  * session windows, 10-minute watermark, append mode) at 100x event
  * volume on the RocksDB state-store provider, run as a SLICED file
  * stream so the quantities a cluster operator actually watches are
  * observable per micro-batch: input rows, trigger latency, state rows,
  * state memory, RocksDB SST bytes on disk, and watermark lag.
  *
  * The sf0.1 entry runs the same plan as a single-batch file stream —
  * correct for the oracle, but it exercises neither state-store growth
  * nor watermark-driven eviction across batches. This probe generates
  * the tier once (the sf0.1 events replicated with namespaced user ids
  * — 10M rows, 150k users — written as ~40 time-ordered slices), then
  * streams them a few files per trigger, so sessions accumulate, close,
  * and EVICT as the watermark passes: end-state rows far below peak is
  * the eviction evidence.
  *
  * SPARK_GRAFT_STREAM_MODE selects the state profile (round-11 ask):
  *  - "session" (default): u_stream_session's session windows — state is
  *    the open sessions of the watermark horizon (many rows per user,
  *    closed by gap + watermark);
  *  - "dedup": u_stream_dedup's dropDuplicatesWithinWatermark on
  *    (user_id, event_type) — ONE state row per distinct key, eviction
  *    purely watermark-driven, emission only on first occurrence: the
  *    other canonical streaming state shape.
  *
  * Prints one JSON line per micro-batch and one summary line. Knobs:
  * SPARK_GRAFT_STREAM_REPS (default 100), SPARK_GRAFT_STATE_PARTITIONS
  * (default 32), SPARK_GRAFT_CPUS. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tierDir = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIR",
      "/root/repo/benchdata/stream100x")
    val slices = 40
    val reps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val statePartitions =
      sys.env.getOrElse("SPARK_GRAFT_STATE_PARTITIONS", "32").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "session")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- tier generation (idempotent): user-namespaced replication,
    // written slice-by-slice in ts order so the file source's
    // oldest-first pickup replays event time monotonically and the
    // watermark advances across batches
    val lastSlice = new java.io.File(tierDir, f"slice_${slices - 1}%02d")
    if (!lastSlice.exists()) {
      val base = Tables.events(spark, src).select("ts", "user_id", "value")
      val userStride = 10000000L
      val reps0 = spark.range(reps.toLong).toDF("rep")
      val big = base.crossJoin(broadcast(reps0))
        .select(col("ts"),
          (col("user_id") + col("rep") * userStride).as("user_id"),
          col("value"))
      val bounds = base.agg(min("ts").as("mn"), max("ts").as("mx")).head()
      val mn = bounds.getTimestamp(0).getTime
      val mx = bounds.getTimestamp(1).getTime
      val span = math.max(1L, mx - mn + 1)
      val sliced = big.withColumn("slice",
        least(lit(slices - 1), floor(
          (unix_millis(col("ts")) - lit(mn)) * slices / lit(span))
          .cast("int"))).persist()
      sliced.count()
      (0 until slices).foreach { i =>
        sliced.where(col("slice") === i).drop("slice")
          .coalesce(2)
          .write.mode("overwrite").parquet(f"$tierDir/slice_$i%02d")
      }
      sliced.unpersist()
    }

    // ---- the selected u_stream_* dataflow at tier scale
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val schema = spark.read.parquet(s"$tierDir/slice_00").schema
    val source = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(s"$tierDir/slice_*")
      .withWatermark("ts", "10 minutes")
    val stream = mode match {
      case "session" =>
        source
          .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
          .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      case "dedup" =>
        // the tier has no event_type column; derive a deterministic
        // 4-way type from value so the key shape matches u_stream_dedup
        source
          .withColumn("event_type", pmod(col("value"), lit(4)).cast("int"))
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select("user_id", "event_type")
      case other => throw new IllegalArgumentException(
        s"SPARK_GRAFT_STREAM_MODE=$other (want session|dedup)")
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_probe_ckpt").toString
    val t0 = System.nanoTime()
    val q = stream.writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    q.stop()
    var peakRows = 0L
    var peakMem = 0L
    var peakSst = 0L
    var lastRows = 0L
    var inputRows = 0L
    progress.foreach { p =>
      val so = p.stateOperators.headOption
      val rows = so.map(_.numRowsTotal).getOrElse(0L)
      val mem = so.map(_.memoryUsedBytes).getOrElse(0L)
      val sst = so.flatMap(s => Option(s.customMetrics)
        .map(m => Option(m.get("rocksdbSstFileSize")).map(_.longValue)
          .getOrElse(0L))).getOrElse(0L)
      val trig = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      val wmLagMs: Long = (for {
        et <- Option(p.eventTime)
        wm <- Option(et.get("watermark"))
        mx <- Option(et.get("max"))
      } yield java.time.Instant.parse(mx).toEpochMilli -
        java.time.Instant.parse(wm).toEpochMilli).getOrElse(-1L)
      peakRows = math.max(peakRows, rows)
      peakMem = math.max(peakMem, mem)
      peakSst = math.max(peakSst, sst)
      lastRows = rows
      inputRows += p.numInputRows
      println(s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""trigger_ms":$trig,"state_rows":$rows,"state_mem_mb":""" +
        f"${mem / 1e6}%.1f" +
        s""","sst_mb":${f"${sst / 1e6}%.1f"},"wm_lag_ms":$wmLagMs}""")
    }
    println(f"""{"metric":"stream_probe_100x_$mode%s","wall_sec":$wall%.1f,""" +
      s""""batches":${progress.size},"input_rows":$inputRows,""" +
      s""""peak_state_rows":$peakRows,""" +
      f""""peak_state_mem_mb":${peakMem / 1e6}%.1f,""" +
      f""""peak_sst_mb":${peakSst / 1e6}%.1f,""" +
      s""""end_state_rows":$lastRows,""" +
      s""""state_partitions":$statePartitions}""")
    spark.stop()
  }
}
