package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Durable-checkpoint restart contract for the CUSTOM sketch aggregates
  * running inside streaming state (round-14 ask #2): every entry-level
  * stream runs in-memory with `processAllAvailable` in one JVM, so
  * nothing there pins that a query checkpointed to durable storage
  * restores the TypedImperativeAggregate buffers (HLL registers, KMV
  * heaps, CMS counters are each a custom binary serialization in the
  * state store) across a stop/restart — the contract a production
  * stream actually depends on.
  *
  * Shape: file source → watermarked 1-hour window aggregation carrying
  * all three sketch aggregates → parquet sink (exactly-once recovery),
  * checkpointed to a durable location. Phase 1 processes a file whose
  * clock event finalizes hours 0-1 but leaves hour 3 PARTIAL in the
  * state store; the query stops; a second file appends more hour-3
  * users plus a clock that closes it; a NEW query instance restarts
  * from the checkpoint. The hour-3 row is then computable only by
  * merging the RESTORED buffers with the new rows — its registers must
  * equal an uninterrupted run over both files. Run for both state-store
  * providers (HDFS-backed and RocksDB).
  */
class StreamRestartSpec extends SparkSpec {

  private val h52 =
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 13), 16, 10)" +
      " AS BIGINT)"
  private def cmsHash(r: Int): String =
    s"CAST(conv(substr(md5(CAST(user_id AS STRING)), ${r * 8 + 1}, 8)," +
      s" 16, 10) AS BIGINT) % 512"

  private def sketchAgg(src: DataFrame): DataFrame = src
    .select(col("ts"), expr(h52).as("h"),
      array((0 until 4).map(r => expr(cmsHash(r))): _*).as("hs"))
    .withWatermark("ts", "10 minutes")
    .groupBy(window(col("ts"), "1 hour"))
    .agg(graft.plans.Sketch.hll(col("h"), 10).as("regs"),
      graft.plans.Sketch.kmv(col("h"), 64).as("kmv"),
      graft.plans.Sketch.cms(col("hs"), lit(1L), 4, 512).as("cms"))
    .select(unix_micros(col("window.start")).as("win_start_us"),
      col("regs"), col("kmv"), col("cms"))

  // explicit UTC instants: Timestamp.valueOf reads the JVM default
  // zone, which spark.sql.session.timeZone=UTC does NOT override — the
  // epoch-hour-aligned window assertions below would fail spuriously
  // under a non-whole-hour-offset JVM zone (round-14 ADVICE)
  private def ts(hhmm: String) = java.sql.Timestamp.from(
    java.time.Instant.parse(s"2024-01-01T$hhmm:00Z"))

  /** file 1: hours 0 and 1 complete, hour 3 PARTIAL (users 100-119),
    * clock at 03:30 → watermark 03:20 finalizes hours 0-1 only. */
  private def file1(dir: String): Unit = writeEvents(dir, "f1",
    (1L to 40L).map(u => (ts("00:15"), u)) ++
      (41L to 80L).map(u => (ts("01:15"), u)) ++
      (100L to 119L).map(u => (ts("03:10"), u)) :+ ((ts("03:30"), 999L)))

  /** file 2: forty MORE hour-3 users (the restored buffers must merge
    * with them) and a clock at 06:00 that closes hour 3. */
  private def file2(dir: String): Unit = writeEvents(dir, "f2",
    (121L to 160L).map(u => (ts("03:40"), u)) :+ ((ts("06:00"), 998L)))

  private def writeEvents(dir: String, name: String,
      rows: Seq[(java.sql.Timestamp, Long)]): Unit = {
    import spark.implicits._
    // one atomic file per append (write to the side, then move in),
    // mirroring how a log shipper lands files in a watched directory
    val tmp = s"$dir/.stage_$name"
    rows.toDF("ts", "user_id").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/$name.parquet"))
  }

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType)))

  private def runPhase(srcDir: String, outDir: String, cpDir: String)
      : Unit = {
    val q = sketchAgg(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", cpDir)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
  }

  private def canon(outDir: String): Seq[(Long, Seq[Any], Seq[Any],
      Seq[Any])] =
    spark.read.parquet(outDir)
      .orderBy("win_start_us").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Any](1), r.getSeq[Any](2),
        r.getSeq[Any](3)))

  private def restartScenario(provider: Option[String]): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_restart_").toString
    val (srcA, outA, cpA) = (s"$root/srcA", s"$root/outA", s"$root/cpA")
    val (srcU, outU, cpU) = (s"$root/srcU", s"$root/outU", s"$root/cpU")
    Seq(srcA, srcU).foreach(d => new java.io.File(d).mkdirs())
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    provider.foreach(spark.conf.set(key, _))
    try {
      // interrupted run: file1 → stop → file2 → NEW query, same durable
      // checkpoint
      file1(srcA)
      runPhase(srcA, outA, cpA)
      val afterPhase1 = canon(outA)
      assert(afterPhase1.map(_._1) ==
        Seq(ts("00:00"), ts("01:00")).map(t => t.getTime * 1000L),
        s"phase 1 must finalize exactly hours 0-1, got " +
          afterPhase1.map(_._1))
      file2(srcA)
      runPhase(srcA, outA, cpA)
      // uninterrupted twin: both files present at start, fresh state
      file1(srcU); file2(srcU)
      runPhase(srcU, outU, cpU)
      val (got, want) = (canon(outA), canon(outU))
      assert(got.map(_._1) == want.map(_._1),
        s"window sets differ: ${got.map(_._1)} vs ${want.map(_._1)}")
      got.zip(want).foreach { case (g, w) =>
        assert(g._2 == w._2, s"HLL registers diverged at ${g._1} — " +
          "restored buffers did not merge with post-restart rows")
        assert(g._3 == w._3, s"KMV heap diverged at ${g._1}")
        assert(g._4 == w._4, s"CMS counters diverged at ${g._1}")
      }
      // the merge must actually have happened across the restart: the
      // hour-3 registers cannot equal a file2-only aggregation
      val hour3 = got.find(_._1 == ts("03:00").getTime * 1000L).get
      val file2Only = sketchAgg(
        spark.read.parquet(s"$srcA/f2.parquet")).collect()
        .find(_.getLong(0) == ts("03:00").getTime * 1000L).get
      assert(hour3._2 != file2Only.getSeq[Any](1),
        "hour-3 registers look file2-only — state was lost on restart")
    } finally {
      provider.foreach { _ =>
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }
  }

  test("sketch aggregation state (HLL/KMV/CMS buffers) survives a " +
    "durable-checkpoint restart — default HDFS-backed provider") {
    restartScenario(None)
  }

  test("sketch aggregation state survives a durable-checkpoint restart " +
    "— RocksDB state store provider") {
    restartScenario(Some("org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider"))
  }

  /** The OTHER custom-state surface: transformWithState's typed
    * ValueState (u_stream_state's RunningCountProcessor). A restarted
    * query must resume each key's running (count, sum) from the
    * restored handle — keys with post-restart rows continue from their
    * pre-restart totals, keys without keep their last emission. Values
    * are dyadic rationals so double sums are exact and
    * order-independent. */
  test("transformWithState ValueState survives a durable-checkpoint " +
    "restart (RocksDB, the operator's required provider)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_tws_restart_").toString
    val (src, out, cp) = (s"$root/src", s"$root/out", s"$root/cp")
    new java.io.File(src).mkdirs()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    def writeRows(name: String, rows: Seq[(Long, Double)]): Unit = {
      val tmp = s"$src/.stage_$name"
      rows.toDF("user_id", "value").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$src/$name.parquet"))
    }
    def runPhase(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType)))
      val ds = spark.readStream.schema(schema).parquet(src)
        .as[(Long, Double)]
      val q = graft.streaming.StreamKernel.statefulCountTws(ds)
        .toDF("user_id", "n", "sum_value")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      // phase 1: users 1-10 x3 rows, user 11 x3 (no phase-2 rows)
      writeRows("f1", (1L to 11L).flatMap(u =>
        Seq.fill(3)((u, 0.25 * u))))
      runPhase()
      // phase 2, NEW query from the same checkpoint: users 1-10 x2
      // (must continue from n=3), user 12 x2 (fresh key)
      writeRows("f2", ((1L to 10L) :+ 12L).flatMap(u =>
        Seq.fill(2)((u, 0.25 * u))))
      runPhase()
      val last = spark.read.parquet(out)
        .orderBy("user_id", "n").collect()
        .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.last }
      (1L to 12L).foreach { u =>
        val (wantN, wantSum) =
          if (u <= 10L) (5L, 0.25 * u * 5)
          else if (u == 11L) (3L, 0.25 * u * 3)
          else (2L, 0.25 * u * 2)
        val r = last(u)
        assert(r.getLong(1) == wantN,
          s"user $u: n=${r.getLong(1)}, want $wantN — ValueState lost " +
            "across restart")
        assert(r.getDouble(2) == wantSum, s"user $u sum")
      }
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
