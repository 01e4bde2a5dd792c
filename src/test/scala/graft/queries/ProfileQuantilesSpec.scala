package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sketch_quantiles (Sketches.quantiles) + the Profile pack:
  * bucket-math parity with an independent JVM fold, the 1/16 relative
  * error bound against exact percentiles, partitioning invariance
  * (mergeability), profiler exactness, and constraint-rule counts on a
  * doctored table. */
class ProfileQuantilesSpec extends SparkSpec {

  /** Reference log-linear bucket math (independent of the SQL idiom):
    * e = bitlen(x)-1, sub = (x - 2^e) / 2^(e-4) — the shift runs in the
    * overflow-safe direction, like the production expression. */
  private def refBucket(x: Long): (Int, Int) = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val d = x - (1L << e)
    val sub = (if (e >= 4) d >> (e - 4) else d << (4 - e)).toInt
    (e, sub)
  }

  test("log-linear bucket SQL (conv/shift idiom) equals the JVM fold " +
    "over an exhaustive small range plus boundary probes incl. the top " +
    "of the 2^59 domain") {
    import spark.implicits._
    val probes = (1L to 4096L) ++
      Seq(1L << 20, (1L << 20) - 1, (1L << 20) + 1, (1L << 40),
        (1L << 40) + (1L << 36), Long.MaxValue / 16,
        // the naive (x-2^e)*16 form overflowed from e=60 up; the domain
        // ceiling (lo16 fits signed 64-bit) is x < 2^59
        (1L << 58), (1L << 59) - 1)
    val got = Sketches.withHistBuckets(probes.toDF("x"))
      .select("x", "e", "sub").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    probes.foreach { x =>
      assert(got(x) == refBucket(x), s"x=$x")
      val (e, sub) = refBucket(x)
      assert(sub >= 0 && sub < 16, s"sub out of range at x=$x")
      assert((16L + sub) << e > 0, s"lo16 overflow at x=$x")
    }
  }

  test("sketch_quantiles: every reported bucket contains the exact " +
    "discrete percentile (relative error <= 1/16 by construction)") {
    val rows = Sketches.quantiles(spark, sf).collect()
    assert(rows.length == 15) // 5 langs x 3 quantiles
    // exact per-lang sorted lengths
    val exact = graft.Tables.documents(spark, sf)
      .where(col("n_chars") >= 1)
      .select("lang", "n_chars").collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(1)).sorted }
    rows.foreach { r =>
      val (lang, q, e, sub, lo16) =
        (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
      val xs = exact(lang)
      val needed = (q.toLong * xs.length + 99) / 100
      val xStar = xs((needed - 1).toInt) // rank-needed order statistic
      val hi16 = lo16 + (1L << e) // bucket upper bound in 16ths
      assert(16 * xStar >= lo16 && 16 * xStar < hi16,
        s"$lang q$q: x*=$xStar not in [$lo16, $hi16)/16")
    }
  }

  test("sketch_quantiles is invariant to input partitioning (the " +
    "histogram is mergeable)") {
    // Same rows written as 1 file vs 7 files: the per-task partial
    // histograms must merge to the identical quantile picks.
    val docs = graft.Tables.documents(spark, sf)
    val t1 = java.nio.file.Files.createTempDirectory("graft_q1_").toString
    val t7 = java.nio.file.Files.createTempDirectory("graft_q7_").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$t1/documents.parquet")
    docs.repartition(7).write.mode("overwrite")
      .parquet(s"$t7/documents.parquet")
    val a = Sketches.quantiles(spark, t1).collect().toSeq
    val b = Sketches.quantiles(spark, t7).collect().toSeq
    assert(a == b)
    assert(a == Sketches.quantiles(spark, sf).collect().toSeq)
  }

  test("sketch_hist_build/serve: committed cells reload identically and " +
    "the '*' rollup equals the direct corpus-wide pick (counts add)") {
    import graft.sinks.ArtifactStore
    val key = Sketches.histKey(spark, sf)
    ArtifactStore.remove(spark, key)
    val built = Sketches.histBuild(spark, sf).collect().toSeq
    assert(ArtifactStore.exists(spark, key))
    assert(ArtifactStore.load(spark, key)
      .collect().toSeq.map(_.toString).sorted ==
      built.map(_.toString).sorted)
    val serve = Sketches.histServe(spark, sf)
    val star = serve.where(col("lang") === "*").collect()
      .map(r => r.getInt(1) -> ((r.getInt(2), r.getInt(3)))).toMap
    // direct corpus-wide pick, bypassing the artifact entirely
    val direct = Sketches.histQuantilePick(
      Sketches.withHistBuckets(
        graft.Tables.documents(spark, sf)
          .where(col("n_chars") >= 1)
          .select(lit("*").as("lang"), col("n_chars").as("x")))
        .groupBy("lang", "e", "sub").agg(count(lit(1)).as("c")),
      Seq("lang"), Seq(50, 90, 99)).collect()
      .map(r => r.getInt(1) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(star == direct, s"rollup $star != direct $direct")
  }

  test("profile_table: exact fields match direct computation; distinct " +
    "estimate lands within the HLL bound for every column") {
    val prof = Profile.profileTable(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val docs = graft.Tables.documents(spark, sf)
    prof.foreach { case (c, r) =>
      val (nulls, minLen, maxLen, estMicro) =
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(9))
      val direct = docs.select(
        sum(when(col(c).isNull, 1L).otherwise(0L)),
        min(length(col(c).cast("string"))),
        max(length(col(c).cast("string"))),
        countDistinct(col(c))).head()
      assert(nulls == direct.getLong(0), s"$c nulls")
      assert(minLen == direct.getInt(1), s"$c min_len")
      assert(maxLen == direct.getInt(2), s"$c max_len")
      val exact = direct.getLong(3).toDouble
      val est = estMicro / 1e6
      assert(math.abs(est - exact) / exact < 0.165,
        s"$c est=$est exact=$exact")
    }
    // value-domain stats: exact min/max/sum on the BIGINT columns,
    // NULL on the string columns
    Seq("doc_id", "n_chars").foreach { c =>
      val r = prof(c)
      val direct = docs.select(min(col(c)), max(col(c)),
        sum(col(c))).head()
      assert(r.getLong(4) == direct.getLong(0), s"$c min_val")
      assert(r.getLong(5) == direct.getLong(1), s"$c max_val")
      if (c == "doc_id") // identifier sums: meaningless + overflow-prone
        assert(r.isNullAt(6), s"$c sum_val must be NULL")
      else assert(r.getLong(6) == direct.getLong(2), s"$c sum_val")
    }
    Seq("text", "lang", "source").foreach { c =>
      assert(prof(c).isNullAt(4) && prof(c).isNullAt(5) &&
        prof(c).isNullAt(6), s"$c value stats must be NULL")
    }
  }

  test("profile_table_events: canonicalized columns profile exactly " +
    "(epoch-micros timestamps, micro-fixed-point doubles)") {
    val prof = Profile.profileTableEvents(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("event_id", "event_type", "props",
      "ts_us", "user_id", "value_micro"))
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("props"),
        expr("unix_micros(ts)").as("ts_us"), col("user_id"),
        expr("CAST(round(value * 1000000e0) AS BIGINT)")
          .as("value_micro"))
    Seq("event_id", "ts_us", "user_id", "value_micro").foreach { c =>
      val r = prof(c)
      val direct = ev.select(min(col(c)), max(col(c)), sum(col(c)),
        sum(when(col(c).isNull, 1L).otherwise(0L)),
        countDistinct(col(c))).head()
      assert(r.getLong(4) == direct.getLong(0), s"$c min_val")
      assert(r.getLong(5) == direct.getLong(1), s"$c max_val")
      if (c == "value_micro") // the one meaningful, int64-safe sum
        assert(r.getLong(6) == direct.getLong(2), s"$c sum_val")
      else // ids + epoch micros: overflow-prone, min/max only
        assert(r.isNullAt(6), s"$c sum_val must be NULL")
      assert(r.getLong(1) == direct.getLong(3), s"$c nulls")
      val exact = direct.getLong(4).toDouble
      assert(math.abs(r.getLong(9) / 1e6 - exact) / exact < 0.165,
        s"$c distinct est vs $exact")
    }
    Seq("event_type", "props").foreach { c =>
      assert(prof(c).isNullAt(4) && prof(c).isNullAt(5) &&
        prof(c).isNullAt(6), s"$c value stats must be NULL")
    }
  }

  test("u_stream_hll emits a finalized window whose events are ALL " +
    "null-keyed — empty registers, est 0 (the oracle's LEFT JOIN row)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_shll_").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:20:00")
    val late = java.sql.Timestamp.valueOf("2024-01-01 03:00:00")
    // window [00:00,01:00): only null user_ids; the 03:00 event advances
    // the watermark past its end so it finalizes
    // the stream source globs on the FILE name (the driver's layout is
    // one file per table), so write a directory then promote the single
    // part file to <tmp>/events.parquet
    Seq((1L, t0, null.asInstanceOf[java.lang.Long], "click", 1.0, "{}"),
      (2L, t1, null.asInstanceOf[java.lang.Long], "view", 2.0, "{}"),
      (3L, late, java.lang.Long.valueOf(7L), "click", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/ev_dir")
    val part = new java.io.File(s"$tmp/ev_dir").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$tmp/events.parquet"))
    val rows = UdLang.uStreamHll(spark, tmp).collect()
    assert(rows.length == 1, s"expected the one finalized window, got " +
      rows.map(_.toString).mkString(", "))
    val r = rows.head
    assert(r.getLong(1) == 1024L, "v_zero of the all-null window")
    assert(r.getLong(2) == 1024L * (1L << 43), "s_scaled")
    assert(r.getLong(3) == 0L, "est_micro")
  }

  test("profile_checks: zero violations on the fixture; exact named " +
    "counts on a doctored table") {
    import spark.implicits._
    val clean = Profile.profileChecks(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.values.forall(_ == 0L), s"fixture not clean: $clean")

    // doctored copy: 2 extra rows under one key (dup=2), one null lang
    // (null_required=1), one n_chars off by one (mismatch=1), one empty
    // text (empty+mismatch... keep disjoint: empty text with n_chars=0
    // consistent), one unknown lang.
    val tmp = java.nio.file.Files.createTempDirectory("graft_profile_")
      .toString
    val doctored = Seq(
      (1L, "alpha beta", "en", "web", 10L),
      (1L, "alpha beta", "en", "web", 10L), // dup of key 1
      (1L, "alpha beta", "en", "web", 10L), // dup of key 1
      (2L, "hello", null.asInstanceOf[String], "web", 5L), // null lang
      (3L, "hello", "en", "web", 99L), // n_chars mismatch
      (4L, "", "en", "web", 0L), // empty text
      (5L, "bonjour", "xx", "web", 7L)) // unknown lang
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    doctored.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val checked = Profile.profileChecks(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checked == Map(
      "dup_doc_id" -> 2L, "empty_text" -> 1L, "n_chars_mismatch" -> 1L,
      "null_required" -> 1L, "unknown_lang" -> 1L), s"got $checked")
  }
}
