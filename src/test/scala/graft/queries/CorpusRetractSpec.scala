package graft.queries

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** corpus_build_retract (round-15 ask #3): takedown of a doc slice —
  * including exact KEEPERS — must re-elect survivors from the committed
  * stages and equal a full rebuild over the reduced corpus under the
  * FROZEN (pre-takedown) stop set.
  *
  *  1. A SYNTHETIC corpus pins every re-election branch individually,
  *     each branch deliberately constructed so the naive "just filter
  *     the survivor list" answer is WRONG:
  *       - keeper takedown → the min remaining digest-group member is
  *         elected (order-reversed twin: same digest, disjoint shingles)
  *       - the new keeper REMOVES a larger-id near-dup that was clean
  *         before (the old keeper's shingles didn't match it)
  *       - a new keeper is itself removed by a SMALLER-id survivor
  *       - a doc whose only verified partner was taken down RESURRECTS
  *       - plain removal of an uninvolved doc
  *  2. On the real fixture, retractFrames equals an INDEPENDENT
  *     reduced-corpus rebuild (global windows + LSH self-join — a
  *     different join structure from the entry's committed-probe
  *     composition; the DuckDB oracle replays it a third way).
  */
class CorpusRetractSpec extends SparkSpec {

  private def typed(df: DataFrame) = {
    import spark.implicits._
    df.select(col("doc_id"), col("norm_text")).as[(Long, String)]
  }

  /** Build an IncrBase from a norm frame the way incrBase does, minus
    * the artifact commits (in-memory twin — the algebra under test is
    * retractFrames, not the store). */
  private def mkBase(norm: DataFrame): CorpusBuild.IncrBase = {
    val s = spark
    val qB = CorpusBuild.withQuality(norm)
      .where(col("quality") >= 0.2)
    val exactB = qB
      .select(col("doc_id"), CorpusBuild.digestCol.as("digest"))
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy("digest")))
      .select("doc_id", "digest", "keep_id")
    val surv = qB.join(
      exactB.where(col("doc_id") === col("keep_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val stopSet = Dedup.stopShingles(typed(surv), 3, surv.count())
    val bc = s.sparkContext.broadcast(stopSet)
    val bands = Dedup.bandedKeys(
      Dedup.stopFilteredSigs(typed(surv), bc, 3, 64), 32, 2)
    val l = bands.select(col("doc_id").as("a"), col("band"), col("key"))
    val r = bands.select(col("doc_id").as("b"), col("band"), col("key"))
    val cand = l.join(r, Seq("band", "key"))
      .where(col("a") < col("b")).select("a", "b").distinct()
    val pairs = Dedup.verifyStopFiltered(cand,
        surv.select(col("doc_id"), col("norm_text").as("text")),
        bc, 3, 0.8)
      .select("a", "b")
    CorpusBuild.IncrBase(Long.MaxValue, norm, qB, exactB, bc, bands,
      pairs, surv.select("doc_id", "n_norm"))
  }

  private def normRow(id: Long, text: String)
      : (Long, String, Long, Long, Long, Long) = {
    val stop = Set("the", "a", "and", "of", "to", "is", "in")
    val toks = text.split("\\s+")
    (id, text, toks.length.toLong, toks.length.toLong,
      toks.map(_.length.toLong).sum, toks.count(stop).toLong)
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("synthetic takedown: keeper re-election, new-keeper removals in " +
    "both orientations, resurrection, plain removal") {
    import spark.implicits._
    val s = spark
    // shared 5-token prefix: its internal shingles hit every doc
    // (df = N > N/2) and land in the stop set, so only CONTENT shingles
    // count toward near-dup — the e2e chain's template-text shape
    val P = "is in of to is"
    def seq(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d")
    val cA = seq("a", 20); val cB = seq("b", 20)
    val cR = seq("r", 20); val cU = seq("u", 20); val cV = seq("v", 20)
    def t(c: Seq[String], extra: String = "") =
      (P +: c).mkString(" ") + (if (extra.isEmpty) "" else s" $extra")
    val norm = Seq(
      // group A: keeper 10 (REMOVED) is the order-REVERSED twin of 23 —
      // same digest (digests ignore order), disjoint content shingles.
      // 30 near-matches 23 but NOT 10, so before takedown 30 is clean;
      // after, the elected 23 must remove it.
      normRow(10L, t(cA.reverse)),
      normRow(23L, t(cA)),
      normRow(30L, t(cA, "xa1")),
      // group B: same construction, but the near-twin 40 has the
      // SMALLER id — the elected keeper 45 must itself be removed
      normRow(40L, t(cB, "xb1")),
      normRow(41L, t(cB.reverse)), // keeper, REMOVED
      normRow(45L, t(cB)),
      // resurrection: 51's only verified partner is 50 (REMOVED)
      normRow(50L, t(cR)), // REMOVED
      normRow(51L, t(cR, "xr1")),
      // plain removal + ballast
      normRow(60L, t(cU)), // REMOVED, uninvolved
      normRow(71L, t(cV))
    ).toDF("doc_id", "norm_text", "n_raw", "n_norm", "sum_len", "n_stop")
      .localCheckpoint(true)
    val base = mkBase(norm)
    // pre-takedown sanity: the constructed world is what the comments
    // claim — 10/41/50 are keepers, 23/45 suppressed, only (50,51)
    // verified, 30/40 clean
    assert(ids(base.survNB) == Set(10L, 30L, 40L, 41L, 50L, 51L, 60L, 71L))
    assert(base.pairsB.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((50L, 51L)))
    val rmSet = Set(10L, 41L, 50L, 60L)
    val rm = (c: org.apache.spark.sql.Column) =>
      c.isin(rmSet.toSeq.map(java.lang.Long.valueOf): _*)
    val (normA, qA, exactN, nearN) =
      CorpusBuild.retractFrames(s, base, rm)
    assert(ids(normA) == Set(23L, 30L, 40L, 45L, 51L, 71L))
    assert(ids(qA) == ids(normA))
    // re-election: 23 and 45 take over their digest groups
    assert(ids(exactN) == Set(23L, 30L, 40L, 45L, 51L, 71L),
      s"exact survivors wrong: ${ids(exactN)}")
    // near re-election: 30 newly removed by elected 23; 45 removed by
    // smaller-id survivor 40; 51 resurrected (partner 50 gone)
    assert(ids(nearN) == Set(23L, 40L, 51L, 71L),
      s"near survivors wrong: ${ids(nearN)}")
    // cross-check the whole thing against an independent reduced
    // rebuild under the FROZEN stop set
    val normR = norm.where(!rm(col("doc_id")))
    val qR = CorpusBuild.withQuality(normR).where(col("quality") >= 0.2)
    val exactR = qR
      .withColumn("digest", CorpusBuild.digestCol)
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy("digest")))
      .where(col("doc_id") === col("keep_id"))
    val sigsR = Dedup.stopFilteredSigs(typed(exactR), base.bc, 3, 64)
    val badR = Dedup.verifyStopFiltered(Dedup.lshCandidates(sigsR, 32, 2),
        exactR.select(col("doc_id"), col("norm_text").as("text")),
        base.bc, 3, 0.8)
      .select(col("b").as("doc_id")).distinct()
    assert(ids(exactN) == ids(exactR))
    assert(ids(nearN) == ids(exactR.join(badR, Seq("doc_id"), "left_anti")))
  }

  test("retract-then-append: the delta probes the POST-takedown " +
    "surfaces — the stale committed digests/bands give the WRONG " +
    "answer on both") {
    import spark.implicits._
    val s = spark
    val P = "is in of to is"
    def seq(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d")
    val cA = seq("a", 20); val cU = seq("u", 20)
    val cV = seq("v", 20); val cZ = seq("z", 20)
    def t(c: Seq[String], extra: String = "") =
      (P +: c).mkString(" ") + (if (extra.isEmpty) "" else s" $extra")
    val norm = Seq(
      // group A: keeper 10 is the order-reversed twin of 23 — removed,
      // so 23 re-elects; 23's bands exist ONLY post-takedown (it was
      // never an exact survivor before)
      normRow(10L, t(cA.reverse)), // REMOVED keeper
      normRow(23L, t(cA)), // re-elected
      normRow(60L, t(cU)), // REMOVED singleton — its digest must lapse
      normRow(71L, t(cV)) // alive ballast
    ).toDF("doc_id", "norm_text", "n_raw", "n_norm", "sum_len", "n_stop")
      .localCheckpoint(true)
    val base = mkBase(norm)
    val rmSet = Set(10L, 60L)
    val rm = (c: org.apache.spark.sql.Column) =>
      c.isin(rmSet.toSeq.map(java.lang.Long.valueOf): _*)
    val st = CorpusBuild.retractState(s, base, rm)
    val deltaNorm = Seq(
      // same CONTENT as the removed singleton 60: the digest lapsed,
      // so this doc must SURVIVE — probing the stale committed digest
      // list wrongly suppresses it
      normRow(101L, t(cU)),
      // near-dup of the RE-ELECTED keeper 23 (and only it): the stale
      // band table carries 10's reversed shingles, which never match
      normRow(102L, t(cA, "xa1")),
      normRow(111L, t(cZ)) // fresh content, survives everything
    ).toDF("doc_id", "norm_text", "n_raw", "n_norm", "sum_len", "n_stop")
      .localCheckpoint(true)
    val fresh = CorpusBuild.deltaPassNorm(s, deltaNorm,
      st.aliveDigests, st.aliveBands, st.aliveTexts, base.bc)
    assert(ids(fresh.survTxt) == Set(101L, 102L, 111L),
      s"exact survivors vs post-takedown digests: ${ids(fresh.survTxt)}")
    assert(ids(fresh.bad) == Set(102L),
      s"the re-elected keeper must near-remove 102: ${ids(fresh.bad)}")
    // the composed report path: only 101 and 111 join the survivors
    val nearD = fresh.survTxt.join(fresh.bad, Seq("doc_id"), "left_anti")
    assert(ids(nearD) == Set(101L, 111L))
    // the STALE probes (pre-takedown committed surfaces) are wrong on
    // both counts — the case corpus_build_retract_incr exists to avoid
    val stale = CorpusBuild.deltaPassNorm(s, deltaNorm,
      base.exactB.select("digest"), base.bandsB,
      base.normB.select(col("doc_id"), col("norm_text").as("text")),
      base.bc)
    assert(!ids(stale.survTxt).contains(101L),
      "stale digest list failed to suppress — fixture broken")
    assert(!ids(stale.bad).contains(102L),
      "stale band table caught 102 — fixture broken")
  }

  test("real fixture: retractFrames equals the frozen-stop reduced " +
    "rebuild (independent global-mining reference)") {
    import spark.implicits._
    val s = spark
    val mx = graft.Tables.documents(s, sf)
      .agg(max(col("doc_id"))).head().getLong(0) + 1
    val base = CorpusBuild.incrBase(s, sf, mx)
    val rm = (c: org.apache.spark.sql.Column) => c % 13 === 5
    val (normA, qA, exactN, nearN) =
      CorpusBuild.retractFrames(s, base, rm)
    val got = CorpusBuild
      .chainReport(normA, qA, exactN, nearN, CorpusBuild.shardAsg(s, nearN))
      .collect().toSeq
    // independent reference: full reduced rebuild, stop set mined over
    // the ORIGINAL corpus (the frozen trained parameter)
    val norm = CorpusBuild.normFrame(s, graft.Tables.documents(s, sf))
      .localCheckpoint(true)
    val qF = CorpusBuild.withQuality(norm).where(col("quality") >= 0.2)
    val exactF = qF
      .withColumn("digest", CorpusBuild.digestCol)
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy("digest")))
      .where(col("doc_id") === col("keep_id"))
    val stopSet = Dedup.stopShingles(typed(exactF), 3, exactF.count())
    val bc = s.sparkContext.broadcast(stopSet)
    val normR = norm.where(!rm(col("doc_id")))
    val qR = CorpusBuild.withQuality(normR).where(col("quality") >= 0.2)
    val exactR = qR
      .withColumn("digest", CorpusBuild.digestCol)
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy("digest")))
      .where(col("doc_id") === col("keep_id"))
    val sigsR = Dedup.stopFilteredSigs(typed(exactR), bc, 3, 64)
    val badR = Dedup.verifyStopFiltered(Dedup.lshCandidates(sigsR, 32, 2),
        exactR.select(col("doc_id"), col("norm_text").as("text")),
        bc, 3, 0.8)
      .select(col("b").as("doc_id")).distinct()
    val nearR = exactR.join(badR, Seq("doc_id"), "left_anti")
    val want = CorpusBuild.chainReport(
        normR, qR, exactR, nearR,
        CorpusBuild.shardAsg(s, nearR.select("doc_id", "n_norm")))
      .collect().toSeq
    assert(got.map(_.toString).sorted == want.map(_.toString).sorted,
      s"retraction diverged from the reduced rebuild:\n" +
        s"got  ${got.mkString(", ")}\nwant ${want.mkString(", ")}")
  }
}
