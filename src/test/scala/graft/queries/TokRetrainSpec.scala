package graft.queries

import graft.SparkSpec
import graft.sinks.ArtifactStore
import org.apache.spark.sql.functions._

/** tok_bpe_retrain — the merge-table retrain actuation must
  * (1) land exactly where from-scratch training of the grown corpus
  *     lands (the folded word-count table is BPE's sufficient
  *     statistic, so fold-then-train == train-from-scratch, exactly),
  * (2) be INCREMENTAL — the committed base word-count profile and the
  *     frozen base-trained table are served, never re-committed (the
  *     base corpus text is not re-read at retrain time),
  * (3) commit on the serve key, so tok_bpe_serve picks up the
  *     refreshed tokenizer load-only, and
  * (4) actually re-decide merges when the delta shifts pair counts —
  *     pinned on a synthetic fixture where the winner flips. */
class TokRetrainSpec extends SparkSpec {

  private val fullKey = "bpe_merges_v1_"

  private def refreshedKey: String =
    LlmPipeline.docKey(spark, sf, "bpe_merges", "m8")

  test("retrain lands exactly where from-scratch training of the " +
    "grown corpus lands, committed on the serve key") {
    val s = spark
    ArtifactStore.remove(s, refreshedKey)
    val report = LlmPipeline.tokBpeRetrain(s, sf).collect()
    assert(ArtifactStore.exists(s, refreshedKey),
      "retrain must commit the refreshed table on the full-corpus key")
    val viaRetrain = ArtifactStore.load(s, refreshedKey)
      .select("step", "l", "r", "merged", "n").collect()
      .map(_.toSeq).toSet
    val scratch = graft.text.Bpe.trainRounds(s,
      graft.Tables.documents(s, sf)
        .select(explode(split(col("text"), "\\s+")).as("tok")), 8)._1
      .map { case (st, l, r, m, n) => Seq[Any](st, l, r, m, n) }.toSet
    assert(viaRetrain == scratch,
      "the folded-count training diverged from the from-scratch run")
    // the report covers every learned step, new side == refreshed table
    assert(report.map(_.getAs[Int]("step")).toSet == scratch.map(_.head))
  }

  test("the retrain event serves the committed base profile and the " +
    "frozen table — no base re-commit, no base text re-read path") {
    val s = spark
    LlmPipeline.tokBpeRetrain(s, sf).collect() // base artifacts staged
    val baseKeys = (ArtifactStore.list(s, "bpe_wordcnt_v1_") ++
      ArtifactStore.list(s, fullKey).filterNot(_ == refreshedKey))
    assert(baseKeys.nonEmpty, "base profile + frozen table expected")
    def listings = baseKeys.map(k => SparkSpec.partListing(s, k))
    val before = listings
    ArtifactStore.remove(s, refreshedKey) // force the retrain event
    LlmPipeline.tokBpeRetrain(s, sf).collect()
    assert(listings == before,
      "the retrain event re-committed a base-side artifact — the fold " +
        "must SERVE the committed word counts, not re-pay the base pass")
  }

  test("post-retrain, tok_bpe_serve answers from the refreshed " +
    "artifact load-only (no retrain on the serve path)") {
    val s = spark
    LlmPipeline.tokBpeRetrain(s, sf).collect()
    val before = SparkSpec.partListing(s, refreshedKey)
    val served = LlmPipeline.tokBpeServe(s, sf)
    assert(served.count() > 0)
    assert(SparkSpec.partListing(s, refreshedKey) == before,
      "tok_bpe_serve must LOAD the refreshed table, never re-commit")
  }

  test("a delta that shifts pair counts flips the learned merges and " +
    "the migration report says so (synthetic winner-flip fixture)") {
    val s = spark
    import s.implicits._
    // base: 'ab' x10, 'cd' x9 -> merges (a,b,10) then (c,d,9);
    // delta: 'cd' x5 -> full: (c,d,14) then (a,b,10) — order flips
    val wcBase = Seq(("ab", 10L), ("cd", 9L)).toDF("word", "cnt")
    val deltaToks = Seq.fill(5)("cd").toDF("tok")
    val frozen = graft.text.Bpe.trainRoundsFromCounts(s, wcBase, 8)._1
      .toDF("step", "l", "r", "merged", "n")
    val refreshed = LlmPipeline.bpeRetrainFold(s, wcBase, deltaToks)
    // fold == from-scratch on the synthetic too
    val scratchToks = (Seq.fill(10)("ab") ++ Seq.fill(14)("cd"))
      .toDF("tok")
    assert(refreshed.collect().map(_.toSeq).toSet ==
      graft.text.Bpe.trainRounds(s, scratchToks, 8)._1
        .map { case (st, l, r, m, n) => Seq[Any](st, l, r, m, n) }.toSet)
    val rep = LlmPipeline.bpeRetrainReport(frozen, refreshed)
      .collect().sortBy(_.getAs[Int]("step"))
    assert(rep.length == 2)
    assert(rep.forall(_.getAs[Boolean]("changed")),
      "both rounds were re-decided; the report must flag them")
    assert(rep(0).getAs[String]("merged_frozen") == "ab" &&
      rep(0).getAs[String]("merged_new") == "cd" &&
      rep(0).getAs[Long]("n_new") == 14L)
    assert(rep(1).getAs[String]("merged_frozen") == "cd" &&
      rep(1).getAs[String]("merged_new") == "ab" &&
      rep(1).getAs[Long]("n_new") == 10L)
  }

  test("the control loop CLOSES: a drifted delta triggers retrain, and " +
    "the monitor re-anchored on the grown-corpus profile serves the " +
    "next grown-distributed append") {
    val s = spark
    import s.implicits._
    def decision(df: org.apache.spark.sql.DataFrame): String =
      df.where(col("kind") === "decision").collect()
        .head.getAs[String]("decision")
    val baseToks = Seq.fill(12)("abab").toDF("tok")
    val delta1 = Seq.fill(18)("cdcd").toDF("tok")
    val frozenProfile = LlmPipeline.bpePairCounts(baseToks, "c_base")
    // pre-retrain: the new-script delta shares no bigram with the
    // frozen profile — full-profile TV 1.0 → retrain
    assert(decision(
      LlmPipeline.tokBpeDriftFrom(s, frozenProfile, delta1)) == "retrain")
    // actuation: the refreshed profile covers base ∪ delta (what the
    // retrain event's folded word counts induce)
    val refreshedProfile = LlmPipeline.bpePairCounts(
      baseToks.unionByName(delta1), "c_base")
    // post-retrain: the next append drawn from the GROWN distribution
    // (same 12:18 mix at a third the size) → TV 0 → serve
    val delta2 = (Seq.fill(4)("abab") ++ Seq.fill(6)("cdcd")).toDF("tok")
    val out = LlmPipeline.tokBpeDriftFrom(s, refreshedProfile, delta2)
    assert(decision(out) == "serve",
      "the retrained profile must serve a grown-distributed append")
    assert(out.where(col("kind") === "decision").collect()
      .head.getAs[Long]("drift_nano") == 0L,
      "identical mix proportions must give exactly zero TV")
    // while the STALE frozen profile would still (correctly) page on it
    assert(decision(
      LlmPipeline.tokBpeDriftFrom(s, frozenProfile, delta2)) == "retrain")
  }
}
