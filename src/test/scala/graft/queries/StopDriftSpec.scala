package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** corpus_stop_drift (round-15 ask #4): the retrain-vs-serve trigger
  * must fire on BOTH sides of its named boundary
  * (total TV > CorpusBuild.StopDriftTvMicro = 0.1):
  *
  *  - an UNDRIFTED delta (same template profile as the base) sits at
  *    ~zero drift → 'serve'
  *  - a DRIFTED delta (the frozen template fades, a new one dominates)
  *    reports the fading shingles as 'frozen_only' losses and the new
  *    template as 'mined_only' gains, and the total crosses the
  *    threshold → 'retrain'
  *
  * Fixtures are synthetic survivor-text frames fed straight to
  * stopDriftFrom — the entry-level wiring (committed base stages +
  * the append path's digest probe) is covered by the DuckDB oracle. */
class StopDriftSpec extends SparkSpec {

  private val P = "is in of to is" // 5-token template → 3 stop shingles

  private def side(tag: String, n: Int, tpl: Int => String): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, tpl(i)))
      .toDF("doc_id", "norm_text")
  }

  private def rows(df: DataFrame) = df.collect().map(r => (
    r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
    r.getLong(4), r.getString(6)))

  test("undrifted delta: identical template profile decides 'serve' at " +
    "~zero drift") {
    val base = side("b", 10, i => s"$P b${i}1 b${i}2 b${i}3")
    val delta = side("d", 10, i => s"$P d${i}1 d${i}2 d${i}3")
    val out = rows(CorpusBuild.stopDriftFrom(spark, base, delta))
    val dec = out.find(_._1 == "decision").get
    assert(dec._6 == "serve", s"undrifted profile must serve: $dec")
    assert(dec._5 <= 1L, s"identical rates must give ~zero TV: $dec")
    // every template shingle is a stop shingle on BOTH sides
    assert(out.filter(_._1 == "shingle").forall(_._6 == "both"))
    assert(out.count(_._1 == "shingle") == 3) // P's 3 internal trigrams
  }

  test("drifted delta: fading frozen template + new dominant template " +
    "decides 'retrain', with both loss directions reported") {
    val base = side("b", 10, i => s"$P b${i}1 b${i}2 b${i}3")
    // 2 of 10 delta docs keep the old template; 8 carry a new one
    val delta = side("d", 10, i =>
      if (i <= 2) s"$P d${i}1 d${i}2 d${i}3"
      else s"zz yy xx ww vv d${i}1 d${i}2 d${i}3")
    val out = rows(CorpusBuild.stopDriftFrom(spark, base, delta))
    val dec = out.find(_._1 == "decision").get
    assert(dec._6 == "retrain",
      s"template replacement must trigger retrain: $dec")
    assert(dec._5 > CorpusBuild.StopDriftTvMicro)
    val tags = out.filter(_._1 == "shingle").map(s => s._2 -> s._6).toMap
    // the frozen template's shingles fell to df 2/10 — frozen_only
    assert(tags("is in of") == "frozen_only" &&
      tags("in of to") == "frozen_only" && tags("of to is") == "frozen_only")
    // the new template mined fresh stop shingles the frozen set lacks
    assert(tags("zz yy xx") == "mined_only" &&
      tags("xx ww vv") == "mined_only")
    // and the per-shingle micro terms: |1.0 - 0.2|/2 = 0.4 for losses,
    // |0 - 0.8|/2 = 0.4 for gains — exact fixed-point values
    val bySh = out.filter(_._1 == "shingle").map(s => s._2 -> s._5).toMap
    assert(bySh("is in of") == 400000L && bySh("zz yy xx") == 400000L)
  }

  test("boundary: a delta exactly AT the threshold serves; one step " +
    "past it retrains") {
    val base = side("b", 10, i => s"$P b${i}1 b${i}2 b${i}3")
    // k of 10 delta docs drop the template: each of the 3 frozen
    // shingles contributes |1 - (10-k)/10|/2 = k/20. Total = 3k/20.
    // k=0 → 0; the template must stay a MAJORITY shingle on the delta
    // side (df > 5) for the comparison to stay within 'both' rows:
    // k=1 → 150000 > 100000 (retrain), k=0 → 0 (serve) brackets the
    // named threshold with the smallest possible profile step.
    def deltaDrop(k: Int) = side("d", 10, i =>
      if (i <= 10 - k) s"$P d${i}1 d${i}2 d${i}3"
      else s"d${i}0 d${i}1 d${i}2 d${i}3 d${i}4")
    def total(k: Int) = rows(CorpusBuild.stopDriftFrom(spark, base,
      deltaDrop(k))).find(_._1 == "decision").get
    val at = total(0)
    assert(at._6 == "serve" && at._5 == 0L)
    val past = total(1)
    assert(past._6 == "retrain" && past._5 == 150000L,
      s"one-doc profile step must cross the named threshold: $past")
  }

  test("the control loop CLOSES: the drifted delta retrains; the " +
    "monitor re-anchored on the retrained (grown-corpus) profile " +
    "serves the next grown-distributed append") {
    val base = side("b", 10, i => s"$P b${i}1 b${i}2 b${i}3")
    val Q = "zz yy xx ww vv" // the new dominant template
    val delta1 = side("d", 15, i => s"$Q d${i}1 d${i}2 d${i}3")
    // pre-retrain: the template replacement pages → retrain
    val pre = rows(CorpusBuild.stopDriftFrom(spark, base, delta1))
    assert(pre.find(_._1 == "decision").get._6 == "retrain")
    // actuation (what corpus_retrain commits): the stop profile
    // re-mines over base ∪ delta — ids shifted so the union is a
    // genuine 25-doc grown corpus
    val grown = base.unionByName(
      delta1.withColumn("doc_id", col("doc_id") + lit(1000L)))
    // post-retrain: the next append drawn from the GROWN distribution
    // (same 2:3 template mix at 10 docs)
    val delta2 = side("n", 10, i =>
      if (i <= 4) s"$P n${i}1 n${i}2 n${i}3"
      else s"$Q n${i}1 n${i}2 n${i}3")
    val post = rows(CorpusBuild.stopDriftFrom(spark, grown, delta2))
    val dec = post.find(_._1 == "decision").get
    assert(dec._6 == "serve",
      s"the retrained profile must serve a grown-distributed append: $dec")
    // the refreshed parameter genuinely CHANGED: in the grown corpus
    // the new template is the majority (15/25) and the old one lapsed
    // (10/25) — the scored rows are exactly Q's shingles, 'both' sides
    val tags = post.filter(_._1 == "shingle").map(s => s._2 -> s._6).toMap
    assert(tags.nonEmpty && tags.values.forall(_ == "both"))
    assert(tags.contains("zz yy xx") && !tags.contains("is in of"))
    // while the STALE frozen profile would still page on the same mix
    assert(rows(CorpusBuild.stopDriftFrom(spark, base, delta2))
      .find(_._1 == "decision").get._6 == "retrain")
  }

  test("the monitor re-anchors after a TAKEDOWN (drift-after-retract): " +
    "the survivor-corpus profile serves a survivor-distributed append " +
    "at exactly zero TV while the stale pre-takedown profile pages") {
    val Q = "zz yy xx ww vv"
    // base: 12 P-template docs + 8 Q-template docs
    val base = side("b", 20, i =>
      if (i <= 12) s"$P b${i}1 b${i}2 b${i}3"
      else s"$Q b${i}1 b${i}2 b${i}3")
    // the takedown removes 8 of the P carriers — in the survivor
    // corpus (4 P + 8 Q) the template MAJORITY flips to Q, so the
    // retract event leaves the committed pre-takedown profile stale
    val survivors = base.where(col("doc_id") > 8)
    // the next append drawn from the SURVIVOR distribution (1:2 mix)
    val delta = side("n", 3, i =>
      if (i == 1) s"$P n${i}1 n${i}2 n${i}3"
      else s"$Q n${i}1 n${i}2 n${i}3")
    val post = rows(CorpusBuild.stopDriftFrom(spark, survivors, delta))
    val dec = post.find(_._1 == "decision").get
    assert(dec._6 == "serve",
      s"the re-anchored profile must serve the survivor mix: $dec")
    assert(dec._5 == 0L, "identical majority shares must give zero TV")
    // the scored set re-elected: Q's 3 shingles, majority on BOTH
    // sides; P lost majority in both the survivor corpus and the delta
    val tags = post.filter(_._1 == "shingle").map(s => s._2 -> s._6)
    assert(tags.length == 3 && tags.forall(_._2 == "both"))
    assert(tags.forall(_._1.split(" ").forall(Q.split(" ").contains)))
    // while the STALE profile mis-pages on the same delta: P still
    // majority there (12/20) and Q majority only in the delta — both
    // template families score as one-sided losses
    val stale = rows(CorpusBuild.stopDriftFrom(spark, base, delta))
    val sdec = stale.find(_._1 == "decision").get
    assert(sdec._6 == "retrain" && sdec._5 == 799998L,
      s"the stale profile must (wrongly) page on the survivor mix: $sdec")
  }

  // ---- tok_bpe_drift: the tokenizer trained-parameter monitor ----

  private def bpeRows(base: Seq[(String, Long)], delta: Seq[String]) = {
    import spark.implicits._
    LlmPipeline.tokBpeDriftFrom(spark,
        base.toDF("pair", "c_base"), delta.toDF("tok"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(6)))
  }

  private val bpeBase =
    Seq(("ab", 400L), ("bc", 300L), ("cd", 200L), ("de", 100L))

  test("tok_bpe_drift: proportional delta profile decides 'serve' at " +
    "zero TV and zero flips") {
    val delta = Seq.fill(40)("ab") ++ Seq.fill(30)("bc") ++
      Seq.fill(20)("cd") ++ Seq.fill(10)("de")
    val out = bpeRows(bpeBase, delta)
    val dec = out.find(_._1 == "decision").get
    assert(dec._6 == "serve" && dec._5 == 0L, s"$dec")
    assert(out.filter(_._1 == "pair").forall(_._6 == "both"))
  }

  test("tok_bpe_drift: a replaced bigram head decides 'retrain' with " +
    "the full mass displaced (TV = 1.0)") {
    val delta = Seq.fill(50)("xy") ++ Seq.fill(50)("yz")
    val out = bpeRows(bpeBase, delta)
    val dec = out.find(_._1 == "decision").get
    assert(dec._6 == "retrain" && dec._5 == 1000000000L, s"$dec")
    val tags = out.filter(_._1 == "pair").map(p => p._2 -> p._6).toMap
    assert(Seq("ab", "bc", "cd", "de").forall(tags(_) == "frozen_only"))
    assert(Seq("xy", "yz").forall(tags(_) == "mined_only"))
  }

  test("tok_bpe_drift: TAIL-concentrated drift retrains even though " +
    "the head is unchanged — the head-only score would have served " +
    "(round-16 ask #4)") {
    // base: 4 head pairs carrying 71.2% of mass + 100 rare pairs at
    // 0.3% each; delta: IDENTICAL head shares, but the tail's 100
    // pairs are entirely REPLACED (a new script arriving as many
    // individually-rare bigrams that never crack the top-8)
    def tail(prefix: Int) = (0 until 100).map(i =>
      s"${('a' + prefix + i / 10).toChar}${('0' + i % 10).toChar}")
    val base = Seq(("ab", 300L), ("bc", 200L), ("cd", 100L),
      ("de", 100L)) ++ tail(0).map(_ -> 3L)
    val delta = Seq.fill(300)("ab") ++ Seq.fill(200)("bc") ++
      Seq.fill(100)("cd") ++ Seq.fill(100)("de") ++
      tail(10).flatMap(p => Seq.fill(3)(p))
    val out = bpeRows(base, delta)
    val dec = out.find(_._1 == "decision").get
    assert(dec._6 == "retrain" && dec._5 == 300000000L,
      s"full-profile TV must see the replaced tail: $dec")
    // the head rows alone sum far BELOW the threshold — the r15
    // head-only scorer would have decided 'serve' on this profile
    val headTv = out.filter(_._1 == "pair").map(_._5).sum
    assert(headTv == 12000000L && headTv <= LlmPipeline.TokBpeDriftTvNano,
      s"fixture must be invisible to the head: $headTv")
    // the tail row carries the residual masses and the residual TV
    val tl = out.find(_._1 == "tail").get
    assert(tl._2 == "__tail__" && tl._3 == 288L && tl._4 == 288L &&
      tl._5 == 288000000L, s"tail row: $tl")
    // heads stay 'both'; the swapped tails surface as one-sided top-8
    // entries (8 flips — observability, not the decision)
    val tags = out.filter(_._1 == "pair").map(p => p._2 -> p._6).toMap
    assert(Seq("ab", "bc", "cd", "de").forall(tags(_) == "both"))
  }

  // ---- degenerate sides (round-15 ADVICE): no division ever runs ----

  test("stop drift: empty delta short-circuits to one 'serve' decision " +
    "row; empty base profile under a non-empty delta retrains") {
    import spark.implicits._
    val base = side("b", 10, i => s"$P b${i}1 b${i}2 b${i}3")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "norm_text")
    val ed = CorpusBuild.stopDriftFrom(spark, base, empty).collect()
    assert(ed.length == 1 && ed.head.getString(0) == "decision" &&
      ed.head.getString(6) == "serve" && ed.head.getLong(4) == 0L &&
      ed.head.getLong(3) == 0L, s"empty delta: ${ed.toSeq}")
    val eb = CorpusBuild.stopDriftFrom(spark, empty,
      side("d", 5, i => s"$P d${i}1")).collect()
    assert(eb.length == 1 && eb.head.getString(6) == "retrain",
      s"empty base profile must retrain: ${eb.toSeq}")
    val both = CorpusBuild.stopDriftFrom(spark, empty, empty).collect()
    assert(both.length == 1 && both.head.getString(6) == "serve")
  }

  test("tok_bpe_drift: empty delta short-circuits to 'serve'; empty " +
    "base profile under a non-empty delta retrains") {
    val ed = bpeRows(bpeBase, Seq.empty[String])
    assert(ed.length == 1 && ed.head._1 == "decision" &&
      ed.head._6 == "serve" && ed.head._5 == 0L, s"${ed.toSeq}")
    val eb = bpeRows(Seq.empty[(String, Long)], Seq.fill(10)("xy"))
    assert(eb.length == 1 && eb.head._6 == "retrain", s"${eb.toSeq}")
  }
}
