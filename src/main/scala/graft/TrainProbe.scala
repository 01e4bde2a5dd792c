package graft

import org.apache.spark.sql.functions._

/** Trainer-DEPTH probe (round-11 ask #6): the Unigram-LM family is
  * oracle-gated at fixture scale, where the synthetic vocabulary (~30
  * distinct words) can only seed a few hundred pieces. A production
  * SentencePiece run seeds 10^5-10^6 candidate pieces over a
  * 10^5-10^6-word vocabulary — this probe measures THAT regime: a
  * generated corpus (deterministic base-26 words, no fixture reuse) at
  * ~100x the sf0.1 token volume, seedMax = 65536, timing the seed pass
  * and every Viterbi-EM round separately.
  *
  * What flat-per-round means here: each EM round is one flatMap over
  * the CHECKPOINTED word-frequency table (|vocab| rows, not |corpus|)
  * plus a vocabulary-bounded aggregate whose collect is ≤ |seed| rows —
  * so round wall must not grow with the round index, and the driver
  * never holds more than the seed-bounded model. Both are asserted
  * (exit 1) as well as printed.
  *
  * Knobs: SPARK_GRAFT_TOKENS (default 30M), SPARK_GRAFT_VOCAB (default
  * 200k), SPARK_GRAFT_SEED_MAX (default 65536), SPARK_GRAFT_EM_ROUNDS
  * (default 4), SPARK_GRAFT_CPUS. */
object TrainProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nTokens = sys.env.getOrElse("SPARK_GRAFT_TOKENS", "30000000").toLong
    val vocab = sys.env.getOrElse("SPARK_GRAFT_VOCAB", "200000").toLong
    val seedMax = sys.env.getOrElse("SPARK_GRAFT_SEED_MAX", "65536").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_EM_ROUNDS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic generated corpus: token i is the base-26 encoding
    // (7 chars, 'a'..'z') of a multiplicative scramble of i mod vocab —
    // wide vocabulary, realistic word lengths, substring-rich.
    val tokens = spark.range(nTokens)
      .select(expr(
        s"""concat_ws('',
           |  transform(sequence(0, 6), j ->
           |    chr(97 + CAST((id * 2654435761) % $vocab AS BIGINT)
           |      div CAST(pow(26, j) AS BIGINT) % 26)))""".stripMargin)
        .as("tok"))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // train() internals timed stage by stage via the same private[graft]
    // surface the entries use
    val (wf, wfSec) = timed {
      val w = graft.text.Unigram.wordFreqProbe(tokens, 16)
      w.count() // materialize the checkpoint inside the timing
      w
    }
    val nWords = wf.count()
    val (model0, seedSec) =
      timed(graft.text.Unigram.seedModelProbe(wf, seedMax, 6))
    assert(model0.counts.size <= seedMax + 26 + 1,
      s"seed model ${model0.counts.size} exceeds seedMax + alphabet")
    var model = model0
    val roundSecs = (1 to rounds).map { _ =>
      val (m, sec) = timed(
        graft.text.Unigram.emRoundProbe(spark, wf, model, 6))
      assert(m.counts.size == model.counts.size,
        "EM must re-estimate over the SAME seed-bounded piece set")
      model = m
      sec
    }
    val (pruned, pruneSec) = timed(
      graft.text.Unigram.pruneAndRefit(spark, wf, model, 6, 32768))
    assert(pruned.counts.size <= 32768 + model0.counts.count(_._1.length == 1),
      "pruned model must stay keep-bounded on the driver")
    // flat-per-round pin: the last round within 2x of the first
    assert(roundSecs.last <= roundSecs.head * 2 + 1.0,
      s"per-round cost grew: $roundSecs")
    val rs = roundSecs.map(s => f"$s%.1f").mkString("[", ",", "]")
    println(f"""{"metric":"unigram_train_depth","tokens":$nTokens,""" +
      s""""distinct_words":$nWords,"seed_max":$seedMax,""" +
      s""""model_pieces":${model.counts.size},""" +
      f""""wordfreq_sec":$wfSec%.1f,"seed_sec":$seedSec%.1f,""" +
      s""""round_secs":$rs,""" +
      f""""prune_refit_sec":$pruneSec%.1f,""" +
      s""""pruned_pieces":${pruned.counts.size}}""")
    spark.stop()
  }
}
