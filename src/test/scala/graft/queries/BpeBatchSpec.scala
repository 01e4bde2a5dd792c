package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential proof for the BATCHED BPE trainer (text/Bpe.scala): the
  * prefix + strict-trim batching rule must reproduce the classic
  * SEQUENTIAL algorithm merge-for-merge. The reference here is an
  * independent in-memory implementation of sequential BPE (word-count
  * map, pair recount every round, (n DESC, l, r) tie-break, greedy
  * left-to-right merge) — a drift in the batching rule, the disjointness
  * set, or the strict trim surfaces as a diverging merge table.
  *
  * This spec also carries the >=256-merge evidence the driver corpus
  * cannot (its 31-word vocabulary exhausts at 89 merges): a generated
  * 2000-word corpus trains 256 merges, exactly, in far fewer driver
  * round-trips than merges, with late-round per-round cost no worse than
  * early-round (the production 10k-merge regime is driver-latency-bound
  * only if rounds ~ merges or per-round cost grows). */
class BpeBatchSpec extends SparkSpec {

  /** Independent sequential BPE over a word->count map. */
  private def sequentialRef(words: Map[String, Long], merges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var v: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 0
    var done = false
    while (step < merges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((toks, c) <- v; i <- 0 until toks.length - 1)
        counts((toks(i), toks(i + 1))) += c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((pl, pr), pn) =>
          (-pn, pl, pr)
        }
        step += 1
        learned += ((step, l, r, l + r, n))
        v = v.toSeq.map { case (toks, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          toks.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc(acc.length - 1) = l + r
            else acc += x
          }
          (acc.toVector, c)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    learned.result()
  }

  /** Deterministic generated corpus rich enough for deep merge tables:
    * 2000 distinct pseudo-words over a 12-letter alphabet with Zipf-ish
    * counts. */
  private def richCorpus(): Map[String, Long] = {
    val rnd = new scala.util.Random(20260814L)
    val letters = "abcdefghijkl"
    (1 to 2000).map { i =>
      val len = 6 + rnd.nextInt(7)
      val w = (1 to len).map(_ => letters(rnd.nextInt(letters.length)))
        .mkString
      // Zipf-ish: head words repeat often, tail words once or twice
      val c = math.max(1L, (2000.0 / i).toLong)
      (w, c)
    }.groupMapReduce(_._1)(_._2)(_ + _)
  }

  private def tokensDf(words: Map[String, Long]) = {
    import spark.implicits._
    words.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .toDF("tok")
  }

  test("batched trainer == sequential reference for 256 merges, in far " +
    "fewer rounds, with flat per-round cost") {
    val corpus = richCorpus()
    val ref = sequentialRef(corpus, 256)
    assert(ref.length == 256, "generated corpus must support 256 merges")

    val t64 = System.nanoTime()
    val (learned64, _, rounds64) =
      graft.text.Bpe.trainRoundsBatched(spark, tokensDf(corpus), 64)
    val w64 = (System.nanoTime() - t64) / 1e9

    val t256 = System.nanoTime()
    val (learned256, _, rounds256) =
      graft.text.Bpe.trainRoundsBatched(spark, tokensDf(corpus), 256)
    val w256 = (System.nanoTime() - t256) / 1e9

    assert(learned256 == ref)
    assert(learned64 == ref.take(64))
    // driver round-trips must be genuinely batched (provably-exact
    // batching is bounded by the pair-overlap structure — measured
    // ~2.1 merges/round across corpus shapes; the in-memory trainer
    // below is the path that removes round-trips entirely)
    assert(rounds256 <= (256 * 0.7).toInt,
      s"batching degenerated: $rounds256 rounds for 256 merges")
    // per-round cost flat: the 256-run averages in rounds 65..256 too,
    // so growth with round index would inflate its per-round average
    val perRound64 = w64 / math.max(1, rounds64)
    val perRound256 = w256 / math.max(1, rounds256)
    info(f"rounds: $rounds64 for 64 merges, $rounds256 for 256; " +
      f"per-round $perRound64%.3fs vs $perRound256%.3fs")
    assert(perRound256 <= perRound64 * 4 + 0.05,
      f"per-round cost grew: $perRound64%.3fs -> $perRound256%.3fs")
  }

  /** Wider corpus for the deep-merge-table evidence: 8000 distinct
    * pseudo-words over a 26-letter alphabet — enough pair diversity to
    * support ≥1024 merges and enough symbol spread that the disjointness
    * rule admits multi-merge batches. */
  private def deepCorpus(): Map[String, Long] = {
    val rnd = new scala.util.Random(20260814L)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    (1 to 8000).map { i =>
      val len = 5 + rnd.nextInt(8)
      val w = (1 to len).map(_ => letters(rnd.nextInt(letters.length)))
        .mkString
      (w, math.max(1L, (8000.0 / i).toLong))
    }.groupMapReduce(_._1)(_._2)(_ + _)
  }

  test("batched trainer == sequential reference for 1024 merges — the " +
    "adaptive-cap production regime") {
    val corpus = deepCorpus()
    val ref = sequentialRef(corpus, 1024)
    assert(ref.length == 1024, "generated corpus must support 1024 merges")
    val t0 = System.nanoTime()
    val (learned, _, rounds) =
      graft.text.Bpe.trainRoundsBatched(spark, tokensDf(corpus), 1024)
    val wall = (System.nanoTime() - t0) / 1e9
    assert(learned == ref)
    // round-trips ~ merges/batch: the adaptive fetch + provable batching
    // must keep driver rounds well under the merge count at depth, not
    // just on the 256-merge fixture
    assert(rounds <= (1024 * 0.7).toInt,
      s"batching degenerated at depth: $rounds rounds for 1024 merges")
    info(f"1024 merges in $rounds rounds " +
      f"(${1024.0 / rounds}%.1f merges/round), $wall%.1fs total, " +
      f"${wall / rounds}%.3fs/round")
    // the zero-round-trip production trainer must agree at depth too
    val t1 = System.nanoTime()
    val (learnedMem, _, _) =
      graft.text.Bpe.trainInMemory(spark, tokensDf(corpus), 1024)
    val wallMem = (System.nanoTime() - t1) / 1e9
    assert(learnedMem == ref)
    info(f"1024 in-memory merges in $wallMem%.1fs (one corpus pass)")
    assert(wallMem < 60.0)
  }

  test("in-memory production trainer == sequential reference for 256 " +
    "merges with zero per-merge round-trips") {
    val corpus = richCorpus()
    val ref = sequentialRef(corpus, 256)
    val t0 = System.nanoTime()
    val (learned, vocabDf, distinct) =
      graft.text.Bpe.trainInMemory(spark, tokensDf(corpus), 256)
    val wall = (System.nanoTime() - t0) / 1e9
    assert(learned == ref)
    assert(distinct == corpus.size.toLong)
    // the final vocab must carry every merge applied (spot-check: no
    // adjacent pair in any word equals a learned merge's (l, r))
    val mergedPairs = learned.map(m => (m._2, m._3)).toSet
    val toks = vocabDf.select("toks")
      .collect().map(_.getSeq[String](0))
    assert(toks.forall(t =>
      t.length < 2 || t.sliding(2).forall(p => !mergedPairs((p(0), p(1))))))
    info(f"256 in-memory merges over ${distinct} words in $wall%.2fs " +
      "(single corpus pass, no per-merge jobs)")
    // the whole 256-merge training must cost less than a handful of
    // Spark round-trips — this IS the flat-per-merge production regime
    assert(wall < 30.0)
  }

  test("batched trainer matches the reference through vocabulary " +
    "exhaustion on the driver corpus") {
    import spark.implicits._
    val words = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val ref = sequentialRef(words, 400) // exhausts below 400
    assert(ref.length < 400)
    val (learned, _, rounds) = graft.text.Bpe.trainRoundsBatched(
      spark,
      graft.Tables.documents(spark, sf)
        .select(explode(split(col("text"), "\\s+")).as("tok")),
      400)
    assert(learned == ref,
      s"batched diverged from sequential at exhaustion (${ref.length})")
    assert(rounds < ref.length,
      "even the exhaustion run must batch some rounds")
  }
}
