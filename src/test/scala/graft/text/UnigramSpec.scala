package graft.text

import graft.SparkSpec

/** Unigram-LM (Viterbi-EM) trainer semantics: exact Viterbi optimality,
  * the deterministic tie-break contract both engines implement, and an
  * independent in-memory replay of the whole training loop. */
class UnigramSpec extends SparkSpec {

  private def toksDf(words: Seq[String]) = {
    import spark.implicits._
    words.toDF("tok")
  }

  /** Every segmentation of `word` into pieces of length <= maxLen, each
    * scored with the SAME left-to-right product of IEEE doubles the DP
    * applies — the brute-force ground truth for Viterbi. */
  private def allSegs(word: String, probs: Map[String, Double],
                      maxLen: Int): Seq[(String, Int, Double)] = {
    def rec(pos: Int): Seq[(List[String], Double)] =
      if (pos == word.length) Seq((Nil, 1.0))
      else (1 to math.min(maxLen, word.length - pos)).flatMap { l =>
        val piece = word.substring(pos, pos + l)
        probs.get(piece).toSeq.flatMap { _ =>
          rec(pos + l).map { case (rest, _) => (piece :: rest, 0.0) }
        }
      }
    rec(0).map { case (pieces, _) =>
      // product computed left-to-right exactly as the DP accumulates it
      var p = 1.0
      pieces.foreach(pc => p = p * probs(pc))
      (pieces.mkString(" "), pieces.length, p)
    }
  }

  private def bruteBest(word: String, probs: Map[String, Double],
                        maxLen: Int): (String, Int) = {
    val best = allSegs(word, probs, maxLen).minBy {
      case (path, k, p) => (-p, k, path)
    }
    (best._1, best._2)
  }

  test("viterbi == brute-force argmax under (prod DESC, k ASC, path ASC) " +
    "over random piece models and words") {
    val rnd = new scala.util.Random(0xDE5EEDL)
    val alphabet = "abcd"
    for (_ <- 1 to 200) {
      val word = Seq.fill(1 + rnd.nextInt(9))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // random piece set: all singles plus random multi-char substrings,
      // random integer counts (some zero — the probability-0 tie regime)
      val pieces = scala.collection.mutable.LinkedHashSet.empty[String]
      alphabet.foreach(c => pieces += c.toString)
      for (_ <- 1 to 8) {
        val i = rnd.nextInt(word.length)
        val l = 1 + rnd.nextInt(math.min(4, word.length - i))
        pieces += word.substring(i, i + l)
      }
      val counts = pieces.toSeq.map(_ -> rnd.nextInt(5).toLong)
      val total = counts.map(_._2).sum
      val probs = counts.map { case (pc, n) =>
        pc -> (if (total == 0) 0.0 else n.toDouble / total.toDouble)
      }.toMap
      val got = Unigram.viterbi(word, probs, 4)
      val want = bruteBest(word, probs, 4)
      assert(got == want, s"word=$word probs=$probs")
    }
  }

  test("tie-break: equal products (same multiset reordered) resolve to " +
    "the lexicographically smallest path, fewer pieces first") {
    // p(a) = p(ba) and p(ab) chosen equal: 'aba' has segs (a)(ba) and
    // (ab)(a) with exactly equal double products and equal k — the path
    // string decides, and 'a ba' < 'ab a'
    val probs = Map("a" -> 0.25, "b" -> 0.125, "ab" -> 0.25, "ba" -> 0.25)
    assert(Unigram.viterbi("aba", probs, 2) == ("a ba", 2))
    // fewer pieces beat more at equal product: p(aa) == p(a)*p(a)
    val probs2 = Map("a" -> 0.25, "aa" -> 0.0625)
    assert(Unigram.viterbi("aa", probs2, 2) == ("aa", 1))
  }

  test("zero-probability pieces stay segmentable: all-zero paths tie at " +
    "0.0 and the (k, path) rule still picks deterministically") {
    val probs = Map("a" -> 0.0, "b" -> 1.0, "ab" -> 0.0, "aa" -> 0.0)
    // every path through 'a' has product 0; k ASC prefers 'aa' (1 piece)
    assert(Unigram.viterbi("aa", probs, 2) == ("aa", 1))
    assert(Unigram.viterbi("ab", probs, 2) == ("ab", 1))
  }

  /** Independent in-memory replay of the WHOLE training loop — seeding,
    * selection, Viterbi-EM rounds — against the Spark trainer. */
  private def referenceTrain(words: Seq[String], seedMax: Int,
                             maxPieceLen: Int, maxWordLen: Int,
                             rounds: Int): Seq[(String, Long)] = {
    val wf = words.filter(w => w.nonEmpty && w.length <= maxWordLen)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    wf.foreach { case (w, c) =>
      for (i <- 0 until w.length;
           j <- (i + 1) to math.min(w.length, i + maxPieceLen))
        sub.update(w.substring(i, j), sub.getOrElse(w.substring(i, j), 0L) + c)
    }
    val singles = sub.filter(_._1.length == 1)
    val top = sub.toSeq.sortBy { case (pc, n) => (-n, pc) }.take(seedMax)
    var counts = (singles ++ top).toMap.toSeq.sortBy(_._1)
    var total = counts.map(_._2).sum
    for (_ <- 1 to rounds if total > 0) {
      val t = total.toDouble
      val probs = counts.map { case (pc, n) =>
        pc -> (if (total == 0L) 0.0 else n.toDouble / t)
      }.toMap
      val e = scala.collection.mutable.HashMap.empty[String, Long]
      wf.foreach { case (w, c) =>
        Unigram.viterbi(w, probs, maxPieceLen)._1.split(" ")
          .foreach(pc => e.update(pc, e.getOrElse(pc, 0L) + c))
      }
      counts = counts.map { case (pc, _) => pc -> e.getOrElse(pc, 0L) }
      total = counts.map(_._2).sum
    }
    counts
  }

  test("Spark trainer == independent in-memory reference on a generated " +
    "corpus (seeding, selection ties, two EM rounds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    val base = Seq("river", "rivers", "driver", "sliver", "ab", "abab",
      "ababab", "ba", "aa", "zzz", "z")
    val words = Seq.fill(400)(base(rnd.nextInt(base.length)))
    val (model, _) = Unigram.train(spark, toksDf(words),
      seedMax = 32, maxPieceLen = 4, maxWordLen = 8, rounds = 2)
    val want = referenceTrain(words, 32, 4, 8, 2)
    assert(model.counts == want)
  }

  test("driver state stays seed-bounded at production seed widths: the " +
    "model never exceeds seedMax + alphabet, EM preserves the piece " +
    "set, and prune is keep-bounded (round-11 depth assertion)") {
    import spark.implicits._
    // generated wide-vocabulary corpus (base-26 5-char words)
    val toks = spark.range(40000).selectExpr(
      "concat_ws('', transform(sequence(0, 4), j -> " +
        "chr(97 + CAST((id * 2654435761) % 4096 AS BIGINT) " +
        "div CAST(pow(26, j) AS BIGINT) % 26)))")
      .toDF("tok")
    val (model, wf) = Unigram.train(spark, toks,
      seedMax = 2048, maxPieceLen = 6, maxWordLen = 16, rounds = 2)
    val alphabet = model.counts.count(_._1.length == 1)
    assert(model.counts.size <= 2048 + alphabet,
      s"driver model ${model.counts.size} exceeds seed bound")
    val refit = Unigram.pruneAndRefit(spark, wf, model, 6, keep = 256)
    assert(refit.counts.size <= 256 + alphabet,
      s"pruned driver model ${refit.counts.size} exceeds keep bound")
    assert(refit.counts.map(_._1).distinct.size == refit.counts.size)
  }

  test("prune + refit == independent reference: all singles kept, top-k " +
    "multi-char by (cnt DESC, piece ASC), one more EM round") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val base = Seq("river", "rivers", "driver", "sliver", "ab", "abab",
      "ababab", "ba", "aa", "zzz", "z", "riverbed")
    val words = Seq.fill(500)(base(rnd.nextInt(base.length)))
    val keep = 6
    val (model, wf) = Unigram.train(spark, toksDf(words),
      seedMax = 32, maxPieceLen = 4, maxWordLen = 8, rounds = 2)
    val got = Unigram.pruneAndRefit(spark, wf, model,
      maxPieceLen = 4, keep = keep)
    // independent replay: reference-train, prune the same way, refit
    val trained = referenceTrain(words, 32, 4, 8, 2)
    val singles = trained.filter(_._1.length == 1)
    val multi = trained.filter(_._1.length > 1)
      .sortBy { case (pc, n) => (-n, pc) }.take(keep)
    var counts = (singles ++ multi).sortBy(_._1)
    val total = counts.map(_._2).sum
    val probs = counts.map { case (pc, n) =>
      pc -> (if (total == 0L) 0.0 else n.toDouble / total.toDouble)
    }.toMap
    val wfm = words.filter(w => w.nonEmpty && w.length <= 8)
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val e = scala.collection.mutable.HashMap.empty[String, Long]
    wfm.foreach { case (w, c) =>
      Unigram.viterbi(w, probs, 4)._1.split(" ")
        .foreach(pc => e.update(pc, e.getOrElse(pc, 0L) + c))
    }
    counts = counts.map { case (pc, _) => pc -> e.getOrElse(pc, 0L) }
    assert(got.counts == counts)
    assert(got.counts.count(_._1.length > 1) <= keep)
    assert(got.counts.filter(_._1.length == 1).map(_._1) ==
      model.counts.filter(_._1.length == 1).map(_._1),
      "pruning must never drop a single character")
  }

  test("segmentation COVERS: every word's pieces concatenate back to the " +
    "word, counts are internally consistent, totals conserve") {
    import spark.implicits._
    val words = Seq.fill(50)("abc") ++ Seq.fill(30)("ab") ++
      Seq.fill(20)("c")
    val (model, wf) = Unigram.train(spark, toksDf(words),
      seedMax = 16, maxPieceLen = 3, maxWordLen = 8, rounds = 2)
    assert(model.total == model.counts.map(_._2).sum)
    val seg = Unigram.segment(spark, model, wf, maxPieceLen = 3)
      .as[(String, Long, String, Int)].collect()
    assert(seg.map(_._1).toSet == Set("abc", "ab", "c"))
    seg.foreach { case (w, _, pieces, k) =>
      val ps = pieces.split(" ")
      assert(ps.length == k)
      assert(ps.mkString == w, "pieces must concatenate to the word")
      assert(ps.forall(pc => model.counts.exists(_._1 == pc)),
        "every emitted piece is in the seeded vocabulary")
    }
  }
}
