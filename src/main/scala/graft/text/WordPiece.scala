package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece merge training — the BERT-family tokenizer trainer
  * (Schuster & Nakajima 2012; the `##`-continuation formulation BERT
  * published and HuggingFace's WordPieceTrainer implements), beside the
  * BPE trainer as the second major subword-tokenizer family.
  *
  * Identical loop shape to [[Bpe]] — iterate on the word FREQUENCY
  * TABLE, never the corpus — with the one algorithmic difference that
  * defines WordPiece: a merge is chosen by LIKELIHOOD gain, not raw
  * count. Score(l, r) = n(l,r) / (c(l) · c(r)) — the pair count
  * normalized by both symbols' corpus counts — so the trainer prefers
  * pairs whose co-occurrence is high RELATIVE to their parts (merging
  * them raises corpus log-likelihood under a unigram model the most).
  * Non-initial symbols carry the `##` continuation prefix and merging
  * strips it from the right piece (`un + ##able = un##able`... the
  * merged symbol keeps the LEFT piece's position tag).
  *
  * Scale shape: per round, symbol counts and pair counts are two
  * vocabulary-bounded aggregates, the score join is vocab × vocab-
  * bounded (AQE broadcasts the symbol side), and exactly ONE winner row
  * reaches the driver; merge application is one narrow typed map. The
  * corpus itself is touched once (the word-frequency aggregate) — the
  * same property that lets the BPE trainer survive a 100 TB corpus.
  *
  * Determinism: integer pair/symbol counts; the score is computed with
  * the SAME IEEE double ops in both engines (n→double divided by the
  * product cl·cr of exact-integer-valued doubles), ties broken on
  * (l, r); the merge fold is the greedy left-to-right fold both the
  * typed map and the oracle's string-accumulator list_reduce apply. The
  * learned table exposes the INTEGER evidence (n, cl, cr) rather than
  * the double score, so the oracle hash compares exact values only.
  */
object WordPiece {

  /** Adjacent (l, r) symbol pairs of a toks array column. */
  private def pairs(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")))

  private def stripCont(sym: String): String =
    if (sym.startsWith("##")) sym.substring(2) else sym

  /** One greedy left-to-right merge of (l, r) -> m over one word's
    * symbol sequence. */
  private def mergeOnce(toks: Seq[String], l: String, r: String,
                        m: String): Seq[String] = {
    val acc = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    toks.foreach { x =>
      if (acc.nonEmpty && acc.last == l && x == r) acc(acc.length - 1) = m
      else acc += x
    }
    acc.toSeq
  }

  /** Sorted candidate pairs fetched per round — the same adaptive rule
    * as [[Bpe.candidatePrefix]]: scales with the remaining merge budget,
    * floored at 512 and capped at 8192 rows of driver traffic. */
  private def candidatePrefix(want: Int): Int =
    math.min(8192, math.max(512, 4 * want))

  /** Run `merges` WordPiece training rounds over the corpus token
    * stream. Returns (learned rows (step, l, r, merged, n, cl, cr),
    * final vocab (word, cnt, toks)). */
  private[graft] def trainRounds(s: SparkSession, tokens: DataFrame,
                                 merges: Int)
      : (Seq[(Int, String, String, String, Long, Long, Long)], DataFrame) = {
    val (learned, vocab, _) = trainRoundsBatched(s, tokens, merges)
    (learned, vocab)
  }

  /** BATCHED WordPiece training, bit-identical to the sequential
    * algorithm (what `oracleSql` replays and the in-memory reference in
    * WordPieceBatchSpec computes) but accepting many merges per Spark
    * round, so driver round-trips are ~merges/batch instead of merges.
    *
    * The construction adapts [[Bpe.trainRoundsBatched]]'s prefix +
    * dominance rules to the likelihood score s = n/(cl·cr). The new
    * hazard vs BPE: a merge CHANGES its own symbols' counts, so a pair
    * OVERLAPPING an accepted merge can have its score INCREASE (its
    * denominator shrinks) even though pair counts never increase.
    *  - PREFIX rule: accept a contiguous prefix of the (score DESC, l, r)
    *    order whose merges are symbol-DISJOINT (l, r, and the merged
    *    symbol all unused) and whose merged symbol is BRAND NEW (an
    *    m = l+strip(r) colliding with an existing symbol would conflate
    *    counts — stop there; the p_1-alone fallback keeps it exact).
    *    Disjoint merges leave every other candidate's (n, cl, cr) — and
    *    hence its score — exactly invariant, and non-accepted fetched
    *    pairs sort at-or-after the prefix with the (l, r) tie-break
    *    still favoring the accepted pick at equal score.
    *  - DOMINANCE rule: p_j survives only if its (invariant) score
    *    strictly exceeds every score a merge of p_1..p_{j-1} can create
    *    or inflate. Post-batch count LOWER bounds per touched symbol:
    *    c(s) − n (c(s) − 2n when l = r) for the drained sides, and
    *    merged ≥ ⌈n/2⌉ (= n exactly when l ≠ r) for the new symbol; a
    *    touched symbol's adjacencies either survive as s or map onto m.
    *    Every post-merge pair's occurrences map onto an OLD pair sharing
    *    a symbol with a creating merge ((x,m) from (x,l), (m,y) from
    *    (r,y), chains (m_i,m_k) from (r_i,l_k)), its count is <= that
    *    old pair's n AND <= each of its own sides' counts, so the threat
    *    from merge j is the max over fetched pairs overlapping
    *    {l_j, r_j} of min(n/(lb(a)·lb(b)), 1/max(lb(a), lb(b))), with a
    *    self-pair (l = r) adding its own residual/self-mapped threat. A
    *    full fetch adds tail terms for unfetched pairs: s_tail · R² for
    *    residual sides (R = max drain ratio c(s)/(c(s)−drain)) and a
    *    per-merge min(s_tail · R · c(side)/merged, 1/merged) for pairs
    *    mapping into the new symbol.
    * A batch cut to nothing keeps p_1 alone (the literal sequential
    * pick — always exact, collisions and ties included). Applied merges
    * fold left-to-right per word in batch order, one checkpoint per
    * ROUND. */
  private[graft] def trainRoundsBatched(s: SparkSession, tokens: DataFrame,
                                        merges: Int)
      : (Seq[(Int, String, String, String, Long, Long, Long)], DataFrame,
         Int) = {
    import s.implicits._
    // char-split with the ## continuation prefix on non-initial symbols
    var vocab = tokens.filter(length(col("tok")) > 0)
      .groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("toks", expr(
        "transform(sequence(1, length(word)), i -> " +
          "CASE WHEN i = 1 THEN substring(word, i, 1) " +
          "ELSE '##' || substring(word, i, 1) END)"))
      .select("word", "cnt", "toks")
      .localCheckpoint(true)
    val learned =
      Seq.newBuilder[(Int, String, String, String, Long, Long, Long)]
    var step = 0
    var rounds = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      rounds += 1
      val want = merges - step
      val prefix = candidatePrefix(want)
      // full symbol table: alphabet + merges-so-far rows — tiny, and
      // needed driver-side for the exact collision check and the count
      // lower bounds; re-shipped as a local relation so the pair job
      // broadcast-joins it without recomputing the aggregate
      val symCount: Map[String, Long] = vocab
        .select(col("cnt"), explode(col("toks")).as("sym"))
        .groupBy("sym").agg(sum(col("cnt")).as("sc"))
        .as[(String, Long)].collect().toMap
      val symLocal = symCount.toSeq.toDF("sym", "sc")
      val top = vocab
        .select(col("cnt"), explode(pairs(col("toks"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .join(broadcast(symLocal.select(col("sym").as("l"),
          col("sc").as("cl"))), Seq("l"))
        .join(broadcast(symLocal.select(col("sym").as("r"),
          col("sc").as("cr"))), Seq("r"))
        .withColumn("score", col("n").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double")))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(prefix)
        .select("l", "r", "n", "cl", "cr")
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        case class Cand(l: String, r: String, n: Long, cl: Long, cr: Long) {
          val m: String = l + stripCont(r)
          // the identical IEEE double expression both engines order by
          def score: Double = n.toDouble / (cl.toDouble * cr.toDouble)
        }
        val cands = top.map(row => Cand(row.getString(0), row.getString(1),
          row.getLong(2), row.getLong(3), row.getLong(4))).toIndexedSeq
        // phase 1: contiguous disjoint prefix with brand-new merged syms
        val used = scala.collection.mutable.HashSet.empty[String]
        val acc = scala.collection.mutable.ArrayBuffer.empty[Cand]
        var i = 0
        var stopped = false
        while (!stopped && i < cands.length && acc.size < want) {
          val c = cands(i)
          val fresh = !symCount.contains(c.m)
          if (acc.isEmpty ||
              (!used(c.l) && !used(c.r) && !used(c.m) && fresh)) {
            acc += c; used += c.l; used += c.r; used += c.m; i += 1
            if (!fresh) stopped = true // p_1 with a colliding m: alone
          } else stopped = true
        }
        // phase 2: post-batch count LOWER bounds. drainLb(s) bounds the
        // touched symbol s itself (occurrences its merge consumed);
        // mergedLbOf(s) is the new symbol its occurrences may map onto.
        // Untouched symbols are exactly invariant.
        val drainLb = scala.collection.mutable.HashMap.empty[String, Double]
        val mergedLbOf =
          scala.collection.mutable.HashMap.empty[String, Double]
        acc.foreach { c =>
          val mLb: Double = (if (c.l == c.r) (c.n + 1) / 2 else c.n).toDouble
          if (c.l == c.r) {
            drainLb(c.l) = math.max(1L, c.cl - 2 * c.n).toDouble
            mergedLbOf(c.l) = mLb
          } else {
            drainLb(c.l) = math.max(1L, c.cl - c.n).toDouble
            drainLb(c.r) = math.max(1L, c.cr - c.n).toDouble
            mergedLbOf(c.l) = mLb
            mergedLbOf(c.r) = mLb
          }
        }
        def cOf(sym: String): Double = symCount(sym).toDouble
        def rlb(sym: String): Double = drainLb.getOrElse(sym, cOf(sym))
        def minlb(sym: String): Double =
          math.min(rlb(sym), mergedLbOf.getOrElse(sym, Double.MaxValue))
        // threat bound for a fetched old pair under EVERY post-merge
        // variant (residual symbols or sides mapped onto merged symbols):
        // the variant's count is <= n(a,b) (occurrence mapping) and also
        // <= each side's count, so its score is <= 1/max(side counts)
        def threat(c: Cand): Double = math.min(
          c.n.toDouble / (minlb(c.l) * minlb(c.r)),
          1.0 / math.max(minlb(c.l), minlb(c.r)))
        val tailScore: Double =
          if (cands.length == prefix) cands.last.score else -1.0
        // residual-side inflation ratio for unfetched pairs
        val rd = (1.0 +: acc.toSeq.flatMap(c =>
          Seq(cOf(c.l) / rlb(c.l), cOf(c.r) / rlb(c.r)))).max
        // tail terms (a full fetch means unfetched pairs exist, each with
        // original score <= tailScore): residual pairs inflate at most rd
        // per side; pairs mapping into merge j's new symbol are capped
        // both through their source score and by 1/c(m_j)
        val tailResidual =
          if (tailScore < 0) -1.0 else tailScore * rd * rd
        def tailNew(j: Int): Double =
          if (tailScore < 0) -1.0
          else {
            val c = acc(j)
            val mLb = mergedLbOf(c.l)
            math.min(
              tailScore * rd * (math.max(cOf(c.l), cOf(c.r)) / mLb),
              1.0 / mLb)
          }
        // ob(j): max score a merge of acc(j) can create or inflate
        val ob = Array.tabulate(acc.length) { j =>
          val a = acc(j)
          val syms = Set(a.l, a.r)
          var b = math.max(tailResidual, tailNew(j))
          // a self-merge (l = r) leaves residual and self-mapped pairs
          // of its own occurrence set; a distinct-sided merge consumes
          // every (l, r) adjacency, so its own pair poses no threat
          if (a.l == a.r) b = math.max(b, threat(a))
          cands.foreach { c =>
            if ((c.l != a.l || c.r != a.r) && (syms(c.l) || syms(c.r)))
              b = math.max(b, threat(c))
          }
          b
        }
        // keep the longest prefix where each pick strictly dominates
        // everything merges of EARLIER accepted picks can produce
        var runMax = Double.NegativeInfinity
        var keep = acc.length
        var j = 0
        while (j < acc.length && keep == acc.length) {
          if (j > 0 && acc(j).score <= runMax) keep = j
          else runMax = math.max(runMax, ob(j))
          j += 1
        }
        acc.takeInPlace(math.max(1, keep))
        acc.foreach { c =>
          step += 1
          learned += ((step, c.l, c.r, c.m, c.n, c.cl, c.cr))
        }
        // apply the whole accepted batch in ONE narrow typed map, each
        // merge greedily left-to-right in batch order — the sequential
        // semantics exactly
        val batch = acc.toArray.map(c => (c.l, c.r, c.m))
        vocab = vocab.as[(String, Long, Seq[String])]
          .map { case (w, c, t0) =>
            var t = t0
            batch.foreach { case (l, r, m) => t = mergeOnce(t, l, r, m) }
            (w, c, t)
          }
          .toDF("word", "cnt", "toks").localCheckpoint(true)
      }
    }
    (learned.result(), vocab, rounds)
  }

  /** PRODUCTION-regime trainer, mirroring [[Bpe.trainInMemory]]: ONE
    * corpus pass aggregates the word-frequency table (vocabulary-bounded
    * — the sufficient statistic every published WordPiece/BPE trainer
    * collects), then the merge loop runs in driver memory at map-update
    * speed, so a 30k-piece production run pays ZERO per-merge
    * driver<->cluster round-trips. This matters more for WordPiece than
    * for BPE: the likelihood score n/(cl·cr) makes freshly-created
    * symbols (small counts, small denominators) jump the candidate
    * queue, so consecutive sequential picks share a symbol ~60% of the
    * time on real corpora (measured in WordPieceBatchSpec) — a
    * symbol-disjoint exact batcher is structurally capped near 1-2
    * merges/round, and the in-memory path is the one that removes the
    * round-trips. Exact — identical merge table to trainRounds and the
    * oracle — whenever the distinct word count fits `maxVocab`; past
    * that the frequency table drops its tail first ((cnt DESC, word),
    * the published frequency-truncation practice). The loop recounts
    * pairs per merge; a heap-with-delta-updates drops that to
    * O(merges log vocab) without changing the learned table.
    * Returns (learned, final vocab (word, cnt, toks), distinctWords). */
  private[graft] def trainInMemory(s: SparkSession, tokens: DataFrame,
                                   merges: Int, maxVocab: Int = 1 << 22)
      : (Seq[(Int, String, String, String, Long, Long, Long)], DataFrame,
         Long) = {
    import s.implicits._
    val wordRows = tokens.filter(length(col("tok")) > 0)
      .groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab)
      .as[(String, Long)].collect()
    var v: Array[(Vector[String], Long)] = wordRows.map { case (w, c) =>
      (w.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else "##" + ch
      }.toVector, c)
    }
    val learned =
      Seq.newBuilder[(Int, String, String, String, Long, Long, Long)]
    var step = 0
    var done = false
    while (step < merges && !done) {
      val sym = scala.collection.mutable.HashMap.empty[String, Long]
      val pair =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      v.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length) {
          sym.update(toks(i), sym.getOrElse(toks(i), 0L) + c)
          if (i < toks.length - 1) {
            val k = (toks(i), toks(i + 1))
            pair.update(k, pair.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (pair.isEmpty) done = true
      else {
        // unique max by the identical IEEE double score, ties on (l, r)
        val ((l, r), n) = pair.minBy { case ((pl, pr), pn) =>
          (-(pn.toDouble / (sym(pl).toDouble * sym(pr).toDouble)), pl, pr)
        }
        val m = l + stripCont(r)
        step += 1
        learned += ((step, l, r, m, n, sym(l), sym(r)))
        v = v.map { case (toks, c) => (mergeOnce(toks, l, r, m).toVector, c) }
      }
    }
    val vocabDf = v.toSeq
      .map { case (toks, c) =>
        (toks.map(stripCont).mkString, c, toks)
      }
      .toDF("word", "cnt", "toks")
    (learned.result(), vocabDf, wordRows.length.toLong)
  }

  /** Train `merges` WordPiece merges; the learned merge table with its
    * integer score evidence (step, l, r, merged, n, cl, cr). */
  def train(s: SparkSession, tokens: DataFrame, merges: Int): DataFrame = {
    import s.implicits._
    trainRounds(s, tokens, merges)._1
      .toDF("step", "l", "r", "merged", "n", "cl", "cr")
      .orderBy("step")
  }

  /** Tokenizer APPLICATION artifact: the final vocab after `merges`
    * rounds — every distinct word with its learned pieces (## prefixes
    * retained, the standard WordPiece display) and piece count.
    * Vocabulary-sized: broadcast-joins onto a 100 TB token stream. */
  def encodeVocab(s: SparkSession, tokens: DataFrame, merges: Int)
      : DataFrame =
    trainRounds(s, tokens, merges)._2
      .select(col("word"), col("cnt"),
        array_join(col("toks"), " ").as("pieces"),
        size(col("toks")).as("n_pieces"))

  /** Greedy LONGEST-MATCH-FIRST segmentation — the actual WordPiece
    * runtime algorithm BERT ships (maximal munch against the trained
    * piece vocabulary), which is NOT the same as replaying the merges:
    * a longer piece wins even when training would have built the word
    * through different intermediate merges. `vocab` holds tagged
    * symbols (`x`, `##y`); single characters are always present (the
    * base alphabet), so segmentation cannot fail on in-corpus words —
    * the [UNK] branch guards out-of-alphabet input. */
  def longestMatch(word: String, vocab: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > pos) {
        val cand =
          (if (pos == 0) "" else "##") + word.substring(pos, end)
        if (vocab(cand)) found = cand else end -= 1
      }
      if (found == null) return Seq("[UNK]")
      out += found
      pos = end
    }
    out.toSeq
  }

  /** Tokenizer RUNTIME application over the corpus word table: train
    * `merges` rounds, build the runtime piece vocabulary (the base
    * ##-tagged alphabet ∪ the learned merged symbols — exactly the
    * pieces a WordPiece trainer emits to its vocab file), and segment
    * every distinct word by longest match. The piece vocabulary is
    * alphabet+merges-sized — a broadcast set — so application is one
    * narrow pass over the word-frequency table (and would broadcast-
    * join onto a 100 TB token stream the same way). */
  def applyLongestMatch(s: SparkSession, tokens: DataFrame, merges: Int)
      : DataFrame = {
    val (learned, vocab) = trainRounds(s, tokens, merges)
    applyFrom(s, learned, vocab)
  }

  /** [[applyLongestMatch]] over an already-trained (learned, vocab) —
    * lets the query layer reuse one cached training across entries. */
  private[graft] def applyFrom(s: SparkSession,
      learned: Seq[(Int, String, String, String, Long, Long, Long)],
      vocab: DataFrame): DataFrame = {
    import s.implicits._
    // base alphabet (tagged) from the trained vocab's own words +
    // merged symbols — a bounded collect (|alphabet|·2 + merges rows)
    val baseSyms = vocab.select(explode(expr(
      "transform(sequence(1, length(word)), i -> " +
        "CASE WHEN i = 1 THEN substring(word, i, 1) " +
        "ELSE '##' || substring(word, i, 1) END)")).as("sym"))
      .distinct().as[String].collect().toSet
    val pieceSet = baseSyms ++ learned.map(_._4)
    val bc = s.sparkContext.broadcast(pieceSet)
    vocab.select(col("word"), col("cnt")).as[(String, Long)]
      .map { case (w, c) =>
        val pieces = longestMatch(w, bc.value)
        (w, c, pieces.mkString(" "), pieces.length)
      }
      .toDF("word", "cnt", "pieces", "n_pieces")
      .orderBy("word")
  }

  /** The runtime piece VOCABULARY as a DataFrame — the artifact a
    * WordPiece trainer ships (the vocab file): the corpus' ##-tagged
    * base alphabet ∪ the learned merged symbols. Together with
    * [[longestMatch]] this is everything the runtime needs, so it is
    * the restart-critical thing to persist. */
  private[graft] def pieceVocabFrom(s: SparkSession,
      learned: Seq[(Int, String, String, String, Long, Long, Long)],
      vocab: DataFrame): DataFrame = {
    import s.implicits._
    vocab.select(explode(expr(
      "transform(sequence(1, length(word)), i -> " +
        "CASE WHEN i = 1 THEN substring(word, i, 1) " +
        "ELSE '##' || substring(word, i, 1) END)")).as("piece"))
      .union(learned.map(_._4).toDF("piece"))
      .distinct()
  }

  /** DuckDB replay of the piece vocabulary (the applyChain `pieces`
    * CTE projected to its symbols). */
  def piecesOracleSql(merges: Int, toksSql: String): String =
    s"""${applyChain(merges, toksSql)}
       |SELECT sym AS piece FROM pieces ORDER BY piece""".stripMargin

  /** The apply-side WITH chain shared by [[applyOracleSql]] and
    * [[applyDocsOracleSql]]: the training chain, the piece vocabulary
    * (v0 symbols ∪ t1..t$merges merged symbols), and `seg` — per word an
    * iterative recursive-CTE segmentation picking the LONGEST matching
    * piece at each position (maximal munch), position-tag-aware. */
  private def applyChain(merges: Int, toksSql: String): String = {
    val mergedSyms = (1 to merges)
      .map(i => s"SELECT m AS sym FROM t$i").mkString("\nUNION\n")
    s"""${oracleChain(merges, toksSql)},
       |words AS (SELECT word, cnt FROM v0),
       |pieces AS (
       |  SELECT DISTINCT sym,
       |    sym LIKE '##%' AS cont,
       |    CASE WHEN sym LIKE '##%' THEN substr(sym, 3) ELSE sym END
       |      AS txt
       |  FROM (
       |    SELECT unnest(list_transform(generate_series(1, length(word)),
       |      i -> CASE WHEN i = 1 THEN substr(word, i, 1)
       |           ELSE '##' || substr(word, i, 1) END)) AS sym
       |    FROM words
       |    UNION
       |    $mergedSyms)),
       |seg AS (
       |  WITH RECURSIVE st(word, pos, n, ps) AS (
       |    SELECT word, 1, 0, '' FROM words
       |    UNION ALL
       |    SELECT s.word, s.pos + length(v.txt), s.n + 1,
       |      CASE WHEN s.ps = '' THEN v.sym ELSE s.ps || ' ' || v.sym END
       |    FROM st s JOIN pieces v
       |      ON substr(s.word, s.pos, length(v.txt)) = v.txt
       |      AND (s.pos > 1) = v.cont
       |    WHERE s.pos <= length(s.word)
       |      AND NOT EXISTS (
       |        SELECT 1 FROM pieces v2
       |        WHERE length(v2.txt) > length(v.txt)
       |          AND substr(s.word, s.pos, length(v2.txt)) = v2.txt
       |          AND (s.pos > 1) = v2.cont))
       |  SELECT word, n, ps FROM st WHERE pos = length(word) + 1)""".stripMargin
  }

  /** DuckDB replay of `applyLongestMatch`. */
  def applyOracleSql(merges: Int, toksSql: String): String =
    s"""${applyChain(merges, toksSql)}
       |SELECT w.word, w.cnt, seg.ps AS pieces,
       |  CAST(seg.n AS INT) AS n_pieces
       |FROM words w JOIN seg ON seg.word = w.word
       |ORDER BY w.word""".stripMargin

  /** DuckDB replay of corpus-width APPLICATION: the doc-level token
    * stream joined to the per-word longest-match segmentation, per-doc
    * word and piece counts. `docToksSql` must yield (doc_id, tok). */
  def applyDocsOracleSql(merges: Int, toksSql: String,
                         docToksSql: String): String =
    s"""${applyChain(merges, toksSql)},
       |dt AS ($docToksSql)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(seg.n) AS BIGINT) AS n_pieces
       |FROM dt JOIN seg ON seg.word = dt.tok
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB replay of the training loop: v0 (##-tagged char split) then
    * per round sym$i (symbol counts) / p$i (pair counts) / t$i (winner
    * by the identical IEEE double score, ties on (l, r)) / v$i (merged
    * vocab via the string-accumulator left fold). */
  private def oracleChain(merges: Int, toksSql: String): String = {
    val sep = "chr(31)"
    def round(i: Int): String =
      s"""sym$i AS MATERIALIZED (
         |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS sc
         |  FROM (SELECT unnest(string_split(s, $sep)) AS sym, cnt
         |        FROM v${i - 1})
         |  GROUP BY sym),
         |p$i AS MATERIALIZED (
         |  SELECT t[j] AS l, t[j+1] AS r, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(s, $sep) AS t, cnt FROM v${i - 1}),
         |    LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS j)
         |  GROUP BY 1, 2),
         |t$i AS MATERIALIZED (
         |  SELECT l, r,
         |    l || CASE WHEN r LIKE '##%' THEN substr(r, 3) ELSE r END AS m,
         |    n, cl, cr
         |  FROM (
         |    SELECT p.l, p.r, p.n, sl.sc AS cl, sr.sc AS cr
         |    FROM p$i p
         |    JOIN sym$i sl ON sl.sym = p.l
         |    JOIN sym$i sr ON sr.sym = p.r)
         |  ORDER BY CAST(n AS DOUBLE) /
         |    (CAST(cl AS DOUBLE) * CAST(cr AS DOUBLE)) DESC, l, r
         |  LIMIT 1),
         |v$i AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_reduce(list_prepend('', string_split(s, $sep)),
         |      (acc, x) -> CASE
         |        WHEN acc = '' THEN x
         |        WHEN regexp_extract(acc, '[^' || $sep || ']*$$') = t.l
         |          AND x = t.r
         |        THEN substr(acc, 1, length(acc) - length(t.l)) || t.m
         |        ELSE acc || $sep || x END) AS s
         |  FROM v${i - 1} LEFT JOIN t$i t ON TRUE)""".stripMargin
    val rounds = (1 to merges).map(round).mkString(",\n")
    s"""WITH toks AS ($toksSql),
       |v0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |    array_to_string(list_transform(generate_series(1, length(word)),
       |      i -> CASE WHEN i = 1 THEN substr(word, i, 1)
       |           ELSE '##' || substr(word, i, 1) END), $sep) AS s
       |  FROM (SELECT tok AS word, count(*) AS cnt FROM toks
       |        WHERE length(tok) > 0 GROUP BY tok)),
       |$rounds""".stripMargin
  }

  /** DuckDB replay of `train`. */
  def oracleSql(merges: Int, toksSql: String): String = {
    val out = (1 to merges)
      .map(i => s"SELECT $i AS step, l, r, m AS merged, n, cl, cr FROM t$i")
      .mkString("\nUNION ALL\n")
    s"""${oracleChain(merges, toksSql)}
       |SELECT CAST(step AS INT) AS step, l, r, merged, n, cl, cr FROM (
       |$out)
       |ORDER BY step""".stripMargin
  }

  /** DuckDB replay of `encodeVocab`. */
  def encodeOracleSql(merges: Int, toksSql: String): String =
    s"""${oracleChain(merges, toksSql)}
       |SELECT word, cnt, replace(s, chr(31), ' ') AS pieces,
       |  CAST(len(string_split(s, chr(31))) AS INT) AS n_pieces
       |FROM v$merges""".stripMargin
}
