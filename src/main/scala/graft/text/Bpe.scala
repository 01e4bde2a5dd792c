package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-training step of an
  * LLM data pipeline, as a deterministic distributed algorithm.
  *
  * The classic trainer (Sennrich et al. 2016) iterates on the WORD
  * FREQUENCY TABLE, not the corpus: one corpus pass aggregates (word,
  * count), then every merge round counts adjacent symbol pairs weighted by
  * word count, picks the most frequent pair (ties: lexicographically
  * smallest), and greedily merges it left-to-right inside each word's
  * symbol sequence. All per-round work here is vocab-bounded Spark jobs —
  * a groupBy over exploded pairs and a map-side fold applying the merge —
  * and only the (l, r) winner row ever reaches the driver, so the shape
  * survives a 100 TB corpus whose vocabulary still fits a shuffle.
  *
  * Determinism: integer pair counts, (count DESC, l, r) tie-break, and a
  * left-to-right greedy fold — the DuckDB oracle replays every round with
  * the same rules (string-accumulator list_reduce) and matches exactly.
  */
object Bpe {

  /** Adjacent (l, r) symbol pairs of a toks array column. */
  private def pairs(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** One greedy left-to-right merge of (l, r) -> m over one word's
    * symbol sequence — the inner step every tier (batched trainer,
    * in-memory trainer, oracle's list_reduce) agrees on. */
  private def mergeOnce(toks: Seq[String], l: String, r: String,
                        m: String): Seq[String] = {
    val acc = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    toks.foreach { x =>
      if (acc.nonEmpty && acc.last == l && x == r) acc(acc.length - 1) = m
      else acc += x
    }
    acc.toSeq
  }

  /** Sorted candidate pairs fetched per round — ADAPTIVE: scales with
    * the remaining merge budget (a deeper fetch lets the dominance rule
    * certify deeper batches because fewer rounds hit the unknown-tail
    * floor), floored at 512 and capped at 8192 rows (8-byte counts +
    * short symbol strings — a few hundred KB of driver traffic at
    * worst). Batch size itself needs no constant cap: acceptance is
    * bounded by the provable prefix/dominance rules and by the fetch
    * length, and merge application is a single typed map per round
    * (depth-independent), not a nested Catalyst fold. */
  private def candidatePrefix(want: Int): Int =
    math.min(8192, math.max(512, 4 * want))

  /** Run the merge-training loop: returns the learned merge rows AND the
    * final vocab (word, cnt, toks) with every merge applied. Exposed to
    * graft so the query layer can cache one training per corpus (the
    * trained tokenizer is an index artifact, same as PQ codebooks). */
  private[graft] def trainRounds(s: SparkSession, tokens: DataFrame,
                                 merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val (learned, vocab, _) = trainRoundsBatched(s, tokens, merges)
    (learned, vocab)
  }

  /** BATCHED merge training, bit-identical to the classic sequential
    * algorithm (= what `oracleSql` replays and the in-memory reference in
    * BpeBatchSpec computes) but applying many merges per Spark round, so
    * driver round-trip count is ~merges/batch instead of merges — the
    * production regime (10k+ merges) stops being driver-latency-bound.
    *
    * A round fetches the sorted pair-count prefix once and accepts a
    * batch that provably reproduces the sequential picks:
    *  - PREFIX rule: accept p_1..p_k as a contiguous prefix of the
    *    (n DESC, l, r) order, stopping at the first pair sharing any
    *    symbol (l, r, or the merged symbol l||r) with an accepted one.
    *    Disjointness makes accepted counts invariant under each other's
    *    merges (a merge only touches pairs involving its own symbols).
    *  - NEW-PAIR DOMINANCE rule: p_j stays in the batch only if its
    *    count strictly exceeds every pair a merge of p_1..p_{j-1} can
    *    CREATE. A created pair maps occurrence-for-occurrence onto an
    *    old pair sharing a symbol with the creating merge (x,m_i comes
    *    from x,l_i; m_i,y from r_i,y; chains of created symbols bottom
    *    out the same way; a self-pair l_i=r_i can seed l_i,m_i pairs
    *    bounded by its own count), so the bound is the running max
    *    count of fetched pairs OVERLAPPING an earlier accepted pair
    *    (self-pairs add their own count; a full fetch adds the last
    *    fetched count as the unknown-tail floor). Old NON-accepted
    *    pairs can never win a round instead of p_j: merges never
    *    increase an old pair's count, every non-accepted pair sorts
    *    at-or-after the accepted prefix, and at equal count the
    *    (l, r) tie-break keeps favoring p_j.
    * A batch cut to nothing keeps p_1 alone (the literal sequential
    * pick — always exact, ties included). Applied merges fold
    * left-to-right per word in batch order, one checkpoint per ROUND. */
  private[graft] def trainRoundsBatched(s: SparkSession, tokens: DataFrame,
                                        merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame, Int) = {
    // Empty tokens (a \s+ tokenizer emits them on leading whitespace)
    // carry no pairs, and sequence(1, 0) would yield a descending [1,0]
    // range — drop them before the char-split, mirrored in the oracle.
    trainLoopBatched(s, tokens.filter(length(col("tok")) > 0)
      .groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("cnt")), merges)
  }

  /** The batched merge loop over a PRE-AGGREGATED (word, cnt) frequency
    * table. Training is a deterministic function of the frequency table
    * alone (the classic trainer's sufficient statistic), which is what
    * makes BPE retraining incremental: committed base counts fold
    * additively with a delta-only pass and the loop runs on the folded
    * table — `tok_bpe_retrain`'s path. Identical merge rows to
    * `trainRoundsBatched` whenever `counts` equals the corpus groupBy. */
  private[graft] def trainRoundsFromCounts(s: SparkSession,
                                           counts: DataFrame, merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val (learned, vocab, _) = trainLoopBatched(s, counts, merges)
    (learned, vocab)
  }

  private def trainLoopBatched(s: SparkSession, counts: DataFrame,
                               merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame, Int) = {
    var vocab = counts
      .withColumn("toks", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .select("word", "cnt", "toks")
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 0
    var rounds = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      rounds += 1
      val want = merges - step
      val prefix = candidatePrefix(want)
      val top = vocab
        .select(col("cnt"), explode(pairs(col("toks"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(prefix).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val acc = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        var i = 0
        var stopped = false
        while (!stopped && i < top.length && acc.size < want) {
          val (l, r, n) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          val m = l + r
          if (acc.isEmpty || (!used(l) && !used(r) && !used(m))) {
            acc += ((l, r, n)); used += l; used += r; used += m; i += 1
          } else stopped = true
        }
        // Per-accepted-pair bound on pairs its merge can create: the max
        // count among fetched pairs overlapping its symbols (plus its own
        // count for a self-pair, plus the last fetched count as the
        // unknown-tail floor when the fetch prefix came back full).
        val tailFloor: Long =
          if (top.length == prefix) top(prefix - 1).getLong(2)
          else -1L
        val ob = Array.tabulate(acc.length) { j =>
          val (l, r, n) = acc(j)
          val syms = Set(l, r, l + r)
          var b = if (l == r) math.max(tailFloor, n) else tailFloor
          var t = 0
          while (t < top.length) {
            val (tl, tr) = (top(t).getString(0), top(t).getString(1))
            if ((tl != l || tr != r) && (syms(tl) || syms(tr)))
              b = math.max(b, top(t).getLong(2))
            t += 1
          }
          b
        }
        // keep the longest prefix where each pair strictly dominates
        // everything merges of EARLIER accepted pairs can create
        var runMax = Long.MinValue
        var keep = acc.length
        var j = 0
        while (j < acc.length && keep == acc.length) {
          if (j > 0 && acc(j)._3 <= runMax) keep = j
          else runMax = math.max(runMax, ob(j))
          j += 1
        }
        acc.takeInPlace(math.max(1, keep))
        acc.foreach { case (l, r, n) =>
          step += 1
          learned += ((step, l, r, l + r, n))
        }
        // apply the whole accepted batch in ONE narrow typed map (depth-
        // independent — the old nested-Catalyst-fold path capped batches
        // at expression-tree depth), each merge greedily left-to-right
        // in batch order, exactly the sequential semantics
        val batch = acc.toArray.map { case (l, r, _) => (l, r, l + r) }
        import s.implicits._
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

  /** PRODUCTION-regime trainer: ONE corpus pass aggregates the word-
    * frequency table (vocabulary-bounded — the classic Sennrich setup),
    * then the merge loop runs in driver memory at map-update speed, so a
    * 10k-merge production run pays zero per-merge driver<->cluster
    * round-trips (how SentencePiece / HF tokenizers train: corpus pass,
    * then in-memory BPE over word counts). Exact — identical merge table
    * to trainRounds and the sequential oracle — whenever the distinct
    * word count fits `maxVocab`; past that the frequency table drops its
    * tail first ((cnt DESC, word) — the published frequency-truncation
    * practice) and training is the exact sequential run over the kept
    * table. The loop below recounts pairs per merge (fine to ~1k merges
    * x ~100k words); a heap-with-delta-updates drops that to the classic
    * O(merges log vocab) without changing the learned table.
    * Returns (learned, final vocab as (word, cnt, toks), distinctWords). */
  private[graft] def trainInMemory(s: SparkSession, tokens: DataFrame,
                                   merges: Int, maxVocab: Int = 1 << 22)
      : (Seq[(Int, String, String, String, Long)], DataFrame, Long) = {
    import s.implicits._
    val wordRows = tokens.filter(length(col("tok")) > 0)
      .groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab)
      .as[(String, Long)].collect()
    var v: Array[(Vector[String], Long)] =
      wordRows.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 0
    var done = false
    while (step < merges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      v.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val k = (toks(i), toks(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // unique (count DESC, l, r) minimum — iteration-order-proof
        val ((l, r), n) = counts.minBy { case ((pl, pr), pn) =>
          (-pn, pl, pr)
        }
        step += 1
        learned += ((step, l, r, l + r, n))
        v = v.map { case (toks, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          toks.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc(acc.length - 1) = l + r
            else acc += x
          }
          (acc.toVector, c)
        }
      }
    }
    val vocabDf = v.toSeq
      .map { case (toks, c) => (toks.mkString, c, toks) }
      .toDF("word", "cnt", "toks")
    (learned.result(), vocabDf, wordRows.length.toLong)
  }

  /** Train `merges` BPE merges over the corpus token stream.
    * Returns (step, l, r, merged, n) — the learned merge table. */
  def train(s: SparkSession, tokens: DataFrame, merges: Int): DataFrame = {
    import s.implicits._
    trainRounds(s, tokens, merges)._1
      .toDF("step", "l", "r", "merged", "n")
      .orderBy("step")
  }

  /** Tokenizer APPLICATION artifact: the final vocab after `merges`
    * rounds — every distinct word with its learned subword pieces and
    * piece count. This table is what a pipeline ships to tokenize the
    * corpus: vocabulary-sized, so it broadcast-joins onto a 100 TB token
    * stream (one narrow pass per document) instead of re-running the
    * merge fold per occurrence. */
  def encodeVocab(s: SparkSession, tokens: DataFrame, merges: Int)
      : DataFrame =
    encodedFrom(trainRounds(s, tokens, merges)._2)

  /** Apply an ORDERED merge list to one word: char-split, then each
    * merge folded left-to-right — the runtime that re-creates the
    * trained segmentation from a LOADED merge-table artifact (the
    * restart path: the merge table is what a BPE trainer ships). On the
    * training corpus this reproduces the trained vocab's segmentation
    * exactly, because training applies the same fold per round. */
  private[graft] def applyMergeList(word: String,
      merges: Seq[(String, String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (toks, (l, r, m)) => mergeOnce(toks, l, r, m)
    }

  /** The encodeVocab projection over an already-trained final vocab. */
  private[graft] def encodedFrom(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("cnt"),
      array_join(col("toks"), " ").as("pieces"),
      size(col("toks")).as("n_pieces"))

  /** DuckDB replay of the training loop as a WITH-clause body: v0
    * (char-split vocab) then per round p$i (pair counts) / t$i (winner) /
    * v$i (merged vocab via a string-accumulator left fold, semantically
    * identical to the trainer's mergeOnce fold). Suffix a final SELECT over
    * t1..t$merges (train) or v$merges (encode). */
  private def oracleChain(merges: Int, toksSql: String,
                          pfx: String = ""): String = {
    val sep = "chr(31)"
    // MATERIALIZED: v$i and t$i are each referenced twice, and DuckDB
    // inlines plain CTEs per reference — an n-round chain would expand
    // 2^n times (the 8-round oracle survived that; 32 rounds cannot)
    def round(i: Int): String =
      s"""${pfx}p$i AS MATERIALIZED (
         |  SELECT t[j] AS l, t[j+1] AS r, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(s, $sep) AS t, cnt FROM ${pfx}v${i - 1}),
         |    LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS j)
         |  GROUP BY 1, 2),
         |${pfx}t$i AS MATERIALIZED (
         |  SELECT l, r, l || r AS m, n FROM ${pfx}p$i
         |  ORDER BY n DESC, l, r LIMIT 1),
         |${pfx}v$i AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_reduce(list_prepend('', string_split(s, $sep)),
         |      (acc, x) -> CASE
         |        WHEN acc = '' THEN x
         |        WHEN regexp_extract(acc, '[^' || $sep || ']*$$') = t.l
         |          AND x = t.r
         |        THEN substr(acc, 1, length(acc) - length(t.l)) || t.m
         |        ELSE acc || $sep || x END) AS s
         |  FROM ${pfx}v${i - 1} LEFT JOIN ${pfx}t$i t ON TRUE)""".stripMargin
    val rounds = (1 to merges).map(round).mkString(",\n")
    s"""WITH ${pfx}toks AS ($toksSql),
       |${pfx}v0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |    array_to_string(list_transform(generate_series(1, length(word)),
       |      i -> substr(word, i, 1)), $sep) AS s
       |  FROM (SELECT tok AS word, count(*) AS cnt FROM ${pfx}toks
       |        WHERE length(tok) > 0 GROUP BY tok)),
       |$rounds""".stripMargin
  }

  /** The training-replay CTE list as a COMPOSABLE fragment: no leading
    * WITH, every CTE name prefixed with `pfx` — for oracles that splice
    * the tokenizer replay into their own WITH chain (the corpus-build
    * composition; the prefix dodges name collisions with the caller's
    * CTEs). Trained winners land in `${pfx}t1..t$merges`, the final
    * vocab in `${pfx}v$merges`. */
  def oracleChainCtes(merges: Int, toksSql: String, pfx: String): String =
    oracleChain(merges, toksSql, pfx).stripPrefix("WITH ")

  /** Replay of `applyMergeList` over an ARBITRARY word set as CTEs
    * `${pfx}e0..e$merges`: char-split each word of `wordsSql` (one
    * `word` column), then fold the trained merges `${pfx}t1..t$merges`
    * in order with the exact list_reduce body training uses — how the
    * serve path segments words that may not be in the training vocab. */
  def applyMergesOracleCtes(merges: Int, wordsSql: String,
                            pfx: String): String = {
    val sep = "chr(31)"
    def round(i: Int): String =
      s"""${pfx}e$i AS MATERIALIZED (
         |  SELECT word,
         |    list_reduce(list_prepend('', string_split(s, $sep)),
         |      (acc, x) -> CASE
         |        WHEN acc = '' THEN x
         |        WHEN regexp_extract(acc, '[^' || $sep || ']*$$') = t.l
         |          AND x = t.r
         |        THEN substr(acc, 1, length(acc) - length(t.l)) || t.m
         |        ELSE acc || $sep || x END) AS s
         |  FROM ${pfx}e${i - 1} LEFT JOIN ${pfx}t$i t ON TRUE)""".stripMargin
    s"""${pfx}e0 AS MATERIALIZED (
       |  SELECT word,
       |    array_to_string(list_transform(generate_series(1, length(word)),
       |      i -> substr(word, i, 1)), $sep) AS s
       |  FROM ($wordsSql)),
       |${(1 to merges).map(round).mkString(",\n")}""".stripMargin
  }

  /** DuckDB replay of `train`. */
  def oracleSql(merges: Int, toksSql: String): String = {
    val out = (1 to merges)
      .map(i => s"SELECT $i AS step, l, r, m AS merged, n FROM t$i")
      .mkString("\nUNION ALL\n")
    s"""${oracleChain(merges, toksSql)}
       |SELECT CAST(step AS INT) AS step, l, r, merged, n FROM (
       |$out)
       |ORDER BY step""".stripMargin
  }

  /** DuckDB replay of `encodeVocab`: the final vocab v$merges, pieces
    * re-joined with spaces. */
  def encodeOracleSql(merges: Int, toksSql: String): String =
    s"""${oracleChain(merges, toksSql)}
       |SELECT word, cnt, replace(s, chr(31), ' ') AS pieces,
       |  CAST(len(string_split(s, chr(31))) AS INT) AS n_pieces
       |FROM v$merges""".stripMargin

  /** DuckDB replay of corpus APPLICATION: doc-level token stream joined
    * to the final vocab, per-doc word and subtoken counts. `docToksSql`
    * must yield (doc_id, tok). */
  def encodeDocsOracleSql(merges: Int, toksSql: String,
                          docToksSql: String): String =
    s"""${oracleChain(merges, toksSql)},
       |dt AS ($docToksSql)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(string_split(v.s, chr(31)))) AS BIGINT)
       |    AS n_subtokens
       |FROM dt JOIN v$merges v ON dt.tok = v.word
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
