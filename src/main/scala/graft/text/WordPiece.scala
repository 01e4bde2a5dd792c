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

  /** Run `merges` WordPiece training rounds over the corpus token
    * stream. Returns (learned rows (step, l, r, merged, n, cl, cr),
    * final vocab (word, cnt, toks)). */
  private[graft] def trainRounds(s: SparkSession, tokens: DataFrame,
                                 merges: Int)
      : (Seq[(Int, String, String, String, Long, Long, Long)], DataFrame) = {
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
    var exhausted = false
    while (step < merges && !exhausted) {
      val sym = vocab
        .select(col("cnt"), explode(col("toks")).as("sym"))
        .groupBy("sym").agg(sum(col("cnt")).as("sc"))
      val top = vocab
        .select(col("cnt"), explode(pairs(col("toks"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .join(sym.select(col("sym").as("l"), col("sc").as("cl")), Seq("l"))
        .join(sym.select(col("sym").as("r"), col("sc").as("cr")), Seq("r"))
        .withColumn("score", col("n").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double")))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1)
        .select("l", "r", "n", "cl", "cr")
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (l, r) = (row.getString(0), row.getString(1))
        val m = l + stripCont(r)
        step += 1
        learned += ((step, l, r, m,
          row.getLong(2), row.getLong(3), row.getLong(4)))
        vocab = vocab.as[(String, Long, Seq[String])]
          .map { case (w, c, t) => (w, c, mergeOnce(t, l, r, m)) }
          .toDF("word", "cnt", "toks").localCheckpoint(true)
      }
    }
    (learned.result(), vocab)
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

  /** DuckDB replay of `applyLongestMatch`: the same piece vocabulary
    * (v0 symbols ∪ t1..t$merges merged symbols), then per word an
    * iterative recursive-CTE segmentation picking the LONGEST matching
    * piece at each position (maximal munch), position-tag-aware. */
  def applyOracleSql(merges: Int, toksSql: String): String = {
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
       |  SELECT word, n, ps FROM st WHERE pos = length(word) + 1)
       |SELECT w.word, w.cnt, seg.ps AS pieces,
       |  CAST(seg.n AS INT) AS n_pieces
       |FROM words w JOIN seg ON seg.word = w.word
       |ORDER BY w.word""".stripMargin
  }

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
         |  FROM v${i - 1} CROSS JOIN t$i t)""".stripMargin
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
