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

  /** One greedy left-to-right merge of (l, r) -> m over a symbol array:
    * fold symbols, replacing a trailing `l` by `m` when `r` arrives. */
  private def mergePair(toks: Column, l: String, r: String, m: String)
      : Column =
    aggregate(toks, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, size(acc)) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
        .otherwise(concat(acc, array(x))))

  /** Run the merge-training loop: returns the learned merge rows AND the
    * final vocab (word, cnt, toks) with every merge applied. Exposed to
    * graft so the query layer can cache one training per corpus (the
    * trained tokenizer is an index artifact, same as PQ codebooks). */
  private[graft] def trainRounds(s: SparkSession, tokens: DataFrame,
                                 merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    // Empty tokens (a \s+ tokenizer emits them on leading whitespace)
    // carry no pairs, and sequence(1, 0) would yield a descending [1,0]
    // range — drop them before the char-split, mirrored in the oracle.
    var vocab = tokens.filter(length(col("tok")) > 0)
      .groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("toks", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .select("word", "cnt", "toks")
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to merges) {
      val top = vocab
        .select(col("cnt"), explode(pairs(col("toks"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val m = l + r
        learned += ((step, l, r, m, n))
        vocab = vocab
          .withColumn("toks", mergePair(col("toks"), l, r, m))
          .localCheckpoint(true)
      }
    }
    (learned.result(), vocab)
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

  /** The encodeVocab projection over an already-trained final vocab. */
  private[graft] def encodedFrom(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("cnt"),
      array_join(col("toks"), " ").as("pieces"),
      size(col("toks")).as("n_pieces"))

  /** DuckDB replay of the training loop as a WITH-clause body: v0
    * (char-split vocab) then per round p$i (pair counts) / t$i (winner) /
    * v$i (merged vocab via a string-accumulator left fold, semantically
    * identical to mergePair's array fold). Suffix a final SELECT over
    * t1..t$merges (train) or v$merges (encode). */
  private def oracleChain(merges: Int, toksSql: String): String = {
    val sep = "chr(31)"
    def round(i: Int): String =
      s"""p$i AS (
         |  SELECT t[j] AS l, t[j+1] AS r, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(s, $sep) AS t, cnt FROM v${i - 1}),
         |    LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS j)
         |  GROUP BY 1, 2),
         |t$i AS (
         |  SELECT l, r, l || r AS m, n FROM p$i
         |  ORDER BY n DESC, l, r LIMIT 1),
         |v$i AS (
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
       |v0 AS (
       |  SELECT word, cnt,
       |    array_to_string(list_transform(generate_series(1, length(word)),
       |      i -> substr(word, i, 1)), $sep) AS s
       |  FROM (SELECT tok AS word, count(*) AS cnt FROM toks
       |        WHERE length(tok) > 0 GROUP BY tok)),
       |$rounds""".stripMargin
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
