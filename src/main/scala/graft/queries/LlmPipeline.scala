package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM training-data pipeline operators over documents/embeddings
  * (BASELINE.json north star): dedup family, similarity search, text
  * analysis, multimodal plumbing. Exact variants carry DuckDB oracles; the
  * probabilistic scale paths (MinHash-LSH, SimHash, hyperplane-LSH) are
  * rows-only here and consistency-tested against the exact variants in
  * LlmPipelineSpec. */
object LlmPipeline extends Serializable {

  private val ws = "\\s+"

  /** Exact dedup on normalized content (sorted distinct word bag),
    * grouping on the sha2 digest of the normalized string: identical
    * grouping, but the shuffle ships 32-byte keys instead of whole
    * documents. */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(sha2(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), ws)))), 256).as("key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")
      .orderBy("keep_id")

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents
      |GROUP BY array_to_string(list_sort(list_distinct(string_split_regex(text, '\s+'))), ' ')
      |ORDER BY keep_id""".stripMargin

  /** Blocked exact word-set Jaccard near-dup (oracle baseline; MinHash
    * below is the 100 TB path). Semantics: same-lang pairs whose distinct
    * word counts differ by at most 1 (necessary for j >= 0.95 at these doc
    * sizes) with Jaccard >= 0.95. Blocking: the b-side replicates to count
    * keys {n-1, n, n+1}, so the join is equi on (lang, count) — no
    * quadratic-in-lang pair blowup, and the distinct-token arrays are
    * computed once per doc, not per pair. */
  def dedupJaccardBlocked(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        array_sort(array_distinct(split(col("text"), ws))).as("ws"))
      .withColumn("n", size(col("ws")))
    val a = t.select(col("doc_id").as("a"), col("lang"),
      col("ws").as("wa"), col("n").as("na"))
    val b = t.select(col("doc_id").as("b"), col("lang"),
      col("ws").as("wb"), col("n").as("nb"))
      .withColumn("key", explode(array(col("nb") - 1, col("nb"), col("nb") + 1)))
    // |a∩b| via codegen'd merge walk; for distinct arrays |a∪b| = na+nb-i.
    // Integer-identical to array_intersect/array_union, ~5x cheaper.
    val i = graft.plans.SortedIntersect.size(col("wa"), col("wb"))
    val j = i.cast("double") / (col("na") + col("nb") - i).cast("double")
    a.join(b, Seq("lang"))
      .where(col("a") < col("b") && col("na") === col("key"))
      .select(col("a"), col("b"), round(j, 6).as("jaccard"))
      .where(col("jaccard") >= 0.95)
      .orderBy("a", "b")
  }

  val dedupJaccardBlockedSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |             list_distinct(string_split_regex(text, '\s+')) AS ws
      |           FROM documents)
      |SELECT a, b, jaccard FROM (
      |  SELECT a.doc_id AS a, b.doc_id AS b,
      |    round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
      |          CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE), 6) AS jaccard
      |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |   AND abs(len(a.ws) - len(b.ws)) <= 1
      |) WHERE jaccard >= 0.95
      |ORDER BY a, b""".stripMargin

  /** Near-dup clustering: connected components over the MinHash-LSH pair
    * graph (the bucketed scale path, provably equal to exact shingle
    * Jaccard ≥ 0.8 — see dedupMinhashLsh), labeling every document with
    * the smallest doc_id in its component: the canonical-document pick of
    * a dedup pipeline. Singletons keep their own id. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = dedupMinhashLsh(s, d).select("a", "b")
    val vertices = Tables.documents(s, d).select(col("doc_id").as("u"))
    Dedup.connectedComponents(vertices, pairs)
      .select(col("u").as("doc_id"), col("lbl").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Oracle: the exact shingle-Jaccard pair CTE (the MinHash oracle
    * twin), closed transitively with a recursive CTE (UNION dedups, so it
    * terminates), min label per vertex. */
  val dedupClustersSql: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |      ELSE list_distinct(list_transform(generate_series(1, len(t)-2),
      |             i -> array_to_string(t[i:i+2], ' '))) END AS s
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
      |pairs AS (
      |  SELECT a, b FROM (
      |    SELECT a.doc_id AS a, b.doc_id AS b,
      |      round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |            CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.8),
      |edges AS (SELECT a AS u, b AS v FROM pairs
      |          UNION ALL SELECT b, a FROM pairs),
      |reach(u, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v)
      |SELECT u AS doc_id, min(lbl) AS cluster_id
      |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin

  /** MinHash+LSH near-dup. Bands=32 × r=2 at threshold 0.8 makes the
    * per-true-pair miss probability ≤ (1-0.8²)^32 ≈ 6e-15, so the output
    * deterministically equals the exact all-pairs shingle-Jaccard ≥ 0.8
    * set — which the DuckDB oracle computes directly (quadratic at oracle
    * SF only; the Spark side stays bucketed at any scale). */
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashNearDups(s, Tables.documents(s, d),
      w = 3, k = 64, bands = 32, threshold = 0.8)

  /** Exact all-pairs shingle-Jaccard ≥ 0.8 — the oracle twin of the
    * MinHash-LSH pipeline (see minhashNearDups' equivalence contract). */
  val dedupMinhashLshSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |      ELSE list_distinct(list_transform(generate_series(1, len(t)-2),
      |             i -> array_to_string(t[i:i+2], ' '))) END AS s
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents))
      |SELECT a, b, jaccard FROM (
      |  SELECT a.doc_id AS a, b.doc_id AS b,
      |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |          CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.8 ORDER BY a, b""".stripMargin

  /** SimHash near-dup at Hamming ≤ 3 (4×16-bit chunk banding is
    * exhaustive by pigeonhole, so this is exact, not probabilistic). */
  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashNearDups(s, Tables.documents(s, d), maxDist = 3)

  /** Oracle: identical md5-chunk simhash per doc (64 ±1-majority sums over
    * exploded tokens), then the quadratic Hamming ≤ 3 — banding omitted
    * because it is exhaustive at this radius. */
  val dedupSimhashSql: String = {
    val hDefs = (0 until 4).map(j =>
      s"('0x'||substr(md5(tok),${j * 4 + 1},4))::INT AS h$j").mkString(",\n    ")
    val sums = (for (j <- 0 until 4; b <- 0 until 16) yield
      s"SUM(CASE WHEN (h$j >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s_${j}_$b")
      .mkString(",\n    ")
    val chunks = (0 until 4).map { j =>
      (0 until 16).map(b => s"(CASE WHEN s_${j}_$b > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ") + s" AS c$j"
    }.mkString(",\n    ")
    val ham = (0 until 4).map(j => s"bit_count(xor(a.c$j, b.c$j))").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    $hDefs
       |  FROM toks),
       |bits AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM th GROUP BY doc_id),
       |sigs AS (
       |  SELECT doc_id,
       |    $chunks
       |  FROM bits)
       |SELECT a.doc_id AS a, b.doc_id AS b, CAST($ham AS INT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE $ham <= 3
       |ORDER BY a, b""".stripMargin
  }

  /** Exact brute-force ANN: top-10 cosine neighbors of query vecs 0-4. */
  def annCosineTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    Similarity.bruteForceTopK(emb, queries, 10)
      .select("q_id", "vec_id", "sim", "rank")
  }

  val annCosineTopkSql: String =
    """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |q AS (SELECT vec_id AS q_id, e AS qe FROM t WHERE vec_id < 5),
      |sims AS (
      |  SELECT q.q_id, t.vec_id,
      |    round(list_dot_product(t.e, q.qe) /
      |      (sqrt(list_dot_product(t.e, t.e)) * sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
      |  FROM t CROSS JOIN q WHERE t.vec_id <> q.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM sims)
      |SELECT q_id, vec_id, sim, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Exact embedding near-dup pairs (cosine >= 0.35). */
  def embedNeardup(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.embeddings(s, d), 0.35)

  val embedNeardupSql: String =
    """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
      |SELECT a.vec_id AS a, b.vec_id AS b,
      |  round(list_dot_product(a.e, b.e) /
      |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
      |FROM t a JOIN t b ON a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.e, b.e) /
      |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.35
      |ORDER BY a, b""".stripMargin

  /** Hyperplane-LSH near-dup: count-derived signature width + radius-1
    * multi-probe (candidates ≡ Hamming(sig_a, sig_b) ≤ 1 in some table),
    * verified at cosine ≥ 0.35. Deterministic md5-derived planes make the
    * DuckDB oracle bit-identical. */
  def annLsh(s: SparkSession, d: String): DataFrame =
    Similarity.lshNearDupPairs(s, Tables.embeddings(s, d), 0.35,
      tables = 4, targetBucket = 16L)

  /** Oracle: same plane arithmetic via list_dot_product (proven
    * fold-order-identical to DotProductExpr by ann_cosine_topk), same
    * count-derived nbits, candidates as the closed-form Hamming ≤ 1
    * predicate (quadratic at oracle SF only). */
  val annLshSql: String =
    """WITH corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |params AS (
      |  SELECT least(16, greatest(4,
      |    CASE WHEN q <= 1 THEN 1 ELSE length(bin(q - 1)) END)) AS nbits
      |  FROM (SELECT CAST(ceil(count(*) / 16.0) AS BIGINT) AS q FROM corpus)),
      |planes AS (
      |  SELECT t, p, list_transform(generate_series(1, 64), i ->
      |    (('0x'||substr(md5('plane_'||t||'_'||p||'_'||i),1,13))::BIGINT::DOUBLE
      |      / 4503599627370496.0) * 2.0 - 1.0) AS pv
      |  FROM (SELECT unnest(generate_series(0, 3)) AS t)
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS p)),
      |sigs AS (
      |  SELECT c.vec_id, pl.t,
      |    sum(CASE WHEN list_dot_product(c.e, pl.pv) >= 0 THEN (1 << pl.p) ELSE 0 END) AS sig
      |  FROM corpus c CROSS JOIN planes pl, params
      |  WHERE pl.p < params.nbits
      |  GROUP BY c.vec_id, pl.t),
      |cand AS (
      |  SELECT DISTINCT sa.vec_id AS a, sb.vec_id AS b
      |  FROM sigs sa JOIN sigs sb ON sa.t = sb.t AND sa.vec_id < sb.vec_id
      |  WHERE bit_count(xor(sa.sig::INT, sb.sig::INT)) <= 1)
      |SELECT c.a, c.b,
      |  round(list_dot_product(ea.e, eb.e) /
      |    (sqrt(list_dot_product(ea.e, ea.e)) * sqrt(list_dot_product(eb.e, eb.e))), 6) AS sim
      |FROM cand c
      |JOIN corpus ea ON ea.vec_id = c.a
      |JOIN corpus eb ON eb.vec_id = c.b
      |WHERE round(list_dot_product(ea.e, eb.e) /
      |    (sqrt(list_dot_product(ea.e, ea.e)) * sqrt(list_dot_product(eb.e, eb.e))), 6) >= 0.35
      |ORDER BY a, b""".stripMargin

  /** IVF-style ANN: coarse-quantize to 16 deterministic cells, probe the
    * 4 best per query, exact-rank within probed lists — the
    * training-free inverted-file scale path next to brute force. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    Similarity.ivfTopK(emb, queries, k = 10)
      .select("q_id", "vec_id", "sim", "rank")
  }

  /** Oracle: identical centroid arithmetic via list_dot_product;
    * assignment = first maximum (list_position of list_max), probe rank
    * by (csim DESC, cell) — all deterministic in both engines. */
  val annIvfSql: String =
    """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |cents AS (
      |  SELECT c, list_transform(generate_series(1, 64), d ->
      |    (('0x'||substr(md5('cell_'||c||'_'||d),1,13))::BIGINT::DOUBLE
      |      / 4503599627370496.0) * 2.0 - 1.0) AS cv
      |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
      |sims AS (
      |  SELECT t.vec_id, c.c,
      |    list_dot_product(t.e, c.cv) / sqrt(list_dot_product(c.cv, c.cv)) AS s
      |  FROM t CROSS JOIN cents c),
      |simlists AS (
      |  SELECT vec_id, list(s ORDER BY c) AS sl FROM sims GROUP BY vec_id),
      |assigned AS (
      |  SELECT t.vec_id, t.e, sqrt(list_dot_product(t.e, t.e)) AS nrm,
      |    list_position(sl.sl, list_max(sl.sl)) - 1 AS cell
      |  FROM t JOIN simlists sl ON sl.vec_id = t.vec_id),
      |q AS (SELECT vec_id AS q_id, e AS qe,
      |        sqrt(list_dot_product(e, e)) AS qn
      |      FROM t WHERE vec_id < 5),
      |probes AS (
      |  SELECT q_id, qe, qn, c AS cell FROM (
      |    SELECT q.q_id, q.qe, q.qn, s.c, s.s,
      |      row_number() OVER (PARTITION BY q.q_id ORDER BY s.s DESC, s.c) AS pr
      |    FROM q JOIN sims s ON s.vec_id = q.q_id)
      |  WHERE pr <= 4),
      |cand AS (
      |  SELECT p.q_id, a.vec_id,
      |    round(list_dot_product(a.e, p.qe) / (a.nrm * p.qn), 6) AS sim
      |  FROM assigned a JOIN probes p ON a.cell = p.cell
      |  WHERE a.vec_id <> p.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT q_id, vec_id, sim, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Language-ID via marker-word scores, deterministic tie-break. */
  def textLangid(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("declared_lang"),
        TextAnalysis.langId(col("text")).as("detected_lang"))
      .orderBy("doc_id")

  val textLangidSql: String = {
    val scores = TextAnalysis.langMarkers.map { case (l, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(", ")
      l -> s"len(list_filter(string_split_regex(text, '\\s+'), t -> t IN ($inList)))"
    }
    val names = scores.map(_._1)
    // mirror the fold: a later lang wins only on strictly-greater score
    val cases = names.tail.reverse.map { l =>
      val prior = names.take(names.indexOf(l))
      val prevMax =
        if (prior.size == 1) s"s_${prior.head}"
        else s"greatest(${prior.map("s_" + _).mkString(", ")})"
      s"WHEN s_$l > $prevMax THEN '$l'"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS declared_lang,
       |    ${scores.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n    ")}
       |  FROM documents)
       |SELECT doc_id, declared_lang,
       |  CASE WHEN ${names.map("s_" + _).mkString(" + ")} = 0 THEN 'und'
       |    ${cases.mkString("\n    ")}
       |    ELSE '${names.head}' END AS detected_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring (rational arithmetic only — cross-engine stable). */
  def textQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val textQualitySql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS n,
      |    CAST(list_aggregate(list_transform(string_split_regex(text, '\s+'), t -> length(t)), 'sum') AS DOUBLE) AS sum_len,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t IN ('the','a','and','of','to','is','in'))) AS DOUBLE) AS stop
      |  FROM documents)
      |SELECT doc_id,
      |  round(least(sum_len / n, 10.0) / 10.0 * 0.2 + stop / n * 0.5 +
      |        least(n, 100.0) / 100.0 * 0.3, 6) AS quality
      |FROM t ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace + BPE-ish regex segmentation. */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.bpeishCount(col("text")).as("n_bpeish_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  val textTokensSql: String =
    """SELECT doc_id,
      |  len(string_split_regex(text, '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish_tokens,
      |  length(text) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus-statistics quality scoring: the fraction of a document's
    * bigrams that are corpus-common (count ≥ 5) — junk/OCR noise is made
    * of rare transitions. A genuine two-stage pipeline: corpus pass
    * builds the common-bigram set, broadcast-joined back for per-doc
    * scoring. Integer counts + one final division keep it cross-engine
    * exact. At 100 TB the common set is frequency-pruned (or a Bloom
    * filter) and still broadcastable. */
  def textBigramCoverage(s: SparkSession, d: String): DataFrame = {
    val bigrams = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), ws).as("t"))
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1)," +
          " (x, y) -> concat(x, ' ', y))")).as("bg"))
    val common = bigrams.groupBy("bg").agg(count(lit(1)).as("n"))
      .where(col("n") >= 5).select(col("bg"), lit(1).as("hit"))
    bigrams.join(broadcast(common), Seq("bg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("hit"), lit(0))).as("n_common"))
      .select(col("doc_id"), col("n_bigrams"), col("n_common"),
        round(col("n_common").cast("double") / col("n_bigrams"), 6)
          .as("coverage"))
      .orderBy("doc_id")
  }

  val textBigramCoverageSql: String =
    """WITH bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
      |    i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)),
      |common AS (
      |  SELECT bg FROM (SELECT bg, count(*) AS n FROM bg GROUP BY bg)
      |  WHERE n >= 5)
      |SELECT b.doc_id, count(*) AS n_bigrams,
      |  sum(CASE WHEN c.bg IS NOT NULL THEN 1 ELSE 0 END) AS n_common,
      |  round(CAST(sum(CASE WHEN c.bg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS coverage
      |FROM bg b LEFT JOIN common c ON b.bg = c.bg
      |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin

  /** Vocabulary mining: top-100 corpus tokens by frequency. The classic
    * shuffle-heavy aggregation: explode → partial (map-side) count →
    * final count → TakeOrdered; ties break on the token so both engines
    * rank identically. */
  def textVocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), ws)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(100)

  val textVocabSql: String =
    """SELECT tok AS token, count(*) AS n
      |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents)
      |GROUP BY tok ORDER BY n DESC, token LIMIT 100""".stripMargin

  /** Deterministic hash-based train/val split (90/10): the split must be
    * a pure function of the stable id so re-runs, backfills, and engines
    * agree — never rand(). */
  def sampleSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % 100).as("bucket"))
      .withColumn("split", when(col("bucket") < 90, "train").otherwise("val"))
      .orderBy("doc_id")

  val sampleSplitSql: String =
    """SELECT doc_id,
      |  ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::INT % 100 AS bucket,
      |  CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::INT % 100 < 90
      |    THEN 'train' ELSE 'val' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Content fingerprints (md5 + sha256, cross-engine identical). */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
        TextAnalysis.fingerprintSha(col("text")).as("fp_sha256"))
      .orderBy("doc_id")

  val textFingerprintSql: String =
    """SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal: binary column → batched stub decode → typed metadata.
    * The stub's fake dims derive from sha256(content) so even this is
    * oracle-checkable. */
  def multimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
    Multimodal.decodeMeta(media).toDF().orderBy("media_id")
  }

  val multimodalDecodeSql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(('0x' || substr(sha256(text), 9, 2)) AS INTEGER) % 3
      |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
      |  CAST(64 + CAST(('0x' || substr(sha256(text), 1, 4)) AS INTEGER) % 1984 AS INTEGER) AS width,
      |  CAST(64 + CAST(('0x' || substr(sha256(text), 5, 4)) AS INTEGER) % 1984 AS INTEGER) AS height,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  sha256(text) AS checksum
      |FROM documents ORDER BY media_id""".stripMargin

  /** Multimodal frame sampling: video-shaped fan-out (4 frames per media
    * row) with deterministic per-frame features — fully oracle-checkable
    * because the stub derives everything from sha256(content). */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
    Multimodal.sampleFrames(media, 4).toDF().orderBy("media_id", "frame_idx")
  }

  val multimodalFramesSql: String =
    """WITH meta AS (
      |  SELECT doc_id AS media_id,
      |    64 + CAST(('0x' || substr(sha256(text), 1, 4)) AS BIGINT) % 1984 AS w,
      |    64 + CAST(('0x' || substr(sha256(text), 5, 4)) AS BIGINT) % 1984 AS h
      |  FROM documents)
      |SELECT media_id, CAST(i AS INT) AS frame_idx,
      |  CAST((w * (i + 1)) % h AS DOUBLE) / CAST(h AS DOUBLE) AS feature
      |FROM (SELECT media_id, w, h, unnest(generate_series(0, 3)) AS i FROM meta)
      |ORDER BY media_id, frame_idx""".stripMargin

  /** Audio-shaped windowed segmentation over binary media (500 ms windows,
    * 250 ms hop) — deterministic stub duration/energy so the fan-out and
    * window arithmetic are oracle-checkable. */
  def multimodalAudioSegments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, d))
    Multimodal.segmentAudio(media, windowMs = 500L, hopMs = 250L)
      .toDF().orderBy("media_id", "seg_idx")
  }

  val multimodalAudioSegmentsSql: String =
    """WITH meta AS (
      |  SELECT doc_id AS media_id,
      |    1000 + CAST(('0x' || substr(sha256(text), 11, 4)) AS BIGINT) % 8000 AS dur
      |  FROM documents),
      |segs AS (
      |  SELECT media_id, dur,
      |    unnest(generate_series(0, greatest((dur - 500) // 250, 0))) AS i
      |  FROM meta)
      |SELECT media_id, CAST(i AS INT) AS seg_idx,
      |  i * 250 AS start_ms, least(i * 250 + 500, dur) AS end_ms,
      |  CAST((i * 250 + least(i * 250 + 500, dur)) % 1000 AS DOUBLE) / 1000.0 AS energy
      |FROM segs ORDER BY media_id, seg_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_audio" -> (multimodalAudioSegments _),
    "multimodal_frames" -> (multimodalFrames _),
    "dedup_exact" -> (dedupExact _),
    "dedup_jaccard_blocked" -> (dedupJaccardBlocked _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _),
    "ann_cosine_topk" -> (annCosineTopk _),
    "ann_ivf" -> (annIvf _),
    "embed_neardup" -> (embedNeardup _),
    "ann_lsh" -> (annLsh _),
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_tokens" -> (textTokens _),
    "text_vocab" -> (textVocab _),
    "text_bigram_coverage" -> (textBigramCoverage _),
    "sample_split" -> (sampleSplit _),
    "text_fingerprint" -> (textFingerprint _),
    "multimodal_decode" -> (multimodalDecode _)
  )

  val oracle: Map[String, String] = Map(
    "multimodal_audio" -> multimodalAudioSegmentsSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_simhash" -> dedupSimhashSql,
    "ann_lsh" -> annLshSql,
    "multimodal_frames" -> multimodalFramesSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_jaccard_blocked" -> dedupJaccardBlockedSql,
    "dedup_clusters" -> dedupClustersSql,
    "ann_cosine_topk" -> annCosineTopkSql,
    "ann_ivf" -> annIvfSql,
    "embed_neardup" -> embedNeardupSql,
    "text_langid" -> textLangidSql,
    "text_quality" -> textQualitySql,
    "text_tokens" -> textTokensSql,
    "text_vocab" -> textVocabSql,
    "text_bigram_coverage" -> textBigramCoverageSql,
    "sample_split" -> sampleSplitSql,
    "text_fingerprint" -> textFingerprintSql,
    "multimodal_decode" -> multimodalDecodeSql
  )
}
