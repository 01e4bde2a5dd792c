package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Scale design:
  *  - brute-force top-k: broadcast the (small) query set, one narrow pass
  *    over the corpus computing cosine via zip_with/aggregate HOFs (codegen,
  *    no UDF), then per-query top-k. This is the exact baseline — a single
  *    scan, no corpus shuffle, O(|corpus|·|queries|·dim) flops.
  *  - LSH (random hyperplane) bucketing: deterministic pseudo-random
  *    hyperplanes hashed from (seed, plane, dim) — signature is a narrow
  *    map; candidate generation touches only same-bucket pairs. The scale
  *    path for corpus-vs-corpus near-dup joins.
  *  - IVF-style coarse quantization would slot in the same way (assign →
  *    per-centroid buckets); hyperplane LSH chosen here because it needs no
  *    training pass.
  *
  * Cosine determinism: sums fold left-to-right over array order in both
  * Spark (aggregate HOF) and the DuckDB oracle; results are rounded to 6dp
  * before any ordering/compare so the last-ulp never decides ranks.
  */
object Similarity extends Serializable {

  /** Trained PQ codebooks keyed by (corpus plan hash, row count, content
    * hash, m, k, updates, dim) — driver-held, k·dim doubles per entry (see
    * pqTopK). The count + bit_xor-of-xxhash64 data fingerprint means a
    * changed file at the same path (or a 32-bit plan-hash collision
    * between corpora) trains fresh books instead of silently reusing
    * stale ones, and the LRU bound keeps a long-lived session from
    * accumulating codebooks without limit. */
  private[graft] val pqBookCacheMax = 8
  private[graft] val pqBookCache = new graft.util.LruCache[
    (Int, Long, Long, Int, Int, Int, Int), Array[Array[Array[Double]]]](
    pqBookCacheMax)

  /** Dot product: native codegen'd expression (graft.plans.DotProduct) —
    * same left-fold order as the HOF formulation and DuckDB's
    * list_dot_product, ~10x cheaper per pair (no intermediate array). */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct.dot(a, b)

  /** Cosine similarity of two double-array columns. Prefer the
    * precomputed-norm join paths below when evaluating many pairs. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def toDoubleArr(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact top-k per query over a scored (q_id, vec_id, sim) set, in two
    * phases: a pre-rank within (q_id, vec_id % groups) slices, then the
    * final rank over the ≤ groups·k survivors per query. The global
    * top-k is a subset of the union of slice top-ks, and both windows
    * break ties identically on (sim DESC, vec_id), so the result — ranks
    * included — is bit-identical to the single-window formulation the
    * DuckDB oracles state; no oracle changes.
    *
    * Why: ANN entries rank a corpus-sized score set for a HANDFUL of
    * queries, so a single `Window.partitionBy(q_id)` funnels the whole
    * corpus through |queries| sort partitions — at the 100× tier that
    * serialized ann_pq's final stage onto 5 threads of 32. The slice key
    * is `vec_id % groups` (deterministic, data-independent), NOT
    * spark_partition_id (non-deterministic: a recompute under a lost
    * block could re-slice mid-query). */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int,
                                  groups: Int = 64): DataFrame = {
    val pre = Window.partitionBy(col("q_id"), pmod(col("vec_id"), lit(groups)))
      .orderBy(col("sim").desc, col("vec_id"))
    val short = scored.withColumn("_pr", row_number().over(pre))
      .where(col("_pr") <= k).drop("_pr")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    short.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * queries: (q_id, q_emb); corpus: (vec_id, embedding). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val joined = corpus
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("emb"))
      // spread a compact single-split corpus before the per-row dot work
      .repartition(col("vec_id"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
      .crossJoin(broadcast(queries
        .select(col("q_id"), toDoubleArr(col("q_emb")).as("qe"))
        .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("emb"), col("qe")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(joined, k)
  }

  /** BINARY-quantization retrieval (sign bits + Hamming shortlist +
    * exact rerank) — the 1-bit/dim serving trick vector stores ship
    * (binary embeddings): each vector compresses to dim/64 longs of
    * SIGN BITS (64 dims → 16 bytes here, packed as two 32-bit halves so
    * bit arithmetic stays overflow-free in BIGINT on both engines), the
    * candidate pass ranks by Hamming distance — pure xor + bit_count,
    * no floating point — and only the `shortlist` best per query fetch
    * their full vectors for exact-cosine rerank.
    *
    * Scale shape: the code table is 16 bytes/vector (16 GB at 1B
    * vectors — memory-residentable where float vectors are not); the
    * Hamming pass is one narrow scan against the broadcast query codes;
    * the rerank join touches shortlist·|queries| full vectors only.
    * Everything is integer-exact until the final rerank, whose cosine
    * is the shared fixed-order dot — so the DuckDB oracle replays
    * codes, Hamming ranks, and rerank bit-for-bit. */
  def binaryHammingRerank(corpus: DataFrame, queries: DataFrame,
                          topK: Int, shortlist: Int): DataFrame = {
    // sign codes, two 32-bit halves: h1 = Σ 2^d over d∈[0,32) with
    // e[d] > 0, h2 likewise for [32,64) — sums of distinct powers, exact
    // BIGINT in both engines (a single 64-bit pack would overflow the
    // signed sum at bit 63)
    def half(c: String, lo: Int): Column = expr(
      s"aggregate(sequence(0, 31), 0L, (acc, d) -> acc + " +
        s"IF(element_at($c, d + ${lo + 1}) > CAST(0 AS DOUBLE), " +
        s"shiftleft(CAST(1 AS BIGINT), d), 0L))")
    val coded = corpus
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("e"))
      .repartition(col("vec_id"))
      .select(col("vec_id"), half("e", 0).as("h1"), half("e", 32).as("h2"))
    val qcoded = queries
      .select(col("q_id"), toDoubleArr(col("q_emb")).as("qe"))
      .select(col("q_id"), half("qe", 0).as("q1"), half("qe", 32).as("q2"))
    val scored = coded.crossJoin(broadcast(qcoded))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (lit(64) - bit_count(col("h1").bitwiseXOR(col("q1"))) -
          bit_count(col("h2").bitwiseXOR(col("q2")))).as("sim"))
    // topKPerQuery ranks (sim DESC, vec_id): sim = 64 − Hamming makes
    // that exactly (hamming ASC, vec_id) — the oracle's ORDER BY
    val cand = topKPerQuery(scored, shortlist).select("q_id", "vec_id")
    val exact = corpus.select(col("vec_id"),
      toDoubleArr(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val qx = queries
      .select(col("q_id"), toDoubleArr(col("q_emb")).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val res = cand.join(exact, Seq("vec_id")).join(broadcast(qx), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("e"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(res, topK)
  }

  /** Scalar-quantized (SQ8) top-k: per-dimension min/max codebook, corpus
    * vectors encoded as 8-bit codes (the 4-8x compressed column a vector
    * store persists), queries kept exact — asymmetric distance computation
    * over the dequantized corpus. One stats pass (at extreme scale: a
    * sample), one corpus pass; the codebook is 2·dim doubles, broadcast.
    *
    * Determinism: quantize/dequantize/cosine use a fixed double-op order
    * replicated verbatim in the DuckDB oracle, and similarity is rounded
    * to 6dp before ranking — so codes AND ranks are bit-identical across
    * engines. A zero-spread dimension (max == min) maps to code 0 with a
    * guard delta of 1.0 — dequantizing exactly back to the constant — so
    * constant dimensions cannot produce NaN (identically in both engines
    * via the same CASE). */
  /** The SQ8 per-dimension (min, max) codebook alone — the index-build
    * surface (None for an empty corpus). 0-based dimension order. */
  def sq8Stats(corpus: DataFrame): Option[(Array[Double], Array[Double])] = {
    val t = corpus.select(toDoubleArr(col("embedding")).as("e"))
    val stats = t
      .select(posexplode(col("e")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .agg(
        expr("transform(array_sort(collect_list(struct(i, mn))), s -> s.mn)")
          .as("amn"),
        expr("transform(array_sort(collect_list(struct(i, mx))), s -> s.mx)")
          .as("amx"))
    stats.collect().headOption.map(st =>
      (st.getSeq[Double](0).toArray, st.getSeq[Double](1).toArray))
  }

  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    sq8Stats(corpus) match {
      case Some((amn, amx)) => sq8TopKWithStats(corpus, queries, k, amn, amx)
      // headOption semantics preserved: an empty corpus short-circuits
      // to an empty result instead of throwing
      case None => topKPerQuery(
        queries.select(col("q_id"), col("q_id").as("vec_id"),
          lit(0.0).as("sim")).limit(0), k)
    }

  /** sq8TopK with an EXTERNALLY-SUPPLIED codebook (the load-and-serve
    * surface): identical encode + asymmetric-scoring chain, no stats
    * pass. */
  def sq8TopKWithStats(corpus: DataFrame, queries: DataFrame, k: Int,
      amn: Array[Double], amx: Array[Double]): DataFrame = {
    val t = corpus.select(col("vec_id"), toDoubleArr(col("embedding")).as("e"))
      .repartition(col("vec_id"))
    // Broadcast-codebook encode loop (the pqReconstruct pattern): the
    // twin transform expressions re-resolve amn/amx per element per row;
    // the loop applies the IDENTICAL op sequence — (x−amn)·255/spread,
    // round HALF_UP (math.round ≡ HALF_UP on the non-negative range the
    // quantizer produces), dequantize amn + code·spread/255, sequential
    // norm fold — so codes, xh, and nrm are bit-identical to the
    // expression tier and the oracle. Measured at the 2M-vector tier:
    // 52.9 → ~13s.
    val sess = corpus.sparkSession
    import sess.implicits._
    val bcStats = sess.sparkContext.broadcast((amn, amx))
    val encoded = t
      .select(col("vec_id").cast("long").as("_1"), col("e").as("_2"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (mn, mx) = bcStats.value
        it.map { case (id, e) =>
          val xh = new Array[Double](e.length)
          var i = 0
          while (i < e.length) {
            val sp = if (mx(i) > mn(i)) mx(i) - mn(i) else 1.0
            val code = math.round(((e(i) - mn(i)) * 255.0) / sp)
            xh(i) = mn(i) + (code.toDouble * sp) / 255.0
            i += 1
          }
          var acc = 0.0
          i = 0
          while (i < xh.length) { acc += xh(i) * xh(i); i += 1 }
          (id, xh, math.sqrt(acc))
        }
      }
      .toDF("vec_id", "xh", "nrm")
    val joined = encoded
      .crossJoin(broadcast(queries
        .select(col("q_id"), toDoubleArr(col("q_emb")).as("qe"))
        .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("xh"), col("qe")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(joined, k)
  }

  /** All corpus pairs with cosine >= threshold (exact; quadratic — the
    * oracle baseline for embedding near-dup; LSH below is the scale path).
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val t = corpus
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val a = t.select(col("vec_id").as("a"), col("e").as("ea"),
      col("nrm").as("na"))
    val b = t.select(col("vec_id").as("b"), col("e").as("eb"),
      col("nrm").as("nb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          .as("sim"))
      .where(col("sim") >= threshold)
      .orderBy("a", "b")
  }

  /** Deterministic hyperplane component for (table t, plane p, dim d):
    * the first 13 hex chars (52 bits) of md5("plane_t_p_d") mapped to
    * [-1, 1). All steps (52-bit int → /2^52 → ×2 → −1) are exact in
    * double, and md5 is engine-independent — so the DuckDB oracle computes
    * the bit-identical plane. d is 1-based to match SQL generate_series. */
  def planeComponent(t: Int, p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane_${t}_${p}_${d}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16).toDouble /
      (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Signature width derived from corpus size: smallest b with
    * n/targetBucket ≤ 2^b, clamped to [4, 16] — expected bucket occupancy
    * stays ~targetBucket as the corpus grows, so per-bucket self-join work
    * is bounded at any scale (the round-1 fixed-nBits scale-killer, fixed).
    * Integer-exact (bit length, no float log) so the SQL oracle
    * (length(bin(q-1))) derives the identical value. */
  def lshBits(n: Long, targetBucket: Long = 64L): Int = {
    val q = (n + targetBucket - 1) / targetBucket
    val b = if (q <= 1) 1 else 64 - java.lang.Long.numberOfLeadingZeros(q - 1)
    // Cap 24, not 16: the round-8 100x run measured the old 16-bit cap
    // letting bucket occupancy grow linearly past ~1M vectors (2M vectors
    // -> 30/bucket instead of the 16 target -> ~2x the candidate set in
    // ann_knn_graph). 24 bits keeps occupancy at targetBucket to ~270M
    // vectors/table while the signature still fits an Int; below 1M
    // vectors the formula is unchanged, so every oracle tier replays
    // identically (the SQL mirrors compute the same least(24, ...)).
    math.min(24, math.max(4, b))
  }

  /** Deterministic centroid component for (cell c, dim d) — md5-derived
    * like planeComponent, so the DuckDB oracle computes bit-identical
    * centroids. A trained k-means would slot into the same assign/probe
    * shape; deterministic centroids keep the pipeline oracle-exact and
    * training-free (random partitions of the sphere). */
  def cellComponent(c: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"cell_${c}_${d}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16).toDouble /
      (1L << 52).toDouble * 2.0 - 1.0
  }

  /** IVF-style ANN top-k: coarse-quantize the corpus to nCells inverted
    * lists (one narrow pass, nCells codegen'd dot products per row), probe
    * the nProbe best cells per query, exact-rank within the probed lists.
    *
    * Scale shape: the corpus shuffles once keyed by cell; a query touches
    * ~nProbe/nCells of the data. Assignment uses
    * array_position(sims, array_max(sims)) — first maximum, so ties break
    * to the lowest cell in both engines. queries: (q_id, q_emb). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, dim: Int = 64): DataFrame = {
    val cents = Array.tabulate(nCells, dim)((c, d) => cellComponent(c, d + 1))
    val cnorm = cents.map(cv => math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)))
    def cellSims(e: Column): Column = array((0 until nCells).map { c =>
      dot(e, array(cents(c).map(lit).toSeq: _*)) / lit(cnorm(c))
    }: _*)
    val assigned = corpus
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("e"))
      .repartition(col("vec_id"))
      .withColumn("sims", cellSims(col("e")))
      .withColumn("cell", array_position(col("sims"), array_max(col("sims"))) - 1)
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      .select("vec_id", "e", "nrm", "cell")
    val q = queries
      .select(col("q_id"), toDoubleArr(col("q_emb")).as("qe"))
      .withColumn("qsims", cellSims(col("qe")))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    val probes = q.select(col("q_id"), col("qe"), col("qn"),
        posexplode(col("qsims")).as(Seq("cell", "csim")))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("csim").desc, col("cell"))))
      .where(col("prank") <= nProbe)
      .select("q_id", "qe", "qn", "cell")
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("e"), col("qe")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(cand, k)
  }

  /** LSH-bucketed near-dup with count-derived signature width and
    * radius-1 multi-probe.
    *
    * Shape at scale: signatures are computed in one pass (nBits ×
    * tables codegen'd dot products against literal plane arrays); the
    * wide shuffle ships each vector through the bucket exchange
    * (nBits+1 probe copies of (vec_id, e, nrm)) and pairs are scored
    * INSIDE the bucket join's stage — everything downstream shuffles
    * 24-byte rows. Multi-probe expands the
    * probe side to nBits+1 buckets (the signature and its 1-bit flips), so
    * a candidate pair is EXACTLY a pair with Hamming(sig_a, sig_b) ≤ 1 in
    * some table — a closed-form predicate the DuckDB oracle evaluates
    * quadratically at oracle SF.
    *
    * INPUT CONTRACT: `embedding` is float32 (`array<float>`) — the
    * storage type every large-scale embedding corpus uses (and what the
    * fixture tables hold). Other numeric element types are cast to
    * float32 on entry; callers holding float64 embeddings who need
    * full-precision scores should compare with [[cosineNearDupPairs]],
    * which keeps the double path. */
  def lshNearDupPairs(s: SparkSession, corpus: DataFrame, threshold: Double,
                      tables: Int = 8, targetBucket: Long = 64L,
                      dim: Int = 64, knownCount: Option[Long] = None)
      : DataFrame = {
    val base = corpus.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<float>").as("ef"))
    // Adaptive stage: a count() sizes the signature. Callers reading a
    // known table pass knownCount (Tables.cachedCount — one count per
    // session, or a table statistic on a lakehouse).
    val nBits = lshBits(knownCount.getOrElse(base.count()), targetBucket)
    // Dedup AFTER the verify filter: a pair survives in at most `tables`
    // copies, all with identical (a, b, sim), so the distinct shuffles
    // only the (small) verified set instead of the full candidate set.
    fusedScoredPairs(base, nBits, tables, dim)
      .where(col("sim") >= threshold)
      .distinct()
      .orderBy("a", "b")
  }

  /** FILTERED IVF retrieval — the composition ann_filtered's doc
    * promises: each query carries a metadata predicate
    * (label % mod == want) and is ROUTED by measured selectivity:
    *
    *  - SELECTIVE predicate (matching rows × selectivityDen ≤ corpus
    *    count): exact scoring over the predicate-filtered slice — at
    *    100 TB a selective filter prunes the scan (partition/zone
    *    pruning on the label column) and exact in-slice top-k is both
    *    cheaper AND recall-1.0, so probing an index would only LOSE
    *    recall;
    *  - UNSELECTIVE predicate: filter-aware IVF probing — the corpus
    *    coarse-quantizes to nCells inverted lists ONCE, each query
    *    probes its nProbe best cells, and the predicate applies IN the
    *    posting-list join condition, so non-matching rows are pruned
    *    cell-locally before any distance math (the Filtered-DiskANN /
    *    FAISS IDSelector shape).
    *
    * Everything is deterministic and exact-integer routed, so a SQL
    * oracle replays the per-query counts, the routing decision, and
    * both branches bit-for-bit. The output carries the `path` taken so
    * the oracle also gates the router.
    *
    * Scale shape: the per-query match counts are one narrow aggregate
    * (a lakehouse would answer them from column stats); the wide work
    * is one corpus cell-assignment pass + broadcast probe joins; no
    * candidate-sized exchange exists on either branch.
    *
    * queries: (q_id, q_emb, mod, want); corpus: (vec_id, embedding,
    * label). */
  def ivfFilteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, dim: Int = 64,
      selectivityDen: Int = 8, knownCount: Option[Long] = None)
      : DataFrame = {
    val n = knownCount.getOrElse(corpus.count())
    val base = corpus.select(col("vec_id"), col("label").cast("long"),
        toDoubleArr(col("embedding")).as("e"))
      .repartition(col("vec_id"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val q = queries.select(col("q_id"), col("mod").cast("long"),
        col("want").cast("long"), toDoubleArr(col("q_emb")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
    def pred = col("label") % col("mod") === col("want")
    // per-query predicate match count: one narrow corpus pass against
    // the broadcast query-predicate table (stats-answerable at scale)
    val cnt = base.join(broadcast(q.select("q_id", "mod", "want")), pred)
      .groupBy("q_id").agg(count(lit(1)).as("cnt"))
    val routed = q.join(cnt, Seq("q_id"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("path",
        when(col("cnt") * selectivityDen <= n, "exact").otherwise("ivf"))
    // exact branch: score the filtered slice directly (recall 1.0)
    val exact = base.join(
        broadcast(routed.where(col("path") === "exact")),
        pred && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("e"), col("qe")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    // ivf branch: one cell-assignment pass, predicate folded into the
    // posting-list join
    val cents = Array.tabulate(nCells, dim)((c, d) => cellComponent(c, d + 1))
    val cnorm = cents.map(cv =>
      math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)))
    def cellSims(e: Column): Column = array((0 until nCells).map { c =>
      dot(e, array(cents(c).map(lit).toSeq: _*)) / lit(cnorm(c))
    }: _*)
    val assigned = base
      .withColumn("sims", cellSims(col("e")))
      .withColumn("cell",
        array_position(col("sims"), array_max(col("sims"))) - 1)
      .drop("sims")
    // selectivity-scaled probe width (the FAISS "increase nprobe when
    // filtering" rule, in exact integers): a predicate keeping 1/s of
    // the corpus thins every posting list by ~s, so the probe width
    // grows by ceil(s/2) — nProbe·⌈n/(2·cnt)⌉ cells, capped at nCells.
    // Unfiltered (cnt = n) degenerates to plain nProbe.
    val probeWidth = expr(s"least(CAST($nCells AS BIGINT), " +
      s"$nProbe * ((CAST($n AS BIGINT) + 2*cnt - 1) div (2*cnt)))")
    val probes = routed.where(col("path") === "ivf")
      .select(col("q_id"), col("qe"), col("qn"), col("mod"), col("want"),
        col("cnt"), posexplode(cellSims(col("qe"))).as(Seq("cell", "csim")))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("csim").desc, col("cell"))))
      .where(col("prank") <= probeWidth)
      .select("q_id", "qe", "qn", "mod", "want", "cell")
    val ivf = assigned.join(broadcast(probes), Seq("cell"))
      .where(pred && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("e"), col("qe")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(exact.unionByName(ivf), k)
      .join(broadcast(routed.select("q_id", "path")), Seq("q_id"))
  }

  /** Unordered LSH candidate pairs (a < b) with exact cosine, scored
    * inside a SINGLE shuffle-hash bucket join — the shared engine of
    * [[lshNearDupPairs]] and [[lshKnnGraph]]. The pair set is exactly
    * {(a,b) : Hamming(sig_a, sig_b) ≤ 1 in some table} — the closed-form
    * predicate the DuckDB oracles evaluate quadratically — with possible
    * bit-identical duplicate rows (same deterministic dot), so callers
    * dedup with a plain distinct.
    *
    * FUSED bucket-join scoring (round-8 100x rework): vectors ride the
    * bucket exchange ONCE — (vec_id, e, nrm) per probe — and every
    * candidate pair is scored INSIDE the bucket join's stage, projecting
    * down to narrow (a, b, sim) rows before anything else shuffles. The
    * r7 shape generated narrow candidate pairs and then JOINED the
    * embeddings back on (twice); at the 100x tier the a-attached wide
    * intermediate (tens of millions of rows × a 64-dim double array)
    * paid a 61GB exchange under shuffle-hash attach and an out-of-disk
    * 79GB sort spill under SMJ. Here the wide shuffle is bounded by
    * corpus size × probes, NOT by the candidate-pair count, and the only
    * post-scoring exchanges carry 24-byte rows. The per-partition hash
    * build is the exact-bucket side: n/numPartitions wide rows per task
    * (~14MB at the 100x tier, constant-per-task at 1B vectors with
    * proportionally more partitions — where a broadcast could not hold).
    *
    * UPWARD-ONLY multi-probe: a Hamming-1 pair differs at exactly one
    * bit p; precisely ONE member has bit p clear. Probing only the
    * set-this-bit flips (plus the identity bucket for Hamming-0) still
    * catches every pair — the clear-bit member probes UP into the other
    * member's exact bucket — while halving the probe fan-out (avg
    * 1 + nBits/2 copies per vector instead of nBits+1) and catching each
    * Hamming-1 pair exactly once instead of twice. The probe side is
    * the big streamed side of the join, so this halves the wide shuffle
    * AND the scored volume. */
  private def fusedScoredPairs(base: DataFrame, nBits: Int, tables: Int,
                               dim: Int): DataFrame = {
    // Signatures and norms are computed in doubles PRE-exchange (exactly
    // as before — float→double widening is elementwise-exact), but the
    // exchange ships the ORIGINAL float vector: half the wide-shuffle
    // bytes and half the join's row-copy traffic. Scoring uses the
    // float-array dot expression, which accumulates in double with the
    // same fold order — bit-identical to widening first.
    val e = toDoubleArr(col("ef"))
    val sigCols = (0 until tables).map { t =>
      (0 until nBits).map { p =>
        val plane = array((1 to dim).map(d => lit(planeComponent(t, p, d))): _*)
        when(dot(e, plane) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _).as(s"sig_$t")
    }
    val sigs = base.select(col("vec_id") +: col("ef") +:
      sqrt(dot(e, e)).as("nrm") +: sigCols: _*)
    val stacked = sigs.select(col("vec_id"), col("ef"), col("nrm"),
      posexplode(array((0 until tables).map(t => col(s"sig_$t")): _*))
        .as(Seq("table", "sig")))
    val exact = stacked.select(col("vec_id").as("a"), col("ef").as("efa"),
      col("nrm").as("na"), col("table"), col("sig").as("bucket"))
    val upProbes = array_compact(array(col("sig") +:
      (0 until nBits).map { p =>
        when(col("sig").bitwiseAND(lit(1 << p)) === 0,
          col("sig").bitwiseOR(lit(1 << p))).otherwise(lit(null))
      }: _*))
    val probed = stacked.select(col("vec_id").as("b"), col("ef").as("efb"),
      col("nrm").as("nb"), col("table"), explode(upProbes).as("bucket"))
    exact.hint("shuffle_hash").join(probed, Seq("table", "bucket"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"),
        round(graft.plans.DotProduct.fdot(col("efa"), col("efb")) /
          (col("na") * col("nb")), 6).as("sim"))
  }

  /** k-NN GRAPH: every corpus vector's top-k nearest neighbors, mined
    * from the SAME banded multi-probe hyperplane-LSH candidate set as
    * [[lshNearDupPairs]] (candidates ≡ directed pairs with
    * Hamming(sig_a, sig_b) ≤ 1 in some table), exact-cosine-scored and
    * ranked per vector. This is the primitive SemDeDup-style semantic
    * clustering, kNN-graph community detection, and hard-negative mining
    * all start from — near-dup pairs answer "who is a duplicate", the
    * graph answers "who are my k closest, duplicate or not".
    *
    * Shape at scale: identical to lshNearDupPairs (including the
    * float32 input contract documented there; fused bucket-join
    * scoring — the wide shuffle is the vector's nBits+1 probe copies,
    * never the candidate pairs); scored rows dedup on (vec_id, neighbor,
    * sim) — duplicates from different tables are bit-identical — so each
    * pair reaches the window once (which would otherwise rank
    * duplicates); ranking is a per-vector
    * window over the candidate set only — never the corpus. Vectors
    * whose buckets yield fewer than k candidates emit fewer rows (the
    * standard ANN-graph recall/efficiency trade, tunable via tables ×
    * targetBucket). Deterministic md5-derived planes + 6dp rounding make
    * the DuckDB oracle replay signatures, candidates, and ranks
    * bit-for-bit. */
  def lshKnnGraph(s: SparkSession, corpus: DataFrame, k: Int,
                  tables: Int = 4, targetBucket: Long = 16L,
                  dim: Int = 64, knownCount: Option[Long] = None)
      : DataFrame = {
    val base = corpus.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<float>").as("ef"))
    val nBits = lshBits(knownCount.getOrElse(base.count()), targetBucket)
    // Same FUSED bucket-join scoring as lshNearDupPairs (see
    // fusedScoredPairs): each UNORDERED pair is scored once, deduped on
    // (a, b, sim) — duplicates from different tables are bit-identical —
    // and then MIRRORED into both directions for the per-vector ranking
    // (the oracle's candidate set is directed: a ≠ b, Hamming ≤ 1, which
    // is exactly the symmetric closure). Scoring each pair once and
    // unioning the swap is ~4× less scoring work than scoring every
    // directed catch, and the union is exchange-free.
    // Mirror with ONE explode, not a self-union: unionAll(df, df.swap)
    // references the fused-join subtree twice and Spark would execute
    // the whole mine+distinct twice.
    val scored = fusedScoredPairs(base, nBits, tables, dim).distinct()
      .select(explode(array(
        struct(col("a").as("vec_id"), col("b").as("neighbor"), col("sim")),
        struct(col("b").as("vec_id"), col("a").as("neighbor"), col("sim"))))
        .as("r"))
      .select(col("r.vec_id"), col("r.neighbor"), col("r.sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
  }

  /** PRODUCT-QUANTIZATION (PQ) top-k: the dim-dimensional space splits
    * into m subspaces, each with its own k-centroid codebook trained by
    * the same deterministic integer-exact Lloyd's as [[kmeansAssignments]];
    * corpus vectors encode to m codes (m·log2(k) bits — the classic
    * memory-bound ANN index), queries stay exact and score against the
    * dequantized reconstruction (asymmetric distance).
    *
    * Scale shape: codebooks are driver-held (m·k·(dim/m) = k·dim doubles)
    * and ride the plan as literals; training is m independent Lloyd's
    * runs over the checkpointed quantized corpus (each round one scan);
    * encode + reconstruct + score is ONE corpus projection with the
    * broadcast query set. Training, codes, and ranks replay bit-for-bit
    * in DuckDB (md5 seeding, exact integer centroid sums, left-fold
    * distances, ties to the lowest centroid id). */
  /** Integer micro-unit quantization + checkpoint — the shared corpus
    * representation PQ training/encoding (and the IVF-PQ composition)
    * work from. */
  private def microQuantized(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"),
      expr("transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("qe"))
      // Spread the corpus across the session's shuffle partitions BEFORE
      // checkpointing: everything downstream (the m training chains, the
      // m·k-distance encode projection, asymmetric scoring) is narrow
      // per-row work that inherits this partitioning. A compact parquet
      // corpus can arrive as ONE input split (200k vectors ≈ one 6 MB
      // row group), which would otherwise single-thread the whole encode
      // — measured at the 100× tier: cpu/wall 1.2 on 32 cores.
      .repartition(col("vec_id"))
      .localCheckpoint(true)

  // Distances go through the codegen'd SqDistExpr (identical left-fold
  // to the aggregate/zip_with HOF, which is a CodegenFallback and
  // dominates wall-clock at m·k evaluations per vector). The integer
  // sub-vectors cast exactly to doubles ONCE per row (micro-units < 2^53).
  private def subDists(cents: Array[Array[Double]], subD: Column): Column =
    array(cents.map { c =>
      graft.plans.DotProduct.sqDist(subD, array(c.map(lit).toSeq: _*))
    }.toSeq: _*)

  def pqTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
             m: Int = 4, k: Int = 8, updates: Int = 2, dim: Int = 64)
      : DataFrame = {
    val q = microQuantized(corpus)
    val books = trainedPqBooks(corpus, q, m, k, updates, dim)
    pqServe(q, queries, topK, books, dim)
  }

  /** The trained PQ codebooks alone — the index-build surface:
    * m × k × (dim/m) micro-unit centroid components, exactly what
    * pqTopK trains internally (and what a committed artifact stores). */
  def pqBooks(corpus: DataFrame, m: Int = 16, k: Int = 16,
      updates: Int = 2, dim: Int = 64): Array[Array[Array[Double]]] =
    trainedPqBooks(corpus, microQuantized(corpus), m, k, updates, dim)

  /** pqTopK with EXTERNALLY-SUPPLIED codebooks (the load-and-serve
    * surface): the identical encode + asymmetric-scoring chain, no
    * training jobs. */
  def pqTopKWithBooks(corpus: DataFrame, queries: DataFrame, topK: Int,
      books: Array[Array[Array[Double]]], dim: Int = 64): DataFrame =
    pqServe(microQuantized(corpus), queries, topK, books, dim)

  private def pqServe(q: DataFrame, queries: DataFrame, topK: Int,
      books: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val joined = pqReconstruct(q, books, books.length, dim, withQd = false)
      .crossJoin(broadcast(queries
        .select(col("q_id"), toDoubleArr(col("q_emb")).as("qv"))
        .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("xh"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(joined, topK)
  }

  /** Deterministic training-sample cap, the published PQ/IVF practice
    * (FAISS trains codebooks on ~10^5 vectors and encodes the full
    * corpus): above `trainCap` vectors, Lloyd's rounds run over the
    * `trainCap` corpus rows with the smallest md5-derived hash — a
    * deterministic, engine-independent subset — while assignment/encode
    * still covers every vector. BELOW the cap the "sample" is the whole
    * corpus (ORDER BY hash LIMIT n selects the full set), so the DuckDB
    * oracle replay at verify SF is bit-identical with no SQL change; an
    * oracle at >cap SF would add the same ORDER BY/LIMIT CTE. Without
    * the cap, per-round training scans are O(corpus) — the difference
    * between a bounded index build and an unshippable one at 100 TB. */
  private[graft] val trainCap = 65536

  private def trainSample(q: DataFrame): DataFrame =
    q.withColumn("_th", expr(
        "CAST(conv(substr(md5(concat('trainsample_', " +
          "CAST(vec_id AS STRING))), 1, 13), 16, 10) AS BIGINT)"))
      .orderBy(col("_th"), col("vec_id")).limit(trainCap).drop("_th")
      .localCheckpoint(true)

  /** Deterministic PQ training over the micro-quantized corpus q, with
    * the bounded fingerprint-keyed codebook cache (see pqBookCache). */
  private[graft] def trainedPqBooks(corpus: DataFrame, q: DataFrame,
      m: Int, k: Int, updates: Int, dim: Int)
      : Array[Array[Array[Double]]] = {
    val subLen = dim / m

    // deterministic Lloyd's over one subspace of the integer sub-vectors
    // of the TRAINING SAMPLE (= the whole corpus below trainCap)
    def train(qt: DataFrame)(s: Int): Array[Array[Double]] = {
      val lo = s * subLen + 1
      val sub = qt.select(col("vec_id"),
        expr(s"slice(qe, $lo, $subLen)").as("qe"),
        expr(s"transform(slice(qe, $lo, $subLen), x -> CAST(x AS DOUBLE))")
          .as("qd"))
      val seeds = sub.select(col("vec_id"), col("qe"),
        expr("CAST(conv(substr(md5(concat('pqseed_" + s + "_', " +
          "CAST(vec_id AS STRING))), 1, 13), 16, 10) AS BIGINT)").as("h"))
        .orderBy("h", "vec_id").limit(k).collect()
      var cents: Array[Array[Double]] =
        seeds.map(_.getSeq[Long](1).map(_.toDouble).toArray)
      def assigned: DataFrame = {
        val dists = subDists(cents, col("qd"))
        sub.withColumn("dists", dists)
          .withColumn("dist", array_min(col("dists")))
          .withColumn("cid",
            (array_position(col("dists"), col("dist")) - 1).cast("int"))
      }
      for (_ <- 1 to updates) {
        val sums = assigned
          .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
          .groupBy("cid", "pos")
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
          .collect()
        val byCid = sums.groupBy(_.getInt(0))
        cents = cents.zipWithIndex.map { case (old, cid) =>
          byCid.get(cid) match {
            case Some(rows) =>
              val arr = new Array[Double](subLen)
              rows.foreach(r =>
                arr(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3))
              arr
            case None => old // an empty cluster keeps its centroid
          }
        }
      }
      cents
    }
    // Train-once-serve-many: the codebooks are an INDEX — a production
    // pipeline trains them once and every lookup reuses them. Cache by the
    // corpus plan's semantic hash + a DATA fingerprint (count + order-
    // independent bit_xor of per-row xxhash64 over the checkpointed
    // integer corpus — one cheap scan) + training params, so the rerank
    // entry (and repeated bench/verify calls) skip the 16 training chains
    // while mutated inputs or plan-hash collisions miss cleanly.
    // The m trainings are independent job chains over the same
    // checkpointed corpus — on a miss they run concurrently, so
    // wall-clock is one chain, not m.
    val fp = q.agg(count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(vec_id, qe))").as("h")).head()
    val fpHash = if (fp.isNullAt(1)) 0L else fp.getLong(1)
    val cacheKey =
      (corpus.semanticHash(), fp.getLong(0), fpHash, m, k, updates, dim)
    Similarity.pqBookCache.getOrElseUpdate(cacheKey) {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val qt = if (fp.getLong(0) > trainCap) trainSample(q) else q
      Await.result(
        Future.sequence((0 until m).toVector.map(s => Future(train(qt)(s)))),
        Duration.Inf).toArray
    }
  }

  /** Encode (argmin per subspace) + dequantize (concat chosen centroids)
    * in one projection over the micro-quantized corpus; codebook literals
    * ride the plan. Returns (vec_id, qd, xh) — xh is the PQ
    * reconstruction back in original units. `withQd = false` drops the
    * micro-unit double vector from the materialized code table and adds
    * the reconstruction norm instead (vec_id, xh, nrm) — the plain-PQ
    * serving shape, which never needs qd downstream; at 2M vectors the
    * narrower checkpoint rows halve the encode stage's GC pressure. */
  private def pqReconstruct(q: DataFrame, books: Array[Array[Array[Double]]],
                            m: Int, dim: Int, withQd: Boolean = true)
      : DataFrame = {
    // Broadcast-matrix encode (the assignViaBroadcast shape): the
    // expression formulation — m×k sqDist literal subtrees folded into
    // one projection — is past codegen's method limits at m=k=16, so it
    // ran as ~256 interpreted slice+fold evaluations per row (measured
    // 750 CPU-s for a 200k-vector encode at the 100× tier; this loop is
    // ~3 s). Math is bit-identical: per subspace, a sequential
    // (x−c)² left fold per centroid (SqDistExpr's order), strict-<
    // argmin keeping the lowest code on ties (= array_position of
    // array_min), then xh[i] = book_micro[i] / 1e6 concatenated in
    // subspace order — each an IEEE double op in the same order the
    // DuckDB oracle states.
    val s = q.sparkSession
    import s.implicits._
    val subLen = dim / m
    val bc = s.sparkContext.broadcast(books)
    def encode(qe: Array[Long]): (Array[Double], Array[Double]) = {
      val bks = bc.value
      val n = qe.length
      val qd = new Array[Double](n)
      var i = 0
      while (i < n) { qd(i) = qe(i).toDouble; i += 1 }
      val xh = new Array[Double](n)
      var sp = 0
      while (sp < m) {
        val lo = sp * subLen
        val cs = bks(sp)
        var best = 0.0
        var bestC = -1
        var c = 0
        while (c < cs.length) {
          val cc = cs(c)
          var acc = 0.0
          var j = 0
          while (j < subLen) {
            val d = qd(lo + j) - cc(j); acc += d * d; j += 1
          }
          if (bestC < 0 || acc < best) { best = acc; bestC = c }
          c += 1
        }
        val chosen = cs(bestC)
        var j = 0
        while (j < subLen) { xh(lo + j) = chosen(j) / 1000000.0; j += 1 }
        sp += 1
      }
      (qd, xh)
    }
    val in = q.select(col("vec_id").cast("long").as("_1"), col("qe").as("_2"))
      .as[(Long, Array[Long])]
    val out =
      if (withQd)
        in.mapPartitions(_.map { case (id, qe) =>
          val (qd, xh) = encode(qe); (id, qd, xh)
        }).toDF("vec_id", "qd", "xh")
      else
        in.mapPartitions(_.map { case (id, qe) =>
          val (_, xh) = encode(qe)
          // reconstruction norm: the same sequential dot fold the
          // expression tier (sqrt ∘ DotProductExpr) applies
          var acc = 0.0
          var i = 0
          while (i < xh.length) { acc += xh(i) * xh(i); i += 1 }
          (id, xh, math.sqrt(acc))
        }).toDF("vec_id", "xh", "nrm")
    // MATERIALIZE the code table — it IS the index artifact a serving
    // system stores; scoring and cell assignment read it as data.
    out.localCheckpoint(true)
  }

  /** IVF-PQ composition (the FAISS IVFPQ serving shape, non-residual):
    * the deterministic md5-cell inverted file prunes the corpus to the
    * nProbe best cells per query, and the trained PQ codebooks provide
    * asymmetric-distance scoring WITHIN the probed cells only — so a
    * query scores ~nProbe/nCells of the code table instead of all of it.
    * This is the billion-vector serving index: coarse cells bound the
    * scan, codes bound the memory, the (tiny) codebooks ride the plan.
    *
    * Reuses pqTopK's deterministic trainings via the codebook cache (same
    * corpus + params → same books, no retrain) and ivfTopK's cell
    * arithmetic — except assignment runs over the micro-quantized vectors
    * the codes are built from, so the DuckDB oracle replays every stage
    * from one shared corpus representation, bit-for-bit. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
                m: Int = 16, k: Int = 16, updates: Int = 2, dim: Int = 64,
                nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val q = microQuantized(corpus)
    val books = trainedPqBooks(corpus, q, m, k, updates, dim)
    val cents = Array.tabulate(nCells, dim)((c, d) => cellComponent(c, d + 1))
    val cnorm = cents.map(cv => math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)))
    def cellSims(e: Column): Column = array((0 until nCells).map { c =>
      dot(e, array(cents(c).map(lit).toSeq: _*)) / lit(cnorm(c))
    }: _*)
    // coarse cell assignment over the PQ code table (cell sims over the
    // micro-unit vector — argmax is scale-invariant, and the oracle
    // computes from the same integers). Broadcast-matrix mapPartitions,
    // not the 16×64-literal expression array: that tree is past codegen
    // limits and evaluated interpreted (measured 848 CPU-s for 200k rows
    // at the 100× tier; this loop is ~8 s). Bit-identical: sequential
    // dot fold (DotProductExpr's order), /cnorm, strict-> argmax keeping
    // the lowest cell on ties (= array_position of array_max).
    val sess = corpus.sparkSession
    import sess.implicits._
    val bcCells = sess.sparkContext.broadcast((cents, cnorm))
    val indexed = pqReconstruct(q, books, m, dim)
      .select(col("vec_id").cast("long").as("_1"), col("qd").as("_2"),
        col("xh").as("_3"))
      .as[(Long, Array[Double], Array[Double])]
      .mapPartitions { it =>
        val (cs, cn) = bcCells.value
        it.map { case (id, qd, xh) =>
          var best = 0.0
          var bestC = -1
          var c = 0
          while (c < cs.length) {
            val cc = cs(c)
            var acc = 0.0
            var i = 0
            while (i < qd.length) { acc += qd(i) * cc(i); i += 1 }
            val sim = acc / cn(c)
            if (bestC < 0 || sim > best) { best = sim; bestC = c }
            c += 1
          }
          var nacc = 0.0
          var i = 0
          while (i < xh.length) { nacc += xh(i) * xh(i); i += 1 }
          (id, bestC, xh, math.sqrt(nacc))
        }
      }
      .toDF("vec_id", "cell", "xh", "nrm")
    val qx = queries
      .select(col("q_id"), toDoubleArr(col("q_emb")).as("qv"))
      .withColumn("qsims", cellSims(col("qv")))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val probes = qx.select(col("q_id"), col("qv"), col("qn"),
        posexplode(col("qsims")).as(Seq("cell", "csim")))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("csim").desc, col("cell"))))
      .where(col("prank") <= nProbe)
      .select("q_id", "qv", "qn", "cell")
    val cand = indexed.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("xh"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(cand, topK)
  }

  /** Residual IVF-PQ — the actual FAISS IVFPQ formulation: a TRAINED
    * k-means coarse quantizer (deterministic Lloyd's, shared with
    * ann_ivf_kmeans) partitions the corpus, and PQ codebooks are trained
    * on the RESIDUALS (vector − its cell centroid) rather than the raw
    * vectors. Because each cell's residual distribution is centered at
    * the origin with less variance than the corpus, the same m×k code
    * budget quantizes finer — the recall lift over the non-residual
    * composition is spec-pinned (IvfPqResidualSpec).
    *
    * Determinism contract (DuckDB replays every stage bit-for-bit):
    *  - coarse centroids are micro-unit doubles from exact integer sums
    *    (kmeansTrained); residuals subtract the HALF_UP-rounded integer
    *    centroid, so the residual corpus is integer micro-units and PQ
    *    training stays order-independent;
    *  - reconstruction adds book/1e6 and centInt/1e6 per dimension in
    *    that order; scoring reuses the shared left-fold dot product.
    *
    * Scale shape: coarse training is capped at trainCap samples; the
    * residual projection is one narrow map (centroid literals ride the
    * plan); PQ training runs over the checkpointed residual corpus; a
    * query scores ~nProbe/nCells of the code table. Driver state =
    * k×dim + m×k×(dim/m) doubles. */
  def ivfPqResidualTopK(s: SparkSession, corpus: DataFrame, queries: DataFrame,
                        topK: Int, m: Int = 16, k: Int = 16,
                        updates: Int = 2, dim: Int = 64,
                        nCells: Int = 16, nProbe: Int = 4,
                        knownCount: Option[Long] = None): DataFrame = {
    val (assigned, cents) =
      kmeansTrained(s, corpus, nCells, updates, dim, knownCount)
    // HALF_UP away-from-zero rounding — what Spark SQL round() and DuckDB
    // round() both do on doubles (math.round would differ at negative .5)
    def halfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val centInt: Array[Array[Long]] = cents.map(_.map(halfUp))
    val centIntLit = array(centInt.map(c =>
      array(c.map(lit).toSeq: _*)).toSeq: _*)
    // residual corpus in exact integer micro-units, checkpointed once —
    // the m PQ training chains and the encode pass all read it
    val rq = assigned
      .withColumn("cm", element_at(centIntLit, col("cid") + 1))
      .withColumn("qe", zip_with(col("qe"), col("cm"), (a, b) => a - b))
      .select("vec_id", "cid", "qe")
      .localCheckpoint(true)
    val books = trainedPqBooks(rq.select("vec_id", "qe"),
      rq.select("vec_id", "qe"), m, k, updates, dim)
    // PQ-encode the residuals, then add the cell centroid back:
    // xh[i] = book_micro[i]/1e6 + centInt[i]/1e6 (same two-step in SQL)
    val indexed = pqReconstruct(rq.select("vec_id", "qe"), books, m, dim)
      .join(rq.select("vec_id", "cid"), Seq("vec_id"))
      .withColumn("cm", element_at(centIntLit, col("cid") + 1))
      .withColumn("xh", zip_with(col("xh"), col("cm"),
        (r, c) => r + c.cast("double") / lit(1000000.0)))
      .withColumn("nrm", sqrt(dot(col("xh"), col("xh"))))
      .select("vec_id", "cid", "xh", "nrm")
    // probe the nProbe nearest trained cells per query — the SAME
    // micro-unit squared distance the corpus assignment used
    val qmicro = queries.select(col("q_id"), col("q_emb"),
      expr("transform(q_emb, x -> " +
        "CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE))")
        .as("qd"))
    val qdists = array(cents.map { c =>
      graft.plans.DotProduct.sqDist(col("qd"), array(c.map(lit).toSeq: _*))
    }.toSeq: _*)
    val qx = qmicro
      .withColumn("dists", qdists)
      .withColumn("qv", toDoubleArr(col("q_emb")))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val probes = qx.select(col("q_id"), col("qv"), col("qn"),
        posexplode(col("dists")).as(Seq("cid", "cdist")))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cdist"), col("cid"))))
      .where(col("prank") <= nProbe)
      .select("q_id", "qv", "qn", "cid")
    val cand = indexed.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("xh"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    topKPerQuery(cand, topK)
  }

  /** TRAINED k-means IVF index build (Lloyd's algorithm), formulated so
    * the DuckDB oracle computes BIT-IDENTICAL centroids and assignments:
    *
    *  - embeddings quantize to integer micro-units, so per-cluster
    *    centroid SUMS are exact Longs — order-independent, no FP
    *    summation ambiguity between engines;
    *  - seeding picks the k corpus vectors with the smallest md5-derived
    *    hash (deterministic, engine-independent);
    *  - distances fold left-to-right over the dimension index in both
    *    engines (Spark aggregate HOF ≡ DuckDB list_reduce with a
    *    prepended 0.0), ties break to the lowest centroid id.
    *
    * Scale shape (the MLlib pattern): centroids are driver-held (k×dim is
    * tiny) and broadcast into a narrow assignment pass; the update is a
    * (cid, dim) partial aggregation collecting k×dim rows to the driver.
    * Each round is one scan of the checkpointed quantized corpus. The
    * resulting (vec_id → cid) assignment IS the inverted file; probing
    * reuses the ivfTopK shape. */
  def kmeansAssignments(s: SparkSession, corpus: DataFrame, k: Int = 8,
                        updates: Int = 2, dim: Int = 64,
                        knownCount: Option[Long] = None): DataFrame =
    kmeansAssigned(s, corpus, k, updates, dim, knownCount)
      .select(col("vec_id"), col("cid"), round(col("dist"), 6).as("dist"))

  /** Above this k, centroids stop riding the plan as literals: a 1000-
    * cell SemDeDup assignment would put k×dim ≈ 64k literal nodes in one
    * projection — past Janino's method limits the expression falls back
    * to interpreted eval, ~1000 virtual calls per row per pass. The
    * broadcast-mapPartitions path below holds the SAME arithmetic (the
    * SqDistExpr sequential fold, strict-< argmin = lowest cid on ties)
    * in a tight primitive loop over a broadcast centroid matrix — the
    * MLlib assignment shape, exact to the last bit. */
  private[graft] val litCentroidCap = 64

  /** One Lloyd's assignment of (vec_id, qe) micro-quantized rows against
    * a given centroid set: literal-array codegen path under
    * litCentroidCap, broadcast-matrix path above — bit-identical
    * arithmetic either way (see litCentroidCap doc). Shared by
    * kmeansTrained's rounds and the artifact serve path. */
  private[graft] def assignOver(s: SparkSession, df: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    if (cents.length <= litCentroidCap) {
      // codegen'd SqDistExpr — identical left-fold to the HOF idiom the
      // oracle replays, minus the per-(row, centroid) interpreter
      // overhead. Centroid literals ride the plan: only viable while
      // k×dim literals fit a codegen'd projection.
      val dists = array(cents.map { c =>
        graft.plans.DotProduct.sqDist(col("qd"),
          array(c.map(lit).toSeq: _*))
      }.toSeq: _*)
      df.withColumn("qd", expr("transform(qe, x -> CAST(x AS DOUBLE))"))
        .withColumn("dists", dists)
        .withColumn("dist", array_min(col("dists")))
        .withColumn("cid",
          (array_position(col("dists"), col("dist")) - 1).cast("int"))
        .select("vec_id", "qe", "cid", "dist")
    } else assignViaBroadcast(s, df, cents)

  /** The trained coarse-quantizer centroids alone — the index-build
    * surface for the IVF/k-means family (k × dim micro-unit doubles). */
  def kmeansCentroids(s: SparkSession, corpus: DataFrame, k: Int = 8,
      updates: Int = 2, dim: Int = 64, knownCount: Option[Long] = None)
      : Array[Array[Double]] =
    kmeansTrained(s, corpus, k, updates, dim, knownCount)._2

  /** kmeansAssignments with EXTERNALLY-SUPPLIED centroids (the
    * load-and-serve surface): one assignment pass, no training rounds —
    * output shape and arithmetic identical to kmeansAssignments when
    * the centroids are the trained set. */
  def assignWithCentroids(s: SparkSession, corpus: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val q = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("qe"))
      .repartition(col("vec_id"))
    assignOver(s, q, cents)
      .select(col("vec_id"), col("cid"), round(col("dist"), 6).as("dist"))
  }

  /** Broadcast-centroid Lloyd's assignment for large k: (vec_id, qe) →
    * (vec_id, qe, cid, dist), bit-identical to the literal-array path. */
  private[graft] def assignViaBroadcast(s: SparkSession, df: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    df.select(col("vec_id").cast("long").as("_1"), col("qe").as("_2"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, qe) =>
          val x = new Array[Double](qe.length)
          var d0 = 0
          while (d0 < x.length) { x(d0) = qe(d0).toDouble; d0 += 1 }
          var best = 0.0
          var bestC = -1
          var c = 0
          while (c < cs.length) {
            val cc = cs(c)
            var acc = 0.0
            var i = 0
            while (i < x.length) {
              val d = x(i) - cc(i); acc += d * d; i += 1
            }
            if (bestC < 0 || acc < best) { best = acc; bestC = c }
            c += 1
          }
          (id, qe, bestC, best)
        }
      }
      .toDF("vec_id", "qe", "cid", "dist")
  }

  /** Final-round Lloyd's assignment WITH the micro-quantized vectors
    * (vec_id, qe, cid, dist) — shared by the IVF entry (kmeansAssignments)
    * and semantic dedup, which needs qe for within-cluster similarity. */
  private[graft] def kmeansAssigned(s: SparkSession, corpus: DataFrame,
                                    k: Int = 8, updates: Int = 2,
                                    dim: Int = 64,
                                    knownCount: Option[Long] = None)
      : DataFrame = kmeansTrained(s, corpus, k, updates, dim, knownCount)._1

  /** kmeansAssigned plus the trained centroids themselves (micro-unit
    * doubles, k×dim — driver-held) for consumers that need the
    * coarse-quantizer geometry, not just the assignment: residual IVF-PQ
    * subtracts each vector's cell centroid before PQ encoding. */
  private[graft] def kmeansTrained(s: SparkSession, corpus: DataFrame,
                                   k: Int = 8, updates: Int = 2,
                                   dim: Int = 64,
                                   knownCount: Option[Long] = None)
      : (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val q = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("qe"))
      // spread a compact single-split corpus before the per-round
      // assignment scans (same rationale as microQuantized)
      .repartition(col("vec_id"))
      .localCheckpoint(true)
    // Lloyd's UPDATE rounds run over the capped training sample (= the
    // whole corpus below trainCap, so oracle replay at verify SF is
    // unchanged); the final assignment below covers every vector.
    // knownCount (Tables.cachedCount — one count per table per session)
    // spares the stray corpus pass for this one scalar.
    val qt =
      if (knownCount.getOrElse(q.count()) > trainCap) trainSample(q) else q
    val seeds = qt.select(col("vec_id"), col("qe"),
      expr("CAST(conv(substr(md5(concat('ivfseed_', " +
        "CAST(vec_id AS STRING))), 1, 13), 16, 10) AS BIGINT)").as("h"))
      .orderBy("h", "vec_id").limit(k).collect()
    var cents: Array[Array[Double]] =
      seeds.map(_.getSeq[Long](1).map(_.toDouble).toArray)

    // assignment is a pure MAP-side projection: the k centroid literals
    // ride in the plan, each vector computes its k distances into one
    // array, and argmin = array_position of the minimum (first hit =
    // lowest cid, the same tie-break as ORDER BY dist, cid). No shuffle,
    // no k-times row blowup — the per-iteration cost is one corpus scan.
    def assignedOver(df: DataFrame): DataFrame = assignOver(s, df, cents)
    def assigned: DataFrame = assignedOver(q)
    for (_ <- 1 to updates) {
      val sums = assignedOver(qt)
        .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, cid) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Double](dim)
            rows.foreach(r =>
              arr(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3))
            arr
          case None => old // an empty cluster keeps its centroid
        }
      }
    }
    (assigned, cents)
  }

  /** SemDeDup cell count for an n-vector corpus: one cell per ~512
    * vectors, floor 8 — the same count-derived sizing as the LSH
    * signature width. Keeps expected per-cell pairwise work at
    * ~512²/2 comparisons regardless of corpus size, which is the
    * SemDeDup paper's own scaling prescription (k grows with N so the
    * within-cell quadratic stays bounded). Integer arithmetic so the
    * DuckDB oracle derives the identical k from its own count(*). */
  def semanticCells(n: Long): Int = math.max(8L, (n + 511L) / 512L).toInt

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): k-means cells
    * bound the pairwise cosine check, so the quadratic runs only WITHIN a
    * cluster instead of across the corpus. A vector is a duplicate when a
    * LOWER-id vector in the same cell has cosine >= tau — a deterministic
    * greedy keep-first rule (the paper keeps one representative per
    * similarity group; keep-lowest-id is its order-stable form).
    *
    * Scale shape: the only wide exchange is keyed by cid (the self-join);
    * each cell's pairs are computed where the cell lives, candidates never
    * leave their partition, and the per-cell quadratic is bounded by cell
    * size — exactly the published algorithm's cost model (production runs
    * cap cell sizes by raising k). Training reuses the deterministic
    * Lloyd's pass, so the DuckDB oracle replays clustering AND pruning
    * bit-for-bit. Output: every vector with its cell and is_dup flag.
    *
    * k defaults to COUNT-DERIVED (semanticCells): the paper's cost model
    * only holds when k grows with the corpus — a fixed k leaves (N/k)²
    * per-cell work quadratic in N. Pass k > 0 to pin it explicitly. */
  def semanticDedup(s: SparkSession, corpus: DataFrame, tau: Double = 0.35,
                    k: Int = 0, updates: Int = 2, dim: Int = 64,
                    knownCount: Option[Long] = None): DataFrame = {
    val kk =
      if (k > 0) k
      else semanticCells(knownCount.getOrElse(corpus.count()))
    // NOT checkpointed: the assignment feeds three consumers, but
    // recomputing the broadcast-matrix pass pipelined into each join is
    // measurably cheaper than materializing the wide (qd, nrm) rows
    // (100× tier: 21.8s recompute vs 27.5s checkpointed)
    val a = kmeansAssigned(s, corpus, kk, updates, dim, knownCount)
      .withColumn("qd", expr("transform(qe, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(dot(col("qd"), col("qd"))))
      .select("vec_id", "cid", "qd", "nrm")
    val dups = a.as("x")
      .join(a.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .where(round(dot(col("x.qd"), col("y.qd")) /
        (col("x.nrm") * col("y.nrm")), 6) >= tau)
      .select(col("y.vec_id").as("vec_id")).distinct()
    a.join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
  }
}
