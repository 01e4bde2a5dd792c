package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank as Pregel-in-DataFrames — graph centrality beside the
  * connected-components operator (graft.dedup.Dedup.connectedComponents).
  *
  * Each iteration is the classic two-shuffle shape: ranks join edges on
  * src (contribution = rank/outdeg flows along the edge), aggregate by
  * dst, rejoin the vertex set so sinks keep the base rank. Lineage is cut
  * per round (localCheckpoint) exactly like the CC pointer-jumping loop,
  * so AQE re-plans each round on real sizes; edges ship (src, dst) longs
  * only. At cluster scale the edge table would be pre-partitioned by src
  * so the contribution join is co-located — documented over re-proving.
  *
  * Cross-engine exactness: ranks live in FIXED-POINT micro-units (BIGINT).
  * r0 = 1e6; contribution = r div outdeg (truncating integer division);
  * r' = 0.15e6 + (85 * sum_contrib) div 100. Integer ops all the way —
  * no float summation order, no damping rounding skew; the DuckDB oracle
  * replays rounds verbatim. The default is the common simplified variant
  * (no dangling-mass term); `redistributeDangling = true` adds the full
  * redistribution for one extra scalar aggregate per round. */
object PageRank {

  /** Run `iters` fixed-point PageRank rounds over a directed edge list
    * (src: BIGINT, dst: BIGINT). Returns (vertex, rank_fp) for every
    * vertex, rank in 1e-6 units.
    *
    * The edge table is the reuse hot spot: every round joins it on src.
    * It is persist()ed — NOT localCheckpoint'd — because InMemoryRelation
    * preserves the child plan's partitioning and ordering (and AQE leaves
    * cached-plan partitioning alone by default), while a checkpoint's
    * LogicalRDD degrades to UnknownPartitioning under AQE and every round
    * would re-shuffle and re-sort the full edge set. The outdeg window
    * already hash-partitions by src; one sortWithinPartitions on top
    * makes the cached table satisfy the sort-merge join's distribution
    * AND ordering — rounds then shuffle only the (small) rank table.
    *
    * Round-7 rework, with stage-level evidence this time (the r6 lazy
    * chain measured 27.5s in a loaded bench env, 12.9s clean — and the
    * profile showed WHERE it goes): chaining all rounds lazily into one
    * job makes AQE compile round N's plan with rounds 1..N-1 embedded —
    * 2 MB task binaries broadcast per stage, every query stage a
    * scheduling barrier inside one mega-job, and stage run-time 2-4x its
    * CPU time from the resulting stalls. Materializing EACH round
    * (persist + count, previous round unpersisted once its successor is
    * cached) keeps every plan two stages deep: the contribution join
    * reads the cached edge table in place (AQE auto-broadcasts the
    * 16k-row rank side — no forced hint, so a 100 TB rank table would
    * still shuffle) and only the map-side-combined (dst, sum) partials
    * shuffle. Measured at sf0.1: rounds drop from ~8s each in the lazy
    * chain to ~1s each; whole operator 27.5s -> ~7s. `ckptEvery` still
    * truncates lineage on long runs (the cached-plan TREE keeps growing
    * even though execution always reads the previous round's cache). */
  /** `redistributeDangling = true` runs FULL PageRank: each round the
    * rank mass sitting on dangling vertices (no out-edges) is summed —
    * one scalar aggregate over the cached rank table, the only extra
    * per-round cost — and every vertex receives share = dm div N inside
    * the same damping arithmetic: r' = 0.15e6 + (85*(in_sum+share)) div
    * 100. Still integer end-to-end, so the oracle replays rounds
    * verbatim; the default keeps the simplified variant (and its plan)
    * unchanged. */
  def ranks(s: SparkSession, edges: DataFrame, iters: Int,
            ckptEvery: Int = 8, assumeDistinct: Boolean = false,
            redistributeDangling: Boolean = false): DataFrame = {
    // ONE wide exchange builds the whole edge side: repartition by src
    // satisfies the dedup's ClusteredDistribution (src ⊆ {src,dst}) and
    // the outdeg window's partitioning, so dedup and window run in place
    // on top of it. Deliberately REPARTITION_BY_COL (no partition count)
    // so AQE sizes the exchange to the data rather than a hardcoded N —
    // at 100 TB the advisory partition size decides the width.
    // `assumeDistinct` lets a caller that constructs provably-distinct
    // edges skip the dedup aggregate entirely (the map-side partial agg
    // alone measured ~18s of task CPU on 1.17M rows at 32 partitions).
    val pre = edges.select(col("src"), col("dst")).repartition(col("src"))
    val deduped = if (assumeDistinct) pre else pre.dropDuplicates("src", "dst")
    val e = deduped
      .withColumn("outdeg",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist()
    // no e.count() barrier: verts reads e exactly once, so the verts
    // materialization below populates BOTH caches in one job
    // vertex set and the has-inbound flag in ONE scan of the cached
    // edges: each edge contributes its src (no in-edge evidence) and its
    // dst (in-edge), max-reduced per vertex. Vertices with has_in = 0
    // hold the base rank in EVERY round — a static set, computed once;
    // rounds then union a constant instead of re-joining the full vertex
    // table (one fewer shuffle per round).
    val verts = e.select(explode(array(
        struct(col("src").as("vertex"), lit(0).as("has_in"),
          lit(1).as("has_out")),
        struct(col("dst").as("vertex"), lit(1).as("has_in"),
          lit(0).as("has_out")))).as("v"))
      .select(col("v.vertex").as("vertex"), col("v.has_in").as("has_in"),
        col("v.has_out").as("has_out"))
      .groupBy("vertex").agg(max(col("has_in")).as("has_in"),
        max(col("has_out")).as("has_out"))
      .persist()
    val nVerts = verts.count() // materialize; AQE gets true sizes
    val dangling = verts.where(col("has_out") === 0).select("vertex")
    var r = verts.select(col("vertex"), lit(1000000L).as("rank_fp"))
    var prev: DataFrame = null
    for (i <- 1 to iters) {
      // dangling-mass share this round: one scalar aggregate over the
      // cached rank table (zero when the variant is off or no vertex
      // dangles — the plan below is then byte-for-byte the simple one)
      val share: Long =
        if (!redistributeDangling) 0L
        else {
          val dm = r.join(dangling, Seq("vertex"), "left_semi")
            .agg(coalesce(sum(col("rank_fp")), lit(0L))).head().getLong(0)
          dm / nVerts
        }
      val noInbound = verts.where(col("has_in") === 0)
        .select(col("vertex"),
          lit(150000L + (85L * share) / 100L).as("rank_fp"))
      val received = r.join(e, r("vertex") === e("src"))
        .select(col("dst"), expr("rank_fp div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        .select(col("dst").as("vertex"),
          (lit(150000L) + expr(s"(85 * (in_sum + $share)) div 100"))
            .as("rank_fp"))
      r = received.union(noInbound).persist()
      r.count() // materialize THIS round: keeps every job two stages deep
      if (prev != null) prev.unpersist(false)
      prev = r
      if (i % ckptEvery == 0 && i < iters) {
        // cached-plan trees still accumulate one level per round;
        // truncate periodically so long runs keep small task binaries
        r = r.localCheckpoint(true)
        prev.unpersist(false); prev = null
      }
    }
    e.unpersist(false)
    verts.unpersist(false)
    r
  }

  /** DuckDB replay of the FULL variant: per round, the dangling-mass
    * share (sum of dangling ranks // vertex count) enters the damping
    * term for every vertex — same integer arithmetic as ranks() with
    * redistributeDangling = true. */
  def oracleSqlFull(edgesSql: String, iters: Int): String = {
    def round(i: Int): String =
      s"""d$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(r.rank_fp), 0)
         |    // (SELECT nv FROM nv) AS BIGINT) AS share
         |  FROM r${i - 1} r JOIN dangling d ON r.vertex = d.vertex),
         |r$i AS MATERIALIZED (
         |  SELECT v.vertex,
         |    CAST(150000 + (85 * (coalesce(c.in_sum, 0) +
         |      (SELECT share FROM d$i))) // 100 AS BIGINT) AS rank_fp
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst, CAST(sum(r.rank_fp // e.outdeg) AS BIGINT)
         |      AS in_sum
         |    FROM r${i - 1} r
         |    JOIN e ON r.vertex = e.src
         |    GROUP BY e.dst) c ON c.dst = v.vertex)""".stripMargin
    val rounds = (1 to iters).map(round).mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT src, dst FROM ($edgesSql)),
       |e AS MATERIALIZED (
       |  SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg
       |  FROM e0),
       |verts AS MATERIALIZED (
       |  SELECT DISTINCT vertex FROM (
       |    SELECT src AS vertex FROM e UNION SELECT dst FROM e)),
       |dangling AS MATERIALIZED (
       |  SELECT vertex FROM verts
       |  EXCEPT SELECT DISTINCT src AS vertex FROM e),
       |nv AS (SELECT count(*) AS nv FROM verts),
       |r0 AS (SELECT vertex, CAST(1000000 AS BIGINT) AS rank_fp
       |       FROM verts),
       |$rounds""".stripMargin
  }

  /** DuckDB replay: outdeg + r0, then one CTE per round with the same
    * integer arithmetic. `edgesSql` must yield (src, dst). */
  def oracleSql(edgesSql: String, iters: Int): String = {
    def round(i: Int): String =
      s"""r$i AS (
         |  SELECT v.vertex,
         |    CAST(150000 + (85 * coalesce(c.in_sum, 0)) // 100 AS BIGINT)
         |      AS rank_fp
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst, CAST(sum(r.rank_fp // e.outdeg) AS BIGINT)
         |      AS in_sum
         |    FROM r${i - 1} r
         |    JOIN e ON r.vertex = e.src
         |    GROUP BY e.dst) c ON c.dst = v.vertex)""".stripMargin
    val rounds = (1 to iters).map(round).mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT src, dst FROM ($edgesSql)),
       |e AS (
       |  SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg
       |  FROM e0),
       |verts AS (
       |  SELECT DISTINCT vertex FROM (
       |    SELECT src AS vertex FROM e UNION SELECT dst FROM e)),
       |r0 AS (SELECT vertex, CAST(1000000 AS BIGINT) AS rank_fp
       |       FROM verts),
       |$rounds""".stripMargin
  }
}
