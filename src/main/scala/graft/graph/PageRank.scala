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
  * replays rounds verbatim. Dangling-mass redistribution is intentionally
  * omitted (the common simplified variant) — noted, not hidden. */
object PageRank {

  /** Run `iters` fixed-point PageRank rounds over a directed edge list
    * (src: BIGINT, dst: BIGINT). Returns (vertex, rank_fp) for every
    * vertex, rank in 1e-6 units. */
  def ranks(s: SparkSession, edges: DataFrame, iters: Int): DataFrame = {
    // outdeg folded into the edge table in the SAME pass as the dedup
    // (distinct shuffles by (src,dst) — the window by src rides the
    // partial order with no second wide exchange), checkpointed once;
    // rounds then never join a degree table
    val e = edges.select(col("src"), col("dst")).distinct()
      .withColumn("outdeg",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex"))).distinct()
      .localCheckpoint(true)
    // vertices with no in-edge hold the base rank in EVERY round — a
    // static set, computed once; rounds then union a constant instead of
    // re-joining the full vertex table (one fewer shuffle per round)
    val noInbound = vertices
      .join(e.select(col("dst").as("vertex")).distinct(),
        Seq("vertex"), "left_anti")
      .withColumn("rank_fp", lit(150000L))
      .localCheckpoint(true)
    var r = vertices.withColumn("rank_fp", lit(1000000L))
    for (_ <- 1 to iters) {
      val received = r.join(e, r("vertex") === e("src"))
        .select(col("dst"), expr("rank_fp div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        .select(col("dst").as("vertex"),
          (lit(150000L) + expr("(85 * in_sum) div 100")).as("rank_fp"))
      r = received.union(noInbound).localCheckpoint(true)
    }
    r
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
