package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs live under graft.queries.*; this object only aggregates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Dataflow.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.LlmPipeline.queries ++
      graft.queries.CorpusBuild.queries ++
      graft.queries.Profile.queries ++
      graft.queries.Sketches.queries ++
      graft.queries.Layout.queries ++
      graft.queries.UdLang.queries

  /** Queries that exist as EXACTNESS BASELINES (deliberately quadratic
    * oracle twins of a bucketed scale path), not as production plans.
    * They stay in `queries` so correctness keeps pinning the scale paths
    * against them, but Bench reports them separately so the headline total
    * reflects only plans that survive a 100x scale-up.
    *   embed_neardup — O(n²) cosine cross-join; scale path = ann_lsh. */
  val baselineOnly: Set[String] = Set("embed_neardup")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Dataflow.oracle ++
      graft.queries.Scalars.oracle ++
      graft.queries.LlmPipeline.oracle ++
      graft.queries.CorpusBuild.oracle ++
      graft.queries.Profile.oracle ++
      graft.queries.Sketches.oracle ++
      graft.queries.Layout.oracle ++
      graft.queries.UdLang.oracle
}
