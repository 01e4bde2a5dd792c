package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derive a larger benchmark tier from driver-generated test data by
  * deterministic replication — measurement data for the scaling curve,
  * NOT correctness input (the DuckDB oracle gate stays on the driver's
  * own sf0.01 tier).
  *
  * Replication preserves workload character per table, mirroring how
  * TPC-H itself scales:
  *  - region/nation copy 1x (fixed at every TPC-H SF);
  *  - customer/supplier/part replicate with shifted keys — they scale
  *    WITH the facts, so per-customer order/event counts (join degrees)
  *    stay constant instead of growing 10x;
  *  - facts (orders lineitem events) replicate with primary AND foreign
  *    keys shifted by i·10^6 consistently, so each replica is a
  *    self-contained copy of the original join graph;
  *  - documents namespace every token per replica (suffix _rI), so each
  *    replica reproduces the original duplicate/shingle structure without
  *    creating cross-replica duplicates — dedup output scales linearly
  *    by construction, as it would with 10x more real crawl data;
  *  - embeddings rotate dimensions per replica (iid dims → the rotated
  *    corpus is distribution-identical, and a replica vector correlates
  *    with the originals like any random pair).
  *
  * Usage: ScaleData <srcSfDir> <destDir> <factor> [table ...]
  * (optional trailing table names restrict derivation — e.g. deriving
  * ONLY embeddings at factor 1000 for the LSH occupancy probe instead
  * of paying for a full 16 GB tier).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val (src, dst, factorS) = (args(0), args(1), args(2))
    val only = args.drop(3).toSet
    def want(t: String): Boolean = only.isEmpty || only(t)
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shift = 1000000L

    // The driver's layout is ONE FILE per table (events.parquet is a
    // file, not a directory) and the streaming entries glob on that file
    // name — mirror it: write a single part, then move it into place.
    def writeSingleFile(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/_tmp_$name"
      // One FILE but many ROW GROUPS: a single-row-group gigabyte file is
      // unsplittable, so every scan of the derived tier would run one
      // task no matter the cluster (exactly the skew this tier exists to
      // measure away). 8 MB groups keep a 1 GB table widely splittable
      // (the writer's buffered-size estimate overshoots, so the actual
      // groups land several times larger).
      // per-write option only — mutating the shared hadoopConfiguration
      // here would silently give every later parquet write in this
      // session 8 MB row groups
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 8388608L)
        .parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))(0).getPath
      val target = new org.apache.hadoop.fs.Path(s"$dst/$name.parquet")
      fs.delete(target, false)
      fs.rename(part, target)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    for (t <- Seq("region", "nation") if want(t))
      writeSingleFile(spark.read.parquet(s"$src/$t.parquet"), t)

    // Replication via ONE scan + explode(sequence(0, factor-1)) with
    // column-level per-replica transforms — value-identical rows to the
    // old per-replica union (key + i·shift, the same text/embedding
    // transforms keyed on the replica index), but the plan stays one
    // narrow projection at ANY factor, where a factor-way union was
    // O(factor) to plan (a 1000-replica tier would spend minutes in
    // Catalyst before reading a row).
    def replicate(name: String, keyCols: Seq[String])(
        xform: DataFrame => DataFrame = identity): Unit = if (want(name)) {
      val base = spark.read.parquet(s"$src/$name.parquet")
        .withColumn("_i", explode(sequence(lit(0), lit(factor - 1))))
      val shifted = keyCols.foldLeft(base)((df, c) =>
        df.withColumn(c, col(c) + col("_i") * lit(shift)))
      writeSingleFile(xform(shifted).drop("_i"), name)
    }

    replicate("customer", Seq("c_custkey"))()
    replicate("supplier", Seq("s_suppkey"))()
    replicate("part", Seq("p_partkey"))()
    replicate("orders", Seq("o_orderkey", "o_custkey"))()
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))()
    replicate("events", Seq("event_id", "user_id"))()
    replicate("documents", Seq("doc_id")) { df =>
      df.withColumn("text",
        when(col("_i") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_r"), col("_i")))))
    }
    replicate("embeddings", Seq("vec_id")) { df =>
      df.withColumn("embedding",
        when(col("_i") === 0, col("embedding")).otherwise(expr(
          "transform(sequence(1, size(embedding)), d -> " +
            "element_at(embedding, ((d - 1 + _i) % size(embedding)) + 1))")))
    }
    spark.stop()
  }
}
