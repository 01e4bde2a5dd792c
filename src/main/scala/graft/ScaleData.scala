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
  * Usage: ScaleData <srcSfDir> <destDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
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

    for (t <- Seq("region", "nation"))
      writeSingleFile(spark.read.parquet(s"$src/$t.parquet"), t)

    def replicate(name: String, keyCols: Seq[String])(
        xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until factor).map { i =>
        val shifted = keyCols.foldLeft(base)((df, c) =>
          df.withColumn(c, col(c) + lit(shift * i)))
        xform(shifted, i)
      }.reduce(_ unionAll _)
      writeSingleFile(out, name)
    }

    replicate("customer", Seq("c_custkey"))((df, _) => df)
    replicate("supplier", Seq("s_suppkey"))((df, _) => df)
    replicate("part", Seq("p_partkey"))((df, _) => df)
    replicate("orders", Seq("o_orderkey", "o_custkey"))((df, _) => df)
    replicate("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey"))((df, _) => df)
    replicate("events", Seq("event_id", "user_id"))((df, _) => df)
    replicate("documents", Seq("doc_id")) { (df, i) =>
      if (i == 0) df
      else df.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1_r" + i))
    }
    replicate("embeddings", Seq("vec_id")) { (df, i) =>
      if (i == 0) df
      else df.withColumn("embedding", expr(
        s"transform(sequence(1, size(embedding)), d -> " +
          s"element_at(embedding, ((d - 1 + $i) % size(embedding)) + 1))"))
    }
    spark.stop()
  }
}
