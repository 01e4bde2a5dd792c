package graft.sources

import graft.SparkSpec
import graft.sinks.ShardedWriter
import org.apache.spark.sql.functions._

class ShardedWriterSpec extends SparkSpec {

  test("sharded write produces Hive partition dirs matching the manifest") {
    val docs = graft.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = ShardedWriter.writeShards(spark, docs, out, shards = 8)
      .collect()
    // 8 shard directories on disk, Hive-style
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard="))
      .sorted
    assert(dirs.length == 8, s"dirs ${dirs.mkString(",")}")
    assert(manifest.map(_.getAs[Int]("shard")).sorted.toSeq == (0 until 8))
    // the written corpus round-trips completely
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // manifest counts equal what a reader sees per shard
    val reread = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getAs[Int]("shard") ->
        (r.getAs[Long]("n"), r.getAs[Long]("t"))).toMap
    manifest.foreach { r =>
      val (n, t) = reread(r.getAs[Int]("shard"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_tokens") == t)
    }
    // token balance: within one max-doc of the ideal shard mass
    val toks = docs.select(size(split(col("text"), "\\s+")).cast("long"))
      .collect().map(_.getLong(0))
    val mean = toks.sum.toDouble / 8
    manifest.foreach { r =>
      val t = r.getAs[Long]("n_tokens")
      assert(math.abs(t - mean) <= toks.max,
        s"shard ${r.getAs[Int]("shard")} tokens $t vs mean $mean")
    }
    // shard pruning survives the layout: a single-shard read plans a
    // PartitionFilters-pruned scan, not a full-corpus filter
    val pruned = back.where(col("shard") === 3)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
      .toString
    assert(scan.contains("PartitionFilters: [isnotnull(shard"),
      s"no partition pruning in: ${scan.take(300)}")
  }
}
