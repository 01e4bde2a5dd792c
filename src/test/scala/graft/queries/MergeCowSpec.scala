package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the copy-on-write MERGE contract (sinks.MergeCow):
  *  - untouched partitions' files are BYTE-IDENTICAL after the rewrite
  *    (same paths, same md5) — the property that bounds MERGE cost by
  *    the touched data, not the table size;
  *  - touched partitions are fully replaced (new file set), including
  *    partition creation for inserted keys and partition removal when
  *    every row is deleted;
  *  - the committed table read back equals the logical merge;
  *  - re-applying the same feed leaves the logical contents unchanged.
  */
class MergeCowSpec extends SparkSpec {

  private def md5(p: java.nio.file.Path): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(p)).map(b => f"$b%02x")
      .mkString
  }

  /** All data files under dir: relative path -> md5. */
  private def inventory(dir: String): Map[String, String] = {
    val root = java.nio.file.Paths.get(dir)
    val out = Map.newBuilder[String, String]
    java.nio.file.Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (rel.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p))
        out += (rel -> md5(p))
    }
    out.result()
  }

  private def rmr(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("COW rewrite: untouched partitions byte-identical, touched " +
    "replaced, read-back equals the logical merge, reapply is a no-op") {
    import spark.implicits._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_cow_spec").toString
    try {
      val tableDir = s"$scratch/table"
      // base: keys 1..100 except pk=6 keys (so an insert can CREATE that
      // partition); pk = key % 8
      val base = (1L to 100L).filter(_ % 8 != 6)
        .map(k => (k, s"name-$k", k * 1.5))
        .toDF("custkey", "name", "acctbal")
        .withColumn("pk", (col("custkey") % 8).cast("int"))
      base.write.partitionBy("pk").parquet(tableDir)
      val before = inventory(tableDir)
      assert(before.nonEmpty)

      // feed: update key 9 (pk=1), delete ALL pk=5 keys (partition
      // removal), insert key 206 (pk=6, partition creation)
      val pk5Deletes = (1L to 100L).filter(k => k % 8 == 5)
        .map(k => (k, "D", 0.0))
      val feed = (Seq((9L, "U", 99.9), (206L, "U", 42.0)) ++ pk5Deletes)
        .toDF("custkey", "op", "new_bal")
      val touched = feed.select((col("custkey") % 8).cast("int").as("pk"))
        .distinct().collect().map(_.getInt(0)).sorted
      assert(touched.toSeq == Seq(1, 5, 6))

      def applyFeed(): Unit = {
        val baseTouched = spark.read.parquet(tableDir)
          .where(col("pk").isin(touched.map(Integer.valueOf).toSeq: _*))
        val newData = baseTouched.drop("pk")
          .join(feed, Seq("custkey"), "full_outer")
          .where(col("op").isNull || col("op") =!= "D")
          .select(col("custkey"),
            coalesce(col("name"), concat(lit("new-"), col("custkey")))
              .as("name"),
            when(col("op") === "U", col("new_bal")).otherwise(col("acctbal"))
              .as("acctbal"),
            (col("custkey") % 8).cast("int").as("pk"))
        graft.sinks.MergeCow.rewritePartitions(spark, tableDir, "pk",
          touched.map(_.toString).toIndexedSeq, newData)
      }
      applyFeed()
      val after = inventory(tableDir)

      val untouchedBefore = before.filter { case (rel, _) =>
        !Seq("pk=1/", "pk=5/", "pk=6/").exists(rel.startsWith)
      }
      val untouchedAfter = after.filter { case (rel, _) =>
        !Seq("pk=1/", "pk=5/", "pk=6/").exists(rel.startsWith)
      }
      assert(untouchedAfter == untouchedBefore,
        "untouched partition files must be byte-identical")
      // pk=5 fully deleted; pk=6 created; pk=1 rewritten with new files
      assert(!after.keys.exists(_.startsWith("pk=5/")))
      assert(after.keys.exists(_.startsWith("pk=6/")))
      val pk1After = after.keys.filter(_.startsWith("pk=1/")).toSet
      assert(pk1After.nonEmpty &&
        pk1After.forall(f => !before.contains(f)),
        "touched partition must be a fresh file set")

      def readBack() = spark.read.parquet(tableDir)
        .select("custkey", "name", "acctbal", "pk")
        .as[(Long, String, Double, Int)].collect().toSet
      val expected = ((1L to 100L).filter(_ % 8 != 6)
        .filterNot(_ % 8 == 5)
        .map(k => if (k == 9L) (k, s"name-$k", 99.9, 1)
                  else (k, s"name-$k", k * 1.5, (k % 8).toInt))
        :+ ((206L, "new-206", 42.0, 6))).toSet
      assert(readBack() == expected)

      // reapply: same feed over the already-merged table — logical
      // contents unchanged (update to same value, deletes gone, insert
      // now matches as an update to the same value)
      applyFeed()
      // the reapplied insert matches the now-existing row as an update
      // to the same value, keeping its stored name — contents unchanged
      assert(readBack() == expected)
    } finally rmr(scratch)
  }
}
