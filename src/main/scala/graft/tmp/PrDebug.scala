package graft.tmp
import org.apache.spark.sql.functions._
object PrDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](n: String)(b: => T): T = { val t0=System.nanoTime; val r=b; println(f"$n: ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    // warm table reads
    graft.Tables.lineitem(spark, d).count(); graft.Tables.orders(spark, d).count()
    val pairs = time("pairs ckpt")(graft.Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") + 1000000000L).as("sv"), (col("o_custkey") + 2000000000L).as("cv")).distinct().localCheckpoint(true))
    val edges = pairs.select(col("sv").as("src"), col("cv").as("dst")).union(pairs.select(col("cv").as("src"), col("sv").as("dst")))
    val e = time("e persist")({
      val x = edges.select(col("src"), col("dst")).distinct()
        .withColumn("outdeg", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
        .sortWithinPartitions("src").persist()
      x.count(); x })
    val vertices = e.select(col("src").as("vertex")).union(e.select(col("dst").as("vertex"))).distinct()
    val noInbound = time("noInbound")(vertices.join(e.select(col("dst").as("vertex")).distinct(), Seq("vertex"), "left_anti")
      .withColumn("rank_fp", lit(150000L)).localCheckpoint(true))
    var r = vertices.withColumn("rank_fp", lit(1000000L))
    val received = r.join(e, r("vertex") === e("src"))
      .select(col("dst"), expr("rank_fp div outdeg").as("c"))
      .groupBy("dst").agg(sum(col("c")).as("in_sum"))
      .select(col("dst").as("vertex"), (lit(150000L) + expr("(85 * in_sum) div 100")).as("rank_fp"))
    val r1 = received.union(noInbound)
    time("round1 count")(r1.count())
    var rr = r1
    for (i <- 2 to 3) {
      val rec = rr.join(e, rr("vertex") === e("src"))
        .select(col("dst"), expr("rank_fp div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        .select(col("dst").as("vertex"), (lit(150000L) + expr("(85 * in_sum) div 100")).as("rank_fp"))
      rr = rec.union(noInbound)
    }
    time("rounds2-3+count")(rr.count())
    println(r1.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
