package graft

/** Debug utility: print a registered oracle SQL string by query name
  * (`tools/run_class.sh graft.DumpOracle <name>`), so generated chains
  * can be inspected / run against DuckDB directly while iterating on an
  * entry. No SparkSession is created. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      SparkEntry.oracleSql.keys.toSeq.sorted.foreach(println)
    } else {
      args.foreach { name =>
        SparkEntry.oracleSql.get(name) match {
          case Some(sql) => println(sql)
          case None =>
            System.err.println(s"no oracle registered for '$name'")
            sys.exit(1)
        }
      }
    }
  }
}
