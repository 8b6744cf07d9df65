package graft

/** Dev harness: print one query's oracle SQL (for standalone DuckDB
  * testing of a new oracle before a full verify cycle).
  */
object PrintOracle {
  def main(args: Array[String]): Unit =
    args.foreach(name => println(SparkEntry.oracleSql(name)))
}
