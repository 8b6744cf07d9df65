package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of a catalog query.
  * Usage: runMain graft.ExplainQ <queryName> [sfDir]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
