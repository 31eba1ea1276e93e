package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Debug utility: print the executed physical plan of one driver query.
  * Usage: PlanDump <query_name> [sfDir]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.collect()
    println(f"[plandump] $name wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
