package graft.tools

import graft.synth.ClipTableGen
import org.apache.spark.sql.SparkSession

/** Materialize the synthetic input_hint clip table to parquet — shared
  * setup step for bench/scaling experiments so repeated legs can reuse one
  * input. Usage: runMain graft.tools.MakeClips <nClips> <outDir> */
object MakeClips {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val dir = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("graft-make-clips")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ClipTableGen.table(spark, n).write.mode("overwrite").parquet(dir)
    spark.stop()
  }
}
