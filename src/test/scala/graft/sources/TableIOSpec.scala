package graft.sources

import graft.SparkTestBase
import graft.synth.ClipTableGen
import org.scalatest.funsuite.AnyFunSuite

class TableIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bucketed layout prunes partitions: pruned scan opens only selected buckets' files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tableio").toString + "/clips"
    val df = ClipTableGen.table(spark, 200)
    TableIO.writeBucketed(df, dir, numBuckets = 8)

    val full = TableIO.read(spark, dir)
    assert(full.count() === df.count())
    assert(full.inputFiles.length >= 8, "expected at least one file per bucket")

    val pruned = TableIO.readBuckets(spark, dir, Seq(0, 3))
    assert(TableIO.scansOnlyBuckets(pruned, Seq(0, 3)),
      s"scan touched non-selected buckets: ${pruned.inputFiles.take(5).mkString(",")}")
    // the pruning is visible in the physical plan as a partition filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(TableIO.PartitionCol))

    // pruned rows = exactly the rows whose hash lands in the buckets
    import org.apache.spark.sql.functions._
    val expected = full.filter(col(TableIO.PartitionCol).isin(0, 3)).count()
    assert(pruned.count() === expected && expected > 0)

    // round-trip fidelity on the pruned slice
    val ids = pruned.select("clip_id").collect().map(_.getString(0)).toSet
    assert(ids.subsetOf(df.select("clip_id").collect().map(_.getString(0)).toSet))
  }
}
