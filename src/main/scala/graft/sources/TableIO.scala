package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage seam for the input_hint clip table — the engine's stand-in for
  * the production Iceberg catalog (SURVEY §7.7: no Iceberg jar ships in the
  * sandbox, so the same layout/pruning contract is exercised on partitioned
  * Parquet; in production `spark.read.format("iceberg")` replaces
  * `spark.read.parquet` and the pruning predicates carry over unchanged).
  *
  * Layout: hash-bucketed by `part_bucket = pmod(xxhash64(clip_id), P)` —
  * the Parquet reading of Iceberg's `bucket(P, clip_id)` transform
  * (FIXTURES.md §1). Partition pruning is EXPLICIT: [[readBuckets]] pushes
  * a `part_bucket IN (...)` predicate that the scan resolves at planning
  * time (visible as `PartitionFilters` in `.explain(true)`), so a job that
  * processes one bucket slice of a 10^12-row table opens only that slice's
  * files.
  */
object TableIO {

  val PartitionCol = "part_bucket"

  /** Write a clip table hash-bucketed into `numBuckets` partitions. */
  def writeBucketed(df: DataFrame, path: String, numBuckets: Int): Unit =
    df.withColumn(PartitionCol, pmod(xxhash64(col("clip_id")), lit(numBuckets)))
      .write
      .partitionBy(PartitionCol)
      .mode("overwrite")
      .parquet(path)

  /** Read the whole table (partition column available for later pruning). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read ONLY the given buckets — the partition-pruned path. The predicate
    * is on the partition column, so Catalyst prunes at file-listing time
    * (no data files outside the buckets are opened). */
  def readBuckets(spark: SparkSession, path: String, buckets: Seq[Int]): DataFrame =
    spark.read.parquet(path)
      .filter(col(PartitionCol).isin(buckets.map(Int.box): _*))

  /** True iff executing the scan of `df` reads only files under the given
    * buckets — the runtime-observable effect of partition pruning
    * (`input_file_name()` reports the files actually opened). */
  def scansOnlyBuckets(df: DataFrame, buckets: Seq[Int]): Boolean = {
    val allowed = buckets.map(b => s"$PartitionCol=$b/").toSet
    val files = df.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    files.nonEmpty && files.forall(f => allowed.exists(f.contains))
  }
}
