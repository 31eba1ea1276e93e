package graft.streaming

import graft.conf.GraftConf
import graft.pipeline.Signatures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingest: the streaming reading of the reference's
  * chunked two-pass build (operator B2,
  * `/root/reference/hashIndex/HashCollection.h:66-107` — the reference
  * itself is batch-only; its "streaming version" is an unimplemented TODO,
  * `/root/reference/hashIndex/ResizeableHashIndex.h:185`).
  *
  * Design: the signature kernel is STATELESS per row, so each micro-batch
  * ("chunk") runs the identical batched `mapPartitions` kernel and appends
  * to the signature store; bucket state lives in the store's band-key
  * layout, not in stream state — the dedup pipeline (banding → pairs →
  * verify → components) runs batch over the accumulated store, mirroring
  * the reference's build/query split. Exactly-once append comes from the
  * sink checkpoint; a killed ingest resumes from its offsets, composing
  * with the batch pipeline's own stage manifests.
  */
object StreamingIngest {

  /** The input_hint schema (BASELINE.json). */
  val clipSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType),
    StructField("bytes", BinaryType),
    StructField("sr_hz", IntegerType),
    StructField("dur_ms", IntegerType),
    StructField("codec", StringType),
    StructField("transcript", StringType)))

  /** Streaming clips → streaming signatures (same kernel as batch; the
    * transformation is stateless, so it is legal on a streaming Dataset). */
  def signatures(spark: SparkSession, clips: DataFrame, conf: GraftConf): DataFrame =
    Signatures.compute(spark, clips, conf).toDF()

  /** File-source ingest: watch `inputDir` for new clip parquet, append
    * signatures to `outDir` with exactly-once checkpointing. */
  def start(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, conf: GraftConf,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val clips = spark.readStream
      .schema(clipSchema)
      .parquet(inputDir)
    signatures(spark, clips, conf)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
