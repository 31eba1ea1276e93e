package graft.streaming

import graft.SparkTestBase
import graft.conf.GraftConf
import graft.pipeline.Signatures
import graft.synth.ClipTableGen
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("file-source ingest computes batch-identical signatures incrementally and resumes exactly-once") {
    import spark.implicits._
    val conf = GraftConf()
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"

    // chunk 1 arrives
    val chunk1 = ClipTableGen.table(spark, 80)
    chunk1.coalesce(1).write.mode("append").parquet(in)
    StreamingIngest.start(spark, in, out, ckpt, conf, Trigger.AvailableNow())
      .awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 === chunk1.count())

    // chunk 2 arrives later; restart processes ONLY the new files
    val chunk2 = ClipTableGen.table(spark, 400, seed = 99L)
      .filter(!$"clip_id".isin(chunk1.select("clip_id").as[String].collect().toSeq: _*))
    chunk2.coalesce(1).write.mode("append").parquet(in)
    StreamingIngest.start(spark, in, out, ckpt, conf, Trigger.AvailableNow())
      .awaitTermination()

    val streamed = spark.read.parquet(out)
    assert(streamed.count() === spark.read.parquet(in).count())
    assert(streamed.select("clip_id").distinct().count() === streamed.count(),
      "exactly-once append: no clip processed twice")

    // streamed signatures are bit-identical to the batch kernel's
    val batch = Signatures.compute(spark, spark.read.parquet(in), conf).toDF()
    val s = streamed.select($"clip_id", $"simhash", $"band_keys").orderBy($"clip_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    val b = batch.select($"clip_id", $"simhash", $"band_keys").orderBy($"clip_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    assert(s.toSeq === b.toSeq)
  }
}
