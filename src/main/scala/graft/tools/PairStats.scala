package graft.tools

import graft.conf.GraftConf
import graft.pipeline.{CandidatePairs, Signatures, SuffixDups}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: band-bucket size distribution + candidate-pair counts at a
  * given clip count — finds superlinear pair blowup.
  * Usage: runMain graft.tools.PairStats [nClips] [cores] */
object PairStats {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val cores = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val conf = GraftConf()
    val clips = graft.synth.ClipTableGen.table(spark, n)
    val sig = Signatures.compute(spark, clips, conf).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sig
      .select($"clip_id", explode(arrays_zip($"band_keys", $"band_srcs")).as("z"))
      .select($"z.band_keys".as("band_key"), $"z.band_srcs".as("src"), $"clip_id")
    val sizes = bands.groupBy($"band_key").count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = sizes.select(
      count(lit(1)).as("buckets"),
      sum($"count").as("rows"),
      max($"count").as("max_sz"),
      sum(when($"count" > 1 && $"count" <= 16, $"count" * ($"count" - 1) / 2)).as("pairs_2_16"),
      sum(when($"count" > 16 && $"count" <= 128, $"count" * ($"count" - 1) / 2)).as("pairs_17_128"),
      sum(when($"count" > 128 && $"count" <= conf.bucketCap, $"count" * ($"count" - 1) / 2)).as("pairs_129_cap"),
      sum(when($"count" > conf.bucketCap, $"count" * conf.chainWidth)).as("chain_rows_over_cap"),
      count(when($"count" > 128 && $"count" <= conf.bucketCap, 1)).as("n_buckets_129_cap"),
      count(when($"count" > conf.bucketCap, 1)).as("n_buckets_over_cap")
    ).head()
    println(s"[pairstats] n=$n $hist")
    val top = sizes.orderBy(desc("count")).limit(12).collect()
      .map(r => r.getLong(1)).mkString(",")
    println(s"[pairstats] top bucket sizes: $top")
    val cand = CandidatePairs.fromBands(spark, bands, conf)
    println(s"[pairstats] band pair rows (pre-dedup): ${cand.count()}")
    val suf = SuffixDups.candidates(spark, clips, conf)
    println(s"[pairstats] suffix pair rows (pre-dedup): ${suf.count()}")
    spark.stop()
  }
}
