package graft.tools

import graft.conf.GraftConf
import graft.pipeline._
import graft.synth.ClipTableGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-stage wall-clock breakdown of the dedup pipeline at one parallelism
  * level — diagnosis harness for scaling work. Usage:
  * runMain graft.tools.StageBench [cores] [nClips] */
object StageBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val n = if (args.length > 1) args(1).toInt else 8000
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-stagebench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_STAGE_PARTITIONS", (2 * cores).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // GRAFT_SURROGATE_IDS=1: measure the Long-surrogate shuffle diet
    val conf = GraftConf(
      surrogateIds = sys.env.get("GRAFT_SURROGATE_IDS").contains("1"))

    def cpuNanos: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    // process CPU per stage beside wall: the stage whose CPU grows fastest
    // with the core count is the one paying shared-resource (memory
    // bandwidth / kernel I/O) contention, not real work
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val c0 = cpuNanos
      val r = body
      println(f"[stage] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  cpu=${(cpuNanos - c0) / 1e9}%8.2f s")
      r
    }

    // 0. materialize input to parquet (the real pipeline reads a table, it
    // doesn't re-synthesize per scan). PID-stamped + stale-swept like the
    // bench scratch: a killed run leaves ~10 GB that otherwise fills /tmp.
    Scratch.sweepDefaultRoots()
    val dirFile = java.nio.file.Files.createTempDirectory("graft-stagebench").toFile
    Scratch.claim(dirFile)
    val dir = dirFile.toString
    time("synth+write") {
      ClipTableGen.table(spark, n).write.mode("overwrite").parquet(s"$dir/clips")
    }
    val clips = spark.read.parquet(s"$dir/clips")

    val signatures = time("signatures") {
      val s = Signatures.compute(spark, clips, conf).toDF()
        .persist(StorageLevel.MEMORY_AND_DISK)
      s.count()
      s
    }

    // mirror DedupPipeline's shuffle diet when GRAFT_SURROGATE_IDS=1
    val idCol = if (conf.surrogateIds) xxhash64($"clip_id") else $"clip_id"

    val bands = time("bands") {
      val b = signatures
        .select(idCol.as("clip_id"), explode(arrays_zip($"band_keys", $"band_srcs")).as("z"))
        .select($"z.band_keys".as("band_key"), $"z.band_srcs".as("src"), $"clip_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }

    val candBands = time("cand_bands") {
      val c = CandidatePairs.fromBands(spark, bands, conf).persist(StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }

    val candSuffix = time("cand_suffix") {
      // the pipeline's form: signature-cached token hashes, diet-keyed
      val c = SuffixDups.candidatesFromTokenHashes(spark,
        signatures.select(idCol.as("clip_id"), $"toks_h"), conf)
        .persist(StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }

    val candidates = time("cand_union") {
      val c = candBands.union(candSuffix)
        .groupBy($"a", $"b")
        .agg(expr("bit_or(sources)").as("sources"), max($"capped").as("capped"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }

    val verified = time("verified") {
      val v = VerifyPairs.verify(spark, candidates, signatures, conf)
        .edges.persist(StorageLevel.MEMORY_AND_DISK)
      v.count()
      v
    }

    time("clusters") {
      val vertices = clips.select($"clip_id")
      val edges = verified.filter($"accepted").select($"a", $"b")
      Components.connectedComponents(spark, vertices, edges, conf.maxCcIterations).count()
    }

    spark.stop()
    deleteRec(new java.io.File(dir)) // ~10 GB of synthetic clips per run
  }

  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
    ()
  }
}
