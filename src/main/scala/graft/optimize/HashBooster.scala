package graft.optimize

import graft.conf.GraftConf
import graft.kernel.MinHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Boosted hash-table selection — reference operators O4 (HashBooster,
  * `/root/reference/hashBitOptimizers/Boost.h:50-196`) and O3 fitness
  * scoring (`HashError.h:85-114`: fitness = recall · precision²), grafted
  * onto dedup banding:
  *
  * A "candidate table" is a band-seed variant: one MinHash banding of the
  * (already computed, cached) shingle sets under a candidate seed. Each
  * candidate is scored with one Spark job — its band-collision pairs join
  * the weighted golden dup-pair set (TP weight covered, FP count) — and a
  * driver-side greedy loop picks the best table, zeroes the weights of its
  * covered pairs, decays the false-positive penalty, renormalizes, and
  * repeats (the AdaBoost structure of `Boost.h:138-191`, with the
  * candidate-granularity parallelism of its OpenMP loops replaced by
  * cluster-parallel scoring jobs).
  *
  * The expensive per-row work (decode, shingling) happens ONCE upstream in
  * the signature stage; per-candidate work is a cheap primitive-array map
  * over the cached shingle column — the same cost split as the reference,
  * which precomputes candidate hashes over the transformed data once
  * (`Boost.h:116-135`).
  */
object HashBooster {

  final case class Chosen(seed: Long, fitness: Double, newTpWeight: Double)
  final case class Result(tables: Seq[Chosen]) {
    def seeds: Seq[Long] = tables.map(_.seed)
  }

  /** Band-collision pairs of `shingleSets` under one candidate band seed.
    * shingleSets: (clip_id, sh: Array[Long]); output (a, b) distinct. */
  def collisionPairs(spark: SparkSession, shingleSets: DataFrame,
      candidateSeed: Long, conf: GraftConf): DataFrame = {
    import spark.implicits._
    val c = conf
    val bandRows = shingleSets
      .select($"clip_id", $"sh")
      .as[(String, Array[Long])]
      .mapPartitions { it =>
        val mh = new MinHash(c.textNumPerm, candidateSeed)
        it.flatMap { case (id, sh) =>
          if (sh == null || sh.isEmpty) Iterator.empty
          else MinHash.bandKeys(mh.signature(sh), c.textBands, c.textRows, candidateSeed)
            .iterator.map(k => (k, id))
        }
      }
      .toDF("band_key", "clip_id")
    graft.pipeline.CandidatePairs
      .fromBands(spark, bandRows.withColumn("src", lit(1)), conf)
      .select($"a", $"b").distinct()
  }

  /** O3: fitness = recall · precision² under the current pair weights.
    * Returns (fitness, coveredTpWeight, coveredPairs). */
  private def score(cand: DataFrame, weighted: DataFrame,
      totalWeight: Double): (Double, Double, DataFrame) = {
    val joined = cand.join(weighted, Seq("a", "b"), "left")
    val agg = joined.agg(
      coalesce(sum("w"), lit(0.0)).as("tpw"),
      count(lit(1)).as("n"),
      coalesce(sum(when(col("w").isNotNull, 1).otherwise(0)), lit(0)).as("tp"))
      .head()
    val tpw = agg.getDouble(0)
    val n = agg.getLong(1).toDouble
    val tp = agg.getLong(2).toDouble
    val recall = if (totalWeight <= 0) 0.0 else tpw / totalWeight
    val precision = if (n == 0) 0.0 else tp / n
    (recall * precision * precision, tpw, joined.filter(col("w").isNotNull).select("a", "b"))
  }

  /** Greedy boosted selection of `numTables` band seeds from `pool`.
    * golden: (a, b) true dup pairs (a < b). */
  def select(spark: SparkSession, shingleSets: DataFrame, golden: DataFrame,
      pool: Seq[Long], numTables: Int, conf: GraftConf): Result = {
    import spark.implicits._
    require(pool.nonEmpty && numTables > 0)

    // precompute each candidate's collision pairs once (reference idiom:
    // candidates hashed over all data once, Boost.h:116-135)
    val candPairs: Map[Long, DataFrame] = pool.map { s =>
      s -> collisionPairs(spark, shingleSets, s, conf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }.toMap
    candPairs.values.foreach(_.count())

    // driver-side weight table over the golden pairs (the reference's
    // boostWeights matrix; golden sets are sampled/small by construction)
    val goldenPairs = golden.select($"a", $"b").distinct()
      .as[(String, String)].collect()
    val weights = mutable.LinkedHashMap(goldenPairs.map(p => p -> 1.0): _*)
    normalize(weights)

    val chosen = mutable.ArrayBuffer.empty[Chosen]
    val remaining = mutable.Set(pool: _*)
    var t = 0
    while (t < numTables && remaining.nonEmpty) {
      val weighted = weights.toSeq.map { case ((a, b), w) => (a, b, w) }
        .toDF("a", "b", "w")
      val totalW = weights.values.sum
      val scored = remaining.toSeq.sorted.map { s =>
        val (fit, tpw, covered) = score(candPairs(s), weighted, totalW)
        (s, fit, tpw, covered)
      }
      val best = scored.maxBy { case (s, fit, _, _) => (fit, -s) } // deterministic tie-break
      chosen += Chosen(best._1, best._2, best._3)
      remaining -= best._1
      // zero covered-TP weights (Boost.h:176-183), renormalize
      best._4.as[(String, String)].collect().foreach { p =>
        if (weights.contains(p)) weights(p) = 0.0
      }
      if (weights.values.sum <= 1e-12) t = numTables // full coverage: stop early (Boost.h:166)
      else normalize(weights)
      t += 1
    }
    candPairs.values.foreach(_.unpersist(false))
    Result(chosen.toSeq)
  }

  private def normalize(w: mutable.LinkedHashMap[(String, String), Double]): Unit = {
    val s = w.values.sum
    if (s > 0) w.keys.foreach(k => w(k) = w(k) / s)
  }
}
