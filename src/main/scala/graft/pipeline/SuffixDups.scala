package graft.pipeline

import graft.conf.GraftConf
import graft.kernel.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-substring duplicate pass: finds pairs (a, b) where a's full token
  * sequence appears verbatim inside b's — duplicates MinHash misses because
  * containment Jaccard = |a| / |b| can sit far below any near-dup threshold.
  *
  * Seed-and-extend design (the scalable reading of SURVEY §7.5): every
  * document emits a hash for each of its W-token windows (O(total tokens)
  * rows — the suffix-array analogue of indexing every suffix, truncated to
  * W-token prefixes); every document at least W tokens long emits the hash
  * of its FIRST W-token window as its probe seed. Seeds equi-join windows →
  * candidates, then exact containment verification (operator-Q7 style) on
  * the joined texts. Window rows are distinct per (hash, doc) so a repeated
  * phrase costs one row; the hot-phrase skew hazard is bounded by the
  * candidate-pair path's verification (join fanout is bucket-sized, and
  * verified edges are deduplicated).
  *
  * Documents shorter than W tokens are out of scope of this pass (exact
  * equality and MinHash cover them); documented limitation.
  */
object SuffixDups {

  /** clips (clip_id, transcript) → candidate substring edges
    * (a, b, sources=["substring-seed"], capped=false), a's text potentially
    * inside b's, a != b. Verification happens in VerifyPairs. */
  def candidates(spark: SparkSession, clips: DataFrame, conf: GraftConf): DataFrame = {
    import spark.implicits._
    val w = conf.substringWindow
    val seed = conf.seed

    val docs = clips.select($"clip_id", $"transcript").as[(String, String)]

    // (windowHash, clip_id) for every W-token window, distinct
    val windows = docs.flatMap { case (id, text) =>
      val toks = graft.kernel.Shingles.tokens(Option(text).getOrElse(""))
      if (toks.length < w) Iterator.empty
      else {
        val set = new java.util.HashSet[java.lang.Long]()
        val out = Vector.newBuilder[(Long, String)]
        var i = 0
        while (i + w <= toks.length) {
          var h = seed ^ 0x50ff1eL
          var j = 0
          while (j < w) { h = Hashing.combine(h, Hashing.hashString(toks(i + j), seed)); j += 1 }
          if (set.add(h)) out += ((h, id))
          i += 1
        }
        out.result().iterator
      }
    }.toDF("wh", "b")

    // probe seed: first W-token window of each sufficiently long doc
    val seeds = docs.flatMap { case (id, text) =>
      val toks = graft.kernel.Shingles.tokens(Option(text).getOrElse(""))
      if (toks.length < w) Iterator.empty
      else {
        var h = seed ^ 0x50ff1eL
        var j = 0
        while (j < w) { h = Hashing.combine(h, Hashing.hashString(toks(j), seed)); j += 1 }
        Iterator.single((h, id))
      }
    }.toDF("wh", "a")

    // Hot-phrase skew: a window hash shared by s documents would fan out
    // O(s·seeds) join rows. Same policy as CandidatePairs: small groups emit
    // seed×member pairs exactly; oversized groups fall back to chain pairs
    // over id-sorted members (connectivity preserved for true-dup groups,
    // blowup bounded, flagged `capped`).
    val cap = conf.bucketCap
    val width = conf.chainWidth
    val tagged = windows.select($"wh", $"b".as("id"), lit(false).as("is_seed"))
      .union(seeds.select($"wh", $"a".as("id"), lit(true).as("is_seed")))
    val pairs = tagged
      .groupBy($"wh", $"id").agg(max($"is_seed").as("is_seed"))
      .as[(Long, String, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (_: Long, rows: Iterator[(Long, String, Boolean)]) =>
        val members = rows.map(r => (r._2, r._3)).toArray.distinct.sortBy(_._1)
        if (members.length < 2) Iterator.empty
        else if (members.length <= cap) {
          for {
            (a, isSeed) <- members.iterator if isSeed
            (b, _) <- members.iterator if a != b
          } yield (if (a < b) (a, b, false) else (b, a, false))
        } else {
          for {
            i <- members.indices.iterator
            d <- (1 to width).iterator
            if i + d < members.length
          } yield (members(i)._1, members(i + d)._1, true)
        }
      }

    pairs.toDF("a", "b", "capped")
      .groupBy($"a", $"b").agg(max($"capped").as("capped"))
      .withColumn("sources", array(lit("substring-seed")))
      .select($"a", $"b", $"sources", $"capped")
  }
}
