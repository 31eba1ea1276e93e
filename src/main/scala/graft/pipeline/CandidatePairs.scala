package graft.pipeline

import graft.conf.GraftConf
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType}

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

/** Band shuffle → candidate pairs (reference operators B1/B2 + Q4).
  *
  * The reference materializes per-table hash buckets (CSR scatter,
  * `/root/reference/hashIndex/StdHashIndex.h:31-74`) and probes them per
  * query; for all-pairs dedup the bucket directory is never materialized —
  * the `groupByKey(band_key)` shuffle IS the hash table, and each group
  * emits its member pairs directly (SURVEY §2.4/§7.4). Band keys are
  * family-salted upstream, so the group key is a single primitive Long;
  * family provenance travels as the `src` bit ([[Signatures.SrcText]] etc.)
  * and pairs aggregate it with `bit_or`.
  *
  * Ids are generic over the member-id type: the pipeline shuffles Long
  * SURROGATE ids (xxhash64 of the clip_id — see [[DedupPipeline]]'s diet
  * note) while standalone callers (HashBooster, PairStats, specs) keep
  * native String ids; the pair semantics (sorted-distinct members, chain
  * order) follow the id type's ordering either way.
  *
  * Skew (the 10^12-scale hazard the single-node reference never faced): a
  * bucket of size s emits O(s²) pairs; a hot key (e.g. empty-transcript
  * signature) would explode. Buckets over `bucketCap` fall back to
  * chain-pairing over id-sorted members (each member paired with its next
  * `chainWidth` neighbors): O(s) pairs that keep the bucket connected, which
  * preserves CLUSTER correctness for true duplicate groups (dup relations
  * within a bucket of true dups are transitive through verification) while
  * bounding blowup. Capped buckets are flagged (`capped`), never silently
  * dropped, and surface in stage lineage.
  *
  * Memory bound: a single task must not buffer a pathological bucket's ids
  * without limit, so at most `bucketHardStop` members are buffered (sorted,
  * deterministic chain); members beyond that are chain-paired in a
  * STREAMING pass — each overflow member pairs with the previous
  * `chainWidth` members in arrival order, bridged to the tail of the sorted
  * chain, O(chainWidth) memory. Nothing is dropped and the bucket stays
  * connected; the trade, documented: overflow pairs depend on shuffle
  * arrival order, so output for groups above `bucketHardStop` (4M default —
  * never reached by real band buckets, which `bucketCap` already chains) is
  * connected-but-nondeterministic rather than silently truncated.
  */
object CandidatePairs {

  /** bands: (band_key: Long, src: Int, clip_id: String | Long) →
    * RAW pair stream (a, b, sources: Int bitmask, capped) with a < b; NOT
    * deduplicated across buckets — the caller's final groupBy(a, b)
    * (DedupPipeline's candidates stage) is the single dedup shuffle for all
    * candidate streams. The id column's type picks the specialization.
    *
    * Provenance caveat (documented approximation — ACCEPTED EDGES are
    * unaffected, verification is exact): `sources` is the OR of every
    * member row's family bit in the bucket, applied to all its pairs, and
    * family-salted Long keys can collide across families (birthday-likely
    * at 10^12 rows) — so a pair's `sources` bitmask may include a family
    * that never banded that specific pair. Treat it as diagnostic lineage,
    * not exact attribution. */
  def fromBands(spark: SparkSession, bands: DataFrame, conf: GraftConf): DataFrame = {
    import spark.implicits._
    bands.schema("clip_id").dataType match {
      case StringType =>
        fromBandsTyped[String](bands.select($"band_key", $"src", $"clip_id")
          .as[(Long, Int, String)], conf)
      case LongType =>
        fromBandsTyped[Long](bands.select($"band_key", $"src", $"clip_id")
          .as[(Long, Int, Long)], conf)
      case other => throw new IllegalArgumentException(s"clip_id type: $other")
    }
  }

  private def fromBandsTyped[T: Ordering: ClassTag](
      bands: Dataset[(Long, Int, T)], conf: GraftConf)(
      implicit keyEnc: org.apache.spark.sql.Encoder[Long],
      pairEnc: org.apache.spark.sql.Encoder[(T, T, Int, Boolean)]): DataFrame = {
    val ord = implicitly[Ordering[T]]
    import ord.mkOrderingOps
    val cap = conf.bucketCap
    val width = conf.chainWidth
    val hardStop = conf.bucketHardStop
    bands
      .groupByKey(_._1)
      .flatMapGroups { (_: Long, rows: Iterator[(Long, Int, T)]) =>
        val ids = new ArrayBuffer[T]()
        var src = 0
        while (rows.hasNext && ids.length < hardStop) {
          val r = rows.next()
          ids += r._3
          src |= r._2
        }
        if (ids.length < 2) Iterator.empty // hardStop ≥ 2 ⇒ group exhausted
        else {
          val sorted = ids.distinct.sorted
          val head: Iterator[(T, T, Int, Boolean)] =
            if (sorted.length < 2) Iterator.empty
            else if (sorted.length <= cap) {
              for {
                i <- sorted.indices.iterator
                j <- (i + 1) until sorted.length
              } yield (sorted(i), sorted(j), src, false)
            } else {
              for {
                i <- sorted.indices.iterator
                d <- (1 to width).iterator
                if i + d < sorted.length
              } yield (sorted(i), sorted(i + d), src, true)
            }
          val tail: Iterator[(T, T, Int, Boolean)] =
            if (!rows.hasNext) Iterator.empty
            else {
              // streaming overflow chain (see class doc): ring buffer of the
              // last `width` members, seeded from the sorted chain's tail so
              // overflow members stay connected to the buffered component.
              // Overflow pairs carry the FROZEN buffered-prefix src — not a
              // running accumulation, which would make a pair's `sources`
              // depend on where in the arrival order it was emitted and
              // diverge from the head pairs' view of the same bucket. The
              // per-pair mask stays diagnostic either way (class doc);
              // freezing just removes one gratuitous nondeterminism axis.
              val overflowSrc = src
              val window = new Array[T](width)
              var filled = 0
              var pos = 0
              def push(x: T): Unit = {
                window(pos) = x
                pos = (pos + 1) % width
                if (filled < width) filled += 1
              }
              sorted.takeRight(width).foreach(push)
              rows.flatMap { r =>
                val x = r._3
                val out = new ArrayBuffer[(T, T, Int, Boolean)](filled)
                var k = 0
                while (k < filled) {
                  val w = window(k)
                  if (w != x)
                    out += (if (x < w) (x, w, overflowSrc, true) else (w, x, overflowSrc, true))
                  k += 1
                }
                push(x)
                out.iterator
              }
            }
          head ++ tail
        }
      }
      .toDF("a", "b", "sources", "capped")
  }
}
