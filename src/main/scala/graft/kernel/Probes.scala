package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Multiprobe mask enumeration (reference operators P1/P2).
  *
  * P1 `queryDist` recursively enumerates all bit masks of Hamming weight
  * exactly `dist` over `bits` positions
  * (`/root/reference/hashIndex/HashIndexSupport.h:16-33`); P2
  * `getBallDistances` concatenates weights 0..maxDist into one
  * expanding-distance probe list (`HashIndexSupport.h:35-50`) that is XOR'd
  * with a bucket key to produce an expanding-order search.
  *
  * Probe lists are tiny (C(bits, ≤d)) and driver-computed, then broadcast;
  * probe expansion in the engine is a Spark `explode` over this array.
  */
object Probes {

  /** All masks of Hamming weight exactly `dist` over `bits` positions,
    * in the reference's recursion order (low bit chosen first). */
  def masksOfWeight(bits: Int, dist: Int): Array[Long] = {
    require(bits >= 0 && bits <= 62 && dist >= 0)
    val out = new ArrayBuffer[Long]()
    def rec(start: Int, left: Int, acc: Long): Unit = {
      if (left == 0) { out += acc; () }
      else {
        var i = start
        while (i <= bits - left) {
          rec(i + 1, left - 1, acc | (1L << i))
          i += 1
        }
      }
    }
    if (dist <= bits) rec(0, dist, 0L)
    out.toArray
  }

  /** Expanding Hamming-ball: weight-0 mask (identity probe) first, then
    * weight 1, …, weight maxDist — the `getBallDistances` order. */
  def ballMasks(bits: Int, maxDist: Int): Array[Long] =
    (0 to maxDist).iterator.flatMap(d => masksOfWeight(bits, d)).toArray

  /** n choose k, for test assertions on probe counts. */
  def choose(n: Int, k: Int): Long = {
    if (k < 0 || k > n) 0L
    else {
      var r = 1L
      var i = 0
      while (i < math.min(k, n - k)) { r = r * (n - i) / (i + 1); i += 1 }
      r
    }
  }
}
