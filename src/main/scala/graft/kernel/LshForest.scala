package graft.kernel

/** B4/Q3 — the reference's LSH-forest index family, re-expressed.
  *
  * The reference keeps a binary prefix trie per table (`HashNode{prefix,
  * length, leftChild, rightChild, children}`,
  * `/root/reference/hashIndex/LSHForestSupport.h:17-23`) built by recursive
  * first-differing-bit splits (`insertElement`,
  * `/root/reference/hashIndex/LSHForestHashIndex.h:29-158`), and answers a
  * query by descending to the leaf sharing the longest code prefix, then —
  * one qDepth step at a time — backing off to the next ancestor and
  * collecting its (result-capped) subtree
  * (`fillQuery`/`fillQuerySet`, `LSHForestHashIndex.h:260-337`; async
  * variant `LSHForestHashIndexAsync.h:261-322`).
  *
  * A trie over fixed-width codes is order-isomorphic to the SORTED code
  * array: the subtree of the ancestor at prefix-length `bits − s` is
  * exactly the contiguous range of codes that agree with the query on all
  * bits ≥ s. Descend+collect therefore becomes binary search over prefix
  * ranges here, and the distributed read path becomes a shortening-prefix
  * equi-join schedule on `code >> s` ([[graft.queries.ForestQueries]]).
  * This class is the single-node semantics oracle for that plan.
  *
  * Deviation from the reference, documented: bucket members are returned in
  * (code, id) order rather than insertion order — the UNCAPPED candidate SET
  * per (query, depth) is identical, and downstream exact re-ranking (Q7/Q8)
  * is order-insensitive. When a `maxResults` cap binds, however, `query`
  * keeps the lowest-(code, id) slice of the chosen level, whereas the
  * reference truncates its insertion-order accumulation — so the CAPPED
  * candidate set (not just its order) can differ from the reference's.
  */
final class LshForest private (
    sortedCodes: Array[Long],
    sortedIds: Array[Int],
    val bits: Int) {

  require(bits >= 1 && bits <= 62, "codes must be nonnegative (< 2^62)")

  def size: Int = sortedCodes.length

  /** [lo, hi) range of stored codes sharing the query's prefix above bit
    * `s` (the subtree at prefix-length bits−s). */
  def prefixRange(qCode: Long, s: Int): (Int, Int) = {
    val base = (qCode >>> s) << s
    val end = base + (1L << s) // exclusive; s ≤ bits ≤ 62 → no overflow
    (lowerBound(base), lowerBound(end))
  }

  private def lowerBound(target: Long): Int = {
    var lo = 0
    var hi = sortedCodes.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sortedCodes(mid) < target) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Q3 descend+collect: expand the prefix one level per step (s = 0 is the
    * exact-code leaf) until ≥ `minRetrieved` candidates or `maxDepth` is
    * reached; return at most `maxResults` ids of that level. The per-level
    * candidate sets are nested (supersets as s grows), so the union the
    * reference accumulates equals the deepest collected level. */
  def query(qCode: Long, maxDepth: Int, minRetrieved: Int, maxResults: Int): Array[Int] = {
    require(maxDepth <= bits)
    var s = 0
    var lo = 0
    var hi = 0
    var done = false
    while (!done) {
      val r = prefixRange(qCode, s)
      lo = r._1; hi = r._2
      if (hi - lo >= minRetrieved || s >= maxDepth) done = true else s += 1
    }
    val n = math.min(hi - lo, maxResults)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = sortedIds(lo + i); i += 1 }
    out
  }

  /** The level the query would collect at (for specs / instrumentation). */
  def chosenDepth(qCode: Long, maxDepth: Int, minRetrieved: Int): Int = {
    var s = 0
    while (s < maxDepth && {
      val (lo, hi) = prefixRange(qCode, s); hi - lo < minRetrieved
    }) s += 1
    s
  }
}

object LshForest {
  /** B4 build: the trie-insert loop collapses to one sort by (code, id) —
    * the same "shuffle is the index" reading as B1's bucket build. */
  def build(codes: Array[Long], bits: Int): LshForest = {
    // enforce the nonnegative-code precondition here, not just in the class
    // doc: lowerBound compares signed Longs while prefixRange shifts
    // unsigned, so a negative code would silently corrupt range queries
    require(codes.forall(_ >= 0), "codes must be nonnegative (< 2^62)")
    val idx = codes.indices.toArray.map(i => (codes(i), i)).sortBy(identity)
    new LshForest(idx.map(_._1), idx.map(_._2), bits)
  }
}
