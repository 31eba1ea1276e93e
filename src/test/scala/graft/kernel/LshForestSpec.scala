package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Semantics oracle for the LSH-forest index (B4/Q3): the sorted-array
  * prefix-range implementation must agree with brute-force prefix
  * filtering at every backoff level, honor the early exit and the result
  * cap, and return nested candidate sets across levels. */
class LshForestSpec extends AnyFunSuite {
  val Bits = 16
  val N = 2000

  val codes: Array[Long] =
    Array.tabulate(N)(i => Hashing.derive(0xf07e57L, i) & ((1L << Bits) - 1))
  val forest = LshForest.build(codes, Bits)

  val queryCodes: Array[Long] =
    Array.tabulate(50)(i => Hashing.derive(0x9e57L, i) & ((1L << Bits) - 1))

  private def brute(q: Long, s: Int): Set[Int] =
    codes.indices.filter(i => (codes(i) >>> s) == (q >>> s)).toSet

  test("query equals brute-force prefix filtering at the chosen backoff level") {
    for (q <- queryCodes; minRet <- Seq(1, 5, 50)) {
      val depth = forest.chosenDepth(q, Bits, minRet)
      val expect = brute(q, depth)
      // chosen level is the first satisfying one (or the max backoff)
      assert(depth == (0 to Bits).find(s => brute(q, s).size >= minRet).getOrElse(Bits)
        || brute(q, depth).size >= minRet)
      val got = forest.query(q, Bits, minRet, Int.MaxValue).toSet
      assert(got == expect, s"q=$q minRet=$minRet depth=$depth")
    }
  }

  test("candidate sets are nested across shortening-prefix levels") {
    for (q <- queryCodes.take(10)) {
      var prev = Set.empty[Int]
      for (s <- 0 to Bits) {
        val cur = brute(q, s)
        assert(prev.subsetOf(cur), s"level $s not a superset of level ${s - 1}")
        val (lo, hi) = forest.prefixRange(q, s)
        assert(hi - lo == cur.size)
        prev = cur
      }
      assert(prev == codes.indices.toSet) // full backoff = whole index
    }
  }

  test("result cap and early exit are honored") {
    val q = queryCodes(0)
    val capped = forest.query(q, Bits, 100, 7)
    assert(capped.length == 7)
    // early exit: with minRetrieved=1 and a populated shallow level, the
    // chosen depth is no deeper than needed
    val d1 = forest.chosenDepth(q, Bits, 1)
    assert(brute(q, d1).nonEmpty && (d1 == 0 || brute(q, d1 - 1).isEmpty))
  }

  test("Q4 depth-major round-robin union is set-equivalent to the DISTINCT union") {
    // The reference's multi-table forest query accumulates candidates
    // depth-major: for qDepth j = 0..maxDepth, for table i = 0..L-1,
    // collect table i's backoff-level-j subtree into one shared set,
    // stopping mid-schedule once querySize is reached
    // (/root/reference/hashIndex/HashCollection.h:212-230, depth-major
    // interleave at :218-222). The distributed plan replaces that loop
    // with a DISTINCT union of per-(table, level) equi-joins
    // (ForestQueries doc). This spec pins the equivalence argument at the
    // kernel level:
    //  (a) UNBUDGETED, the round-robin accumulation over the full schedule
    //      equals the DISTINCT union of every table's deepest level —
    //      per-table levels are nested, so interleave order cannot change
    //      the union (set union is commutative/associative/idempotent);
    //  (b) BUDGETED, the reference's mid-schedule stop yields a SUBSET of
    //      that same uncapped union with at least min(budget, |union|)
    //      members — the deviation our deterministic rank cap replaces is
    //      a truncation choice within one fixed superset, never a
    //      different candidate universe.
    val L = 4
    val maxDepth = 8
    val tables = (0 until L).map { t =>
      LshForest.build(Array.tabulate(N)(i =>
        Hashing.derive(0xfab1e5L + t, i) & ((1L << Bits) - 1)), Bits)
    }
    // members of table t's subtree at backoff level s (query with
    // maxDepth = s and an unsatisfiable minRetrieved collects level s)
    def levelSet(t: Int, q: Long, s: Int): Set[Int] =
      tables(t).query(q, s, Int.MaxValue, Int.MaxValue).toSet
    def roundRobin(qs: Array[Long], budget: Int): Set[Int] = {
      val acc = scala.collection.mutable.Set.empty[Int]
      var j = 0
      var stop = false
      while (j <= maxDepth && !stop) {
        var t = 0
        while (t < L && !stop) {
          acc ++= levelSet(t, qs(t), j)
          if (acc.size >= budget) stop = true
          t += 1
        }
        j += 1
      }
      acc.toSet
    }
    for (qi <- 0 until 10) {
      // per-table query codes (each table hashes the query independently)
      val qs = Array.tabulate(L)(t => Hashing.derive(0x9e57L + t, qi) & ((1L << Bits) - 1))
      val distinctUnion = (0 until L).flatMap(t => levelSet(t, qs(t), maxDepth)).toSet
      // (a) set-equivalence over the complete schedule
      assert(roundRobin(qs, Int.MaxValue) === distinctUnion)
      // (b) budgeted stop = truncation within the same superset
      val budget = math.max(1, distinctUnion.size / 3)
      val refSet = roundRobin(qs, budget)
      assert(refSet.subsetOf(distinctUnion))
      assert(refSet.size >= math.min(budget, distinctUnion.size))
    }
  }

  test("build is insertion-order independent (trie ≅ sorted codes)") {
    val shuffled = codes.reverse
    val f2 = LshForest.build(shuffled, Bits)
    for (q <- queryCodes.take(10)) {
      val a = forest.query(q, Bits, 10, Int.MaxValue).map(codes).sorted.toSeq
      val b = f2.query(q, Bits, 10, Int.MaxValue).map(shuffled).sorted.toSeq
      assert(a == b)
    }
  }
}
