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
