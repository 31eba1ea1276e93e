package graft.optimize

import org.scalatest.funsuite.AnyFunSuite

/** Unit oracles for the ARDHF deltas over RDHF (positive-only S, piNeg
  * aggregate, wneg evolution, the 0.5·α and 0.49-bias wMatrix variant). */
class ArdhfSpec extends AnyFunSuite {

  test("buildS keeps only positive neighbour entries with wneg = 1") {
    val s = Ardhf.buildS(Array(Array(1, 2), Array(0)))
    assert(s.values.forall(_ == 1.0))
    assert(s.values.length == 3)
    assert(s.wneg == 1.0)
    assert(s.qi.toSeq == Seq(0, 0, 1) && s.dj.toSeq == Seq(1, 2, 0))
  }

  test("piVector subtracts the wneg-scaled piNeg aggregate (hand case)") {
    val y = Array(Array(1.0, 1.0, -1.0, -1.0))
    val s = Ardhf.SparseS(Array(0), Array(1), Array(1.0), wneg = 2.0)
    // YSYᵀ = 1·(1·1) = 1; piNeg = 3 → exponent −γ·(1 − 3·2)/(1·500)
    val pi = Ardhf.piVector(y, s, gamma = 0.2, piNeg = Array(3.0))
    assert(math.abs(pi(0) - math.exp(-0.2 * (1.0 - 6.0) / 500.0)) < 1e-12)
  }

  test("pTriple first call = reference placeholders; populated call pins negatives") {
    val s = Ardhf.SparseS(Array(0, 0), Array(1, 2), Array(1.0, 1.0), wneg = 1.0)
    val dist = new Array[Double](2)
    val (p0, nd0, nc0) = Ardhf.pTriple(None, s, dist)
    assert(dist.forall(_ == 64.0) && p0.forall(_ == 1e-32) && nd0 == 1e-32 && nc0 == 0.0)
    // populated: pair 0 agrees (0), pair 1 disagrees (0.5) under a 1-bit table
    val lastY = Array(Array(1.0, 1.0, -1.0))
    val (p1, nd1, nc1) = Ardhf.pTriple(Some(lastY), s, dist)
    assert(dist(0) == 0.0 && dist(1) == 0.5)
    // u = 0.25; zero-pinned negdistances ⇒ negdist = −u, negcount = 0
    assert(math.abs(p1(0) + 0.25) < 1e-12 && math.abs(p1(1) - 0.25) < 1e-12)
    assert(nd1 == -0.25 && nc1 == 0.0)
  }

  test("wUpdate: 0.5·α factor, 0.49-bias term, wneg evolution") {
    val s = Ardhf.SparseS(Array(0, 0), Array(1, 2), Array(1.0, 1.0), wneg = 1.0)
    val p = (Array(-0.25, 0.25), -0.25, 0.0)
    val w = Ardhf.wUpdate(s, p)
    // α = 0.5·(1 neg)/(1 pos + 1e-6); bias = 0
    val alpha = 0.5 * 1.0 / (1.0 + 0.000001)
    assert(math.abs(w.values(0) - math.exp(alpha * 0.25)) < 1e-12)
    assert(math.abs(w.values(1) - math.exp(-alpha * 0.25)) < 1e-12)
    // wneg' = exp(−α·negdist)·w·0 + exp(α·negdist)·w·1 = exp(−α·0.25)
    assert(math.abs(w.wneg - math.exp(alpha * -0.25)) < 1e-12)
    // nonzero negcount engages the bias and both wneg terms
    val w2 = Ardhf.wUpdate(s, (Array(-0.25, 0.25), -0.25, 0.2))
    assert(w2.values(0) > w.values(0), "positive bias must lift entry weights")
    assert(w2.wneg != w.wneg)
  }

  test("optimize: deterministic, disjoint pool rows across tables, wneg path exercised") {
    val n = 120
    val dim = 16
    val data = Array.tabulate(n) { i =>
      Array.tabulate(dim) { d =>
        val base = if (i % 2 == 0) 1.0f else -1.0f
        if (d == 0) base
        else (graft.kernel.Hashing.derive(7L, i.toLong * dim + d) % 1000L) / 1000.0f
      }
    }
    val neighbours = Array.tabulate(20)(i => Array((i + 2) % n, (i + 4) % n))
    val cfg = Ardhf.Config(bitPoolSize = 24, numFuncs = 2, numBits = 6, seed = 42L)
    val r1 = Ardhf.optimize(data, neighbours, cfg)
    val r2 = Ardhf.optimize(data, neighbours, cfg)
    assert(r1.tables.map(_.poolRows.toSeq) == r2.tables.map(_.poolRows.toSeq))
    val all = r1.tables.flatMap(_.poolRows)
    assert(all.length == 12 && all.distinct.length == 12)
    r1.tables.foreach(t => assert(t.hash.hash(data(0)) >= 0))
  }
}
