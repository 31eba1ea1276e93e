package graft.kernel

import org.scalacheck.{Gen, Prop, Properties}
import Prop.forAll

/** ScalaCheck properties from FIXTURES.md §3 / SURVEY §5.2(1):
  * permutation-invariance of the set-based kernels, estimator bounds, and
  * the band-collision ↔ Jaccard relationship. Pure ScalaCheck `Properties`
  * (sbt runs the ScalaCheck framework natively; no scalatest bridge). */
object PropertySpec extends Properties("kernels") {

  val longSets: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.long).map(_.distinct.toArray)

  property("minhashSetInvariance") = forAll(longSets, Gen.long) { (set, seed) =>
    val mh = new MinHash(32, 42L)
    val shuffled = new scala.util.Random(seed).shuffle(set.toSeq).toArray
    val withDups = set ++ set.take(set.length / 2)
    mh.signature(set).toSeq == mh.signature(shuffled).toSeq &&
      mh.signature(set).toSeq == mh.signature(withDups).toSeq
  }

  property("simhashSetInvarianceAndBitRange") = forAll(longSets, Gen.long) { (set, seed) =>
    val bitsOf = SimHash.mixBits(42L)
    val shuffled = new scala.util.Random(seed).shuffle(set.toSeq).toArray
    val c1 = SimHash.signature(set, 60, bitsOf)
    c1 == SimHash.signature(shuffled, 60, bitsOf) && (c1 >>> 60) == 0L
  }

  property("jaccardSortedBoundsIdentitySymmetry") = forAll(longSets, longSets) { (a0, b0) =>
    val a = a0.sorted
    val b = b0.sorted
    val j = Shingles.jaccardSorted(a, b)
    j >= 0.0 && j <= 1.0 &&
      Shingles.jaccardSorted(a, a) == 1.0 &&
      j == Shingles.jaccardSorted(b, a)
  }

  property("minhashEstimateMonotoneInJaccard") = Prop {
    val mh = new MinHash(256, 7L)
    val base = Array.tabulate(200)(i => Hashing.mix64(i.toLong))
    def overlap(frac: Double): Array[Long] = {
      val keep = (200 * frac).toInt
      base.take(keep) ++ Array.tabulate(200 - keep)(i => Hashing.mix64(1000L + i))
    }
    val sigBase = mh.signature(base)
    val estimates = Seq(0.9, 0.6, 0.3, 0.1).map { f =>
      mh.estimate(sigBase, mh.signature(overlap(f)))
    }
    estimates == estimates.sorted.reverse
  }

  property("bandKeysDependOnlyOnSet") = forAll(longSets) { set =>
    val mh = new MinHash(16, 42L)
    val keys1 = MinHash.bandKeys(mh.signature(set), 4, 4, 42L)
    val keys2 = MinHash.bandKeys(mh.signature(set.reverse), 4, 4, 42L)
    keys1.toSeq == keys2.toSeq
  }

  property("subsequenceContainment") = forAll(longSets, longSets) { (a, b) =>
    import graft.pipeline.VerifyPairs.isSubSequence
    val slice = a.slice(a.length / 3, a.length)
    isSubSequence(a, a ++ b) &&
      isSubSequence(a, b ++ a) &&
      (slice.isEmpty || isSubSequence(slice, a)) &&
      !isSubSequence(Array.empty[Long], a)
  }

  property("mulMod61MatchesBigInt") =
    forAll(Gen.chooseNum(0L, Hashing.P61 - 1), Gen.chooseNum(0L, Hashing.P61 - 1)) { (a, b) =>
      val p = BigInt(Hashing.P61)
      BigInt(Hashing.mulMod61(a, b)) == (BigInt(a) * BigInt(b)) % p
    }

  property("shinglesSortedDistinct") = forAll(Gen.nonEmptyListOf(Gen.long)) { seq =>
    val sh = Shingles.longShingles(seq.toArray, 3, 42L)
    sh.toSeq == sh.toSeq.distinct.sorted
  }

  // The multiprobe plan's completeness argument (AnnQueries): any pair of
  // 16-bit codes within Hamming radius 6 must share a probed bucket when
  // each of the 4 4-bit bands is probed at every XOR mask of the
  // radius-⌊6/4⌋ ball (pigeonhole: 4 bands all differing by ≥ 2 ⇒ total
  // ≥ 8 > 6). The SQL equi-join keys are exactly these (band, key ^ mask)
  // pairs, so this property is the plan's candidate-completeness proof.
  property("bandedMultiprobeCoversTheHammingBall") = {
    val masks = Probes.ballMasks(4, 1)
    def probedTogether(a: Long, b: Long): Boolean =
      (0 until 4).exists { band =>
        val ka = (a >>> (band * 4)) & 15
        val kb = (b >>> (band * 4)) & 15
        masks.exists(m => (ka ^ m) == kb)
      }
    // generate b INSIDE the ball (flip ≤ 6 distinct bits of a) so the
    // property exercises the covering claim, not the vacuous branch
    val inBall = for {
      a <- Gen.chooseNum(0L, (1L << 16) - 1)
      k <- Gen.chooseNum(0, 6)
      bits <- Gen.pick(k, 0 until 16)
    } yield (a, bits.foldLeft(a)((acc, i) => acc ^ (1L << i)))
    forAll(inBall) { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) <= 6 && probedTogether(a, b)
    }
  }
}
