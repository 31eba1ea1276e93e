package graft.kernel

/** Batched MinHash signature kernel — the reimagining of the reference's
  * partition-parallel hash-function inner loop.
  *
  * The reference builds its index by looping 1M-point chunks × L tables and
  * running each table's batched `getHash` over the whole chunk
  * (`/root/reference/hashIndex/HashCollection.h:80-89`, chunk size at `:67`);
  * each table selects its own view of the shared feature space, the same
  * "select-k-of-n per table" pattern as RandomSubSamplingHashFunction
  * (`/root/reference/hashFunction/RandomSubSamplingHashFunction.h:37-51`).
  * Here: chunk → Spark partition, table → permutation stream, and the inner
  * loop is a tight primitive-array scan inside a typed Dataset map —
  * signatures land as `ArrayType(LongType)` columns for relational stages.
  *
  * h_i(x) = (a_i·x + b_i) mod (2^61−1); sig_i = min over shingles.
  */
final class MinHash(val numPerm: Int, seed: Long) extends Serializable {
  private val as = new Array[Long](numPerm)
  private val bs = new Array[Long](numPerm)
  locally {
    var i = 0
    while (i < numPerm) {
      val (a, b) = Hashing.permCoeffs(seed, i)
      as(i) = a; bs(i) = b; i += 1
    }
  }

  /** Signature of a shingle-hash set. Empty set → all-maxvalue sentinel
    * signature (never collides with a real min below p). */
  def signature(shingles: Array[Long]): Array[Long] = {
    val sig = new Array[Long](numPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val x = shingles(s) & Hashing.P61
      var i = 0
      while (i < numPerm) {
        val h = Hashing.affine61(as(i), bs(i), x)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Element-wise-min merge of two signatures (the UDAF/Aggregator path if
    * signatures are ever built incrementally across segments). */
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val out = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) { out(i) = math.min(x(i), y(i)); i += 1 }
    out
  }

  /** Estimated Jaccard from two signatures (fraction of agreeing slots). */
  def estimate(x: Array[Long], y: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < numPerm) { if (x(i) == y(i)) eq += 1; i += 1 }
    eq.toDouble / numPerm
  }
}

object MinHash {
  /** Band keys from a signature: hash `rows` consecutive slots per band,
    * salted by band index so identical row-tuples in different bands never
    * share a key (table ↔ band, SURVEY §7.0). */
  def bandKeys(sig: Array[Long], bands: Int, rows: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Hashing.derive(seed, 0x9000 + b)
      var r = 0
      while (r < rows) { h = Hashing.combine(h, sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }
}
