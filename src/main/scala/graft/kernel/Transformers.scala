package graft.kernel

/** The reference's five data transformers (operators T1–T5): a shared
  * pre-LSH projection fit once on a ≤30 000-point sample
  * (`/root/reference/hashIndex/HashCollection.h:41-43`,
  * `/root/reference/hashFunction/PCATransformer.h:17-21`) and then applied
  * to every point. Spark reading: fit on `limit(sampleN)` collected to the
  * driver (30k×dim fits trivially), broadcast the fitted parameters, apply
  * inside the same typed map as the hash kernel.
  */
sealed trait Transformer extends Serializable {
  def apply(v: Array[Float]): Array[Float]
}

/** T1 — identity (`NullTransformer.h:15-39`). */
case object NullTransformer extends Transformer {
  def apply(v: Array[Float]): Array[Float] = v
}

/** T2 — subtract per-dimension mean (`MeanTransformer.h:27-49`). */
final class MeanTransformer(mu: Array[Float]) extends Transformer {
  def apply(v: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i) - mu(i); i += 1 }
    out
  }
}

/** T3 — binarize against per-dimension means: 1.0 if x_i > mean_i else 0.0
  * (`ThresholdTransformer.h:27-45`; feeds H3 subsampling). */
final class ThresholdTransformer(mu: Array[Float]) extends Transformer {
  def apply(v: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { out(i) = if (v(i) > mu(i)) 1.0f else 0.0f; i += 1 }
    out
  }
}

/** T4 — PCA: fit principal components of the centered sample, keep the top
  * `numDims`, apply Wᵀ(x−μ) (`PCATransformer.h:30-53`). Fit runs at the
  * driver on the collected sample via Jacobi eigen-decomposition of the
  * covariance (deterministic, dependency-free; dims ≤ a few hundred). */
final class PcaTransformer(mu: Array[Double], w: Array[Array[Double]]) extends Transformer {
  val numDims: Int = w.length
  /** Principal-component rows (dump surface for the DuckDB Gram oracle). */
  private[graft] def basis: Array[Array[Double]] = w
  def apply(v: Array[Float]): Array[Float] = {
    val d = v.length
    val out = new Array[Float](numDims)
    var c = 0
    while (c < numDims) {
      val col = w(c)
      var acc = 0.0
      var i = 0
      while (i < d) { acc += col(i) * (v(i) - mu(i)); i += 1 }
      out(c) = acc.toFloat
      c += 1
    }
    out
  }
}

object PcaTransformer {
  /** Fit on a sample (rows = points). */
  def fit(sample: Array[Array[Float]], numDims: Int): PcaTransformer = {
    val n = sample.length
    require(n > 1, "PCA needs >1 sample row")
    val d = sample(0).length
    val mu = new Array[Double](d)
    sample.foreach { r => var i = 0; while (i < d) { mu(i) += r(i); i += 1 } }
    var i = 0
    while (i < d) { mu(i) /= n; i += 1 }
    // covariance (upper triangle, symmetrized)
    val cov = Array.ofDim[Double](d, d)
    sample.foreach { r =>
      var a = 0
      while (a < d) {
        val xa = r(a) - mu(a)
        var b = a
        while (b < d) { cov(a)(b) += xa * (r(b) - mu(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= (n - 1); cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(k => -vals(k)).take(numDims)
    val w = order.map(k => Array.tabulate(d)(r => vecs(r)(k))).toArray
    new PcaTransformer(mu, w)
  }

  /** Cyclic Jacobi eigenvalue algorithm for symmetric matrices.
    * Returns (eigenvalues, eigenvector columns). */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val eps = 1e-12 * frob(a)
    while (sweep < sweeps && off > eps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
  private def frob(a: Array[Array[Double]]): Double = {
    var s = 0.0
    a.foreach(_.foreach(x => s += x * x))
    math.sqrt(s) max 1e-300
  }
}

/** T5 — Double-Hadamard structured projection: sign(H·G·Π·H·D·(x−μ)) via the
  * recursive fast Walsh–Hadamard transform, emitting a binary vector
  * (`DHHashTransformer.h:26-55`; FWHT kernel `DoubleHadamardFuncs.h:17-91`).
  * O(d log d) per row, in place over a padded power-of-2 buffer. */
final class DHHashTransformer(
    mu: Array[Double],      // center (fit mean)
    dSign: Array[Double],   // random ±1 diagonal D
    g: Array[Double],       // random Gaussian diagonal G
    perm: Array[Int],       // random permutation Π
    padded: Int             // power-of-2 padded length
) extends Transformer {

  def apply(v: Array[Float]): Array[Float] = {
    val buf = new Array[Double](padded)
    var i = 0
    while (i < v.length) { buf(i) = (v(i) - mu(i)) * dSign(i); i += 1 }
    DHHashTransformer.fwht(buf)
    // permute + Gaussian diagonal
    val buf2 = new Array[Double](padded)
    i = 0
    while (i < padded) { buf2(i) = buf(perm(i)) * g(i); i += 1 }
    DHHashTransformer.fwht(buf2)
    val out = new Array[Float](padded)
    i = 0
    while (i < padded) { out(i) = if (buf2(i) > 0.0) 1.0f else 0.0f; i += 1 }
    out
  }
}

object DHHashTransformer {
  /** In-place fast Walsh–Hadamard transform (unnormalized butterflies,
    * matching `DoubleHadamardFuncs.h:56-91`'s recursive structure). */
  def fwht(a: Array[Double]): Unit = {
    val n = a.length
    var len = 1
    while (len < n) {
      var i = 0
      while (i < n) {
        var j = i
        while (j < i + len) {
          val x = a(j); val y = a(j + len)
          a(j) = x + y
          a(j + len) = x - y
          j += 1
        }
        i += len << 1
      }
      len <<= 1
    }
  }

  /** Naive O(n²) Hadamard multiply for the FWHT unit test. */
  def naiveHadamard(x: Array[Double]): Array[Double] = {
    val n = x.length
    Array.tabulate(n) { i =>
      var s = 0.0
      var j = 0
      while (j < n) {
        s += (if (java.lang.Integer.bitCount(i & j) % 2 == 0) x(j) else -x(j))
        j += 1
      }
      s
    }
  }

  def fit(sampleMean: Array[Double], seed: Long): DHHashTransformer = {
    val d = sampleMean.length
    var p = 1
    while (p < d) p <<= 1
    val dSign = Array.tabulate(d)(i =>
      if ((Hashing.derive(seed, 0x0d00 + i) & 1L) == 1L) 1.0 else -1.0)
    val g = Array.tabulate(p)(i => HashFunction.gaussian(seed ^ 0x0666L, i))
    val perm = {
      val idx = Array.tabulate(p)(identity)
      var i = p - 1
      while (i > 0) {
        val j = (Hashing.derive(seed ^ 0x0777L, i).abs % (i + 1)).toInt
        val t = idx(i); idx(i) = idx(j); idx(j) = t
        i -= 1
      }
      idx
    }
    new DHHashTransformer(sampleMean, dSign, g, perm, p)
  }
}
