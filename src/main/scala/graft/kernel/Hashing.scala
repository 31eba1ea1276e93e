package graft.kernel

/** Seeded, allocation-free 64-bit hashing primitives shared by every kernel.
  *
  * The reference library derives all hash families from seeded RNG draws
  * (`/root/reference/hashFunction/RandomProjectionHashFunction.h:36-45`) but
  * seeds them nondeterministically (`arma_rng::set_seed_random()`,
  * `/root/reference/hashBitOptimizers/RandomConstructor.h:71`). This engine
  * replaces that with explicit `seed + streamIdx` derivation so executors
  * never touch an RNG: every "random" constant is a pure function of the
  * config seed, which makes runs reproducible across cluster sizes — a
  * requirement for the resumability + two-cluster-size acceptance criteria.
  *
  * All mixers are public-domain constructions (splitmix64 finalizer; FNV-1a).
  */
object Hashing {

  /** splitmix64 finalizer — public-domain (Steele et al. / Vigna). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic stream: the i-th derived constant of `seed`. */
  @inline def derive(seed: Long, i: Long): Long = mix64(seed ^ mix64(i))

  /** FNV-1a 64 over a string's UTF-16 code units, then mixed.
    * Used for shingle → 64-bit ids; speed over crypto strength. */
  def hashString(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    val n = s.length
    while (i < n) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** FNV-1a 64 over raw bytes, then mixed. */
  def hashBytes(b: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Combine two 64-bit values order-sensitively. */
  @inline def combine(a: Long, b: Long): Long = mix64(a ^ mix64(b))

  // --------------------------------------------------------------------
  // Mersenne-61 modular arithmetic for textbook universal hashing
  // h(x) = (a·x + b) mod (2^61 − 1): the MinHash "permutations".
  // --------------------------------------------------------------------

  /** p = 2^61 − 1 (Mersenne prime). */
  val P61: Long = (1L << 61) - 1

  /** (a·b) mod (2^61−1) without overflow, via 128-bit product split.
    * For the 128-bit value hi·2^64 + lo: 2^64 ≡ 8 (mod p), so
    * value ≡ hi·8 + (lo >>> 61) + (lo & p). Inputs must be < 2^61. */
  @inline def mulMod61(a: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (hi << 3) + (lo >>> 61) + (lo & P61)
    if (r >= P61) r -= P61
    if (r >= P61) r -= P61
    r
  }

  /** Affine universal hash over Z_{2^61−1}. */
  @inline def affine61(a: Long, b: Long, x: Long): Long = {
    var r = mulMod61(a, x & P61) + b
    if (r >= P61) r -= P61
    r
  }

  /** Deterministic affine coefficients for permutation stream `i`:
    * a ∈ [1, p), b ∈ [0, p). */
  def permCoeffs(seed: Long, i: Int): (Long, Long) = {
    var a = derive(seed, 2L * i) & P61
    while (a == 0L || a >= P61) a = mix64(a) & P61
    var b = derive(seed, 2L * i + 1) & P61
    while (b >= P61) b = mix64(b) & P61
    (a, b)
  }

  /** Low 60 bits of MD5(s), parsed from the first 15 hex chars — the one
    * hash family this engine shares with external SQL engines (DuckDB and
    * Spark SQL both expose md5 as a hex string), used when a cross-engine
    * oracle must recompute a signature bit-for-bit. */
  def md5Low60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars == high 60 bits of the first 8 digest bytes, minus
    // the low nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // keep 60 bits
  }
}
