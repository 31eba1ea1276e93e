package graft.kernel

/** Bit packing (reference operator H6): bool vector → 64-bit code via
  * powers-of-2, the idiom every reference hash function shares through the
  * precomputed `singleMul[i] = 1ull << i` dot product
  * (`/root/reference/hashFunction/RandomProjectionHashFunction.h:41-44,47-53`).
  * Here it is a plain shift-or loop inside the kernel. */
object BitPack {

  @inline def pack(bits: Array[Boolean]): Long = {
    var code = 0L
    var i = 0
    while (i < bits.length) {
      if (bits(i)) code |= (1L << i)
      i += 1
    }
    code
  }

  /** Hamming distance between two codes. */
  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Split a code into `bands` contiguous sub-codes of `bitsPerBand` bits,
    * low band first — the banding view of a multi-table code
    * (table ↔ band per SURVEY §7.0). */
  def bands(code: Long, nBands: Int, bitsPerBand: Int): Array[Long] = {
    val out = new Array[Long](nBands)
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    var i = 0
    while (i < nBands) {
      out(i) = (code >>> (i * bitsPerBand)) & mask
      i += 1
    }
    out
  }
}
