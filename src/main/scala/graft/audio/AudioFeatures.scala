package graft.audio

import graft.kernel.{Hashing, Shingles}

/** Audio → discrete feature-frame sequence → shingle set.
  *
  * The reference hashes dense GIST/SIFT feature vectors; the audio graft's
  * analogue is a per-clip sequence of quantized frame descriptors. Design
  * goals: (a) deterministic; (b) gain-invariant (clip is RMS-normalized
  * before framing) and robust to low-level additive noise (coarse
  * quantization), so planted near-dups (−40 dB noise / small gain change,
  * FIXTURES.md §1) keep high shingle Jaccard; (c) cheap enough to run inside
  * the decode `mapPartitions` pass at 10^12-row scale.
  *
  * Frame descriptor = (log2-energy bin at `qStep` resolution, zero-crossing
  * count bin), mixed into one Long token; shingles = k-grams of tokens.
  */
object AudioFeatures {

  val FrameLen = 256
  val EnergyQuantStep = 0.5 // log2-energy bin width
  val ZcrQuantStep = 16     // zero-crossings per bin

  /** Quantized frame-token sequence of a decoded clip. */
  def frameTokens(samples: Array[Float]): Array[Long] = {
    val n = samples.length / FrameLen
    if (n == 0) return Array.empty
    // gain invariance: normalize by whole-clip RMS
    var sumSq = 0.0
    var i = 0
    while (i < n * FrameLen) { sumSq += samples(i).toDouble * samples(i); i += 1 }
    val rms = math.sqrt(sumSq / (n * FrameLen)) max 1e-9
    val out = new Array[Long](n)
    val hyst = 0.25 // crossings only count beyond ±0.25·RMS (noise-robust)
    var f = 0
    while (f < n) {
      val off = f * FrameLen
      var e = 0.0
      var zc = 0
      var j = 0
      var sigSign = 0 // last significant sign: -1, 0 (unset), +1
      while (j < FrameLen) {
        val x = samples(off + j) / rms
        e += x * x
        if (x > hyst) {
          if (sigSign < 0) zc += 1
          sigSign = 1
        } else if (x < -hyst) {
          if (sigSign > 0) zc += 1
          sigSign = -1
        }
        j += 1
      }
      val eBin = math.floor(math.log(e / FrameLen + 1e-12) / math.log(2.0) / EnergyQuantStep).toLong
      val zBin = (zc / ZcrQuantStep).toLong
      out(f) = Hashing.combine(eBin, zBin)
      f += 1
    }
    out
  }

  /** Shingle-hash set of a clip: k-grams over the frame-token sequence. */
  def shingles(samples: Array[Float], k: Int, seed: Long): Array[Long] =
    Shingles.longShingles(frameTokens(samples), k, seed)

  private val Inv32768 = 1.0 / 32768.0 // exact power of two

  /** Short-domain twin of [[frameTokens]], bit-identical by construction:
    * every int16 `s` maps to the exact double `s / 32768.0` in both paths
    * (float division by a power of two is exact for 16-bit magnitudes), and
    * all downstream arithmetic is the same double expression in the same
    * order. Avoids the intermediate Float array on the kernel hot path. */
  def frameTokensFromShorts(samples: Array[Short]): Array[Long] = {
    val n = samples.length / FrameLen
    if (n == 0) return Array.empty
    var sumSq = 0.0
    var i = 0
    while (i < n * FrameLen) {
      val xs = samples(i) * Inv32768
      sumSq += xs * xs
      i += 1
    }
    val rms = math.sqrt(sumSq / (n * FrameLen)) max 1e-9
    val out = new Array[Long](n)
    val hyst = 0.25
    var f = 0
    while (f < n) {
      val off = f * FrameLen
      var e = 0.0
      var zc = 0
      var j = 0
      var sigSign = 0
      while (j < FrameLen) {
        val x = (samples(off + j) * Inv32768) / rms
        e += x * x
        if (x > hyst) {
          if (sigSign < 0) zc += 1
          sigSign = 1
        } else if (x < -hyst) {
          if (sigSign > 0) zc += 1
          sigSign = -1
        }
        j += 1
      }
      val eBin = math.floor(math.log(e / FrameLen + 1e-12) / math.log(2.0) / EnergyQuantStep).toLong
      val zBin = (zc / ZcrQuantStep).toLong
      out(f) = Hashing.combine(eBin, zBin)
      f += 1
    }
    out
  }

  /** Shingles over the short-domain frame tokens (kernel hot path). */
  def shinglesFromShorts(samples: Array[Short], k: Int, seed: Long): Array[Long] =
    Shingles.longShingles(frameTokensFromShorts(samples), k, seed)
}
