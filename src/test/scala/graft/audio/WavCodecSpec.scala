package graft.audio

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Hashing

class WavCodecSpec extends AnyFunSuite {

  test("encode → decode roundtrip is bit-exact (SNR = ∞ per-row invariant)") {
    var s = 3L
    for (n <- Seq(1, 31, 256, 4000); sr <- Seq(8000, 16000)) {
      val samples = Array.tabulate(n) { _ => s = Hashing.mix64(s); (s % 65536 - 32768).toShort }
      val dec = WavCodec.decode(WavCodec.encode(samples, sr))
      assert(dec.srHz === sr)
      assert(dec.samples.length === n)
      for (i <- 0 until n) assert(dec.samples(i) === samples(i) / 32768.0f)
      val ref = samples.map(_ / 32768.0f)
      assert(WavCodec.snrDb(ref, dec.samples).isPosInfinity)
    }
  }

  test("decoder skips unknown chunks and honors word alignment") {
    val samples = Array[Short](100, -200, 300, -400)
    val base = WavCodec.encode(samples, 8000)
    // splice an odd-length junk chunk between fmt and data
    val junk = Array[Byte]('J', 'U', 'N', 'K', 3, 0, 0, 0, 1, 2, 3, 0) // len 3 + pad
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36)            // RIFF..fmt chunk end
    out.write(junk)
    out.write(base, 36, base.length - 36) // data chunk
    val bytes = out.toByteArray
    // fix RIFF size
    val riffLen = bytes.length - 8
    bytes(4) = (riffLen & 0xff).toByte
    bytes(5) = ((riffLen >> 8) & 0xff).toByte
    bytes(6) = ((riffLen >> 16) & 0xff).toByte
    bytes(7) = ((riffLen >> 24) & 0xff).toByte
    val dec = WavCodec.decode(bytes)
    assert(dec.samples.length === 4)
    assert(dec.samples(2) === 300 / 32768.0f)
  }

  test("decoder rejects malformed input") {
    intercept[IllegalArgumentException](WavCodec.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](WavCodec.decode("RIFFxxxxWAVEnope".getBytes("US-ASCII")))
  }

  test("SNR math: 30 dB threshold behaves") {
    val ref = Array.tabulate(1000)(i => math.sin(i * 0.1).toFloat)
    val noisy30 = ref.map(x => x + (math.signum(x + 1e-9).toFloat * 0.02236f)) // ~27dB-ish
    val snr = WavCodec.snrDb(ref, noisy30)
    assert(snr > 20 && snr < 35)
    assert(WavCodec.snrDb(ref, ref).isPosInfinity)
  }

  test("audio features: gain-invariant, noise-robust, group-distinct") {
    // synthesize two distinct group masters via ClipTableGen's public surface
    val clipsA = graft.synth.ClipTableGen.group(42L, 1L)
    val clipsB = graft.synth.ClipTableGen.group(42L, 2L)
    val decA = WavCodec.decode(clipsA.head.bytes)
    val decB = WavCodec.decode(clipsB.head.bytes)
    val shA = AudioFeatures.shingles(decA.samples, 4, 42L)
    val shB = AudioFeatures.shingles(decB.samples, 4, 42L)
    assert(shA.nonEmpty && shB.nonEmpty)
    // distinct groups → far shingle sets
    assert(graft.kernel.Shingles.jaccardSorted(shA, shB) < 0.3)
    // gain change: scale samples ±1% → same shingles (RMS normalization)
    val gained = decA.samples.map(x => x * 1.01f)
    val shG = AudioFeatures.shingles(gained, 4, 42L)
    assert(graft.kernel.Shingles.jaccardSorted(shA, shG) > 0.9)
  }

  test("planted audionear variants stay within verify threshold and SNR ≥ 30 dB") {
    var checked = 0
    for (g <- 0L until 40L) {
      val rows = graft.synth.ClipTableGen.group(42L, g)
      val master = rows.head
      rows.filter(_.variant == "audionear").foreach { v =>
        val dm = WavCodec.decode(master.bytes)
        val dv = WavCodec.decode(v.bytes)
        assert(dm.samples.length === dv.samples.length)
        val snr = WavCodec.snrDb(dm.samples, dv.samples)
        assert(snr >= 30.0, s"group $g snr=$snr")
        val j = graft.kernel.Shingles.jaccardSorted(
          AudioFeatures.shingles(dm.samples, 4, 42L),
          AudioFeatures.shingles(dv.samples, 4, 42L))
        assert(j >= 0.6, s"group $g audio jaccard=$j")
        checked += 1
      }
    }
    assert(checked > 0, "fixture planted no audionear variants in 40 groups")
  }
}
