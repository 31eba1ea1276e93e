package graft.audio

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM RIFF/WAV pcm_s16le codec — the "multimodal binary column"
  * decode step, implemented for real (no native audio libs in the sandbox;
  * the WAV container + 16-bit PCM is bit-exactly decodable in ~100 lines).
  * The input contract is the BASELINE.json input_hint: `bytes: binary`
  * holding a mono pcm_s16le WAV, `sr_hz`/`dur_ms`/`codec` metadata columns.
  *
  * Decoded samples are Float in [-1, 1) (int16 / 32768). The per-row
  * invariant (decoded-PCM allclose, SNR ≥ 30 dB) is checked in tests via
  * [[WavCodec.snrDb]]; our decode of our encode is bit-exact (SNR = ∞).
  */
object WavCodec {

  final case class Decoded(srHz: Int, samples: Array[Float])
  final case class DecodedShorts(srHz: Int, samples: Array[Short])

  /** Encode mono int16 samples as a minimal 44-byte-header WAV. */
  def encode(samples: Array[Short], srHz: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)               // PCM fmt chunk size
    buf.putShort(1)              // WAVE_FORMAT_PCM
    buf.putShort(1)              // mono
    buf.putInt(srHz)
    buf.putInt(srHz * 2)         // byte rate
    buf.putShort(2)              // block align
    buf.putShort(16)             // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decode a mono pcm_s16le WAV to Float samples in [-1, 1). Walks RIFF
    * chunks properly (skips unknown chunks, honors odd-length padding,
    * accepts WAVE_FORMAT_EXTENSIBLE with a PCM subformat). Throws
    * IllegalArgumentException on malformed input. */
  def decode(bytes: Array[Byte]): Decoded = {
    val (srHz, dataOff, dataLen, buf) = parse(bytes)
    val n = dataLen / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = buf.getShort(dataOff + 2 * i) / 32768.0f
      i += 1
    }
    Decoded(srHz, out)
  }

  /** RIFF walk + validation shared by both decode variants:
    * returns (srHz, dataOff, dataLen, little-endian buffer). */
  private def parse(bytes: Array[Byte]): (Int, Int, Int, ByteBuffer) = {
    require(bytes.length >= 12, "too short for RIFF")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(tag(buf, 0) == "RIFF" && tag(buf, 8) == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var srHz = -1
    var bits = -1
    var channels = -1
    var fmtCode = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length) {
      val id = tag(buf, pos)
      val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"chunk '$id' overruns buffer")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          fmtCode = buf.getShort(pos + 8) & 0xffff
          channels = buf.getShort(pos + 10) & 0xffff
          srHz = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22) & 0xffff
          if (fmtCode == 0xfffe) { // WAVE_FORMAT_EXTENSIBLE: subformat GUID at +24+20
            require(len >= 40, "extensible fmt chunk too short")
            fmtCode = buf.getShort(pos + 8 + 24 + 2 + 4 + 2) & 0xffff // first 2 bytes of GUID
          }
        case "data" =>
          dataOff = pos + 8
          dataLen = len
        case _ => () // skip LIST/fact/etc.
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(fmtCode == 1, s"unsupported format code $fmtCode (want PCM)")
    require(channels == 1, s"unsupported channel count $channels (want mono)")
    require(bits == 16, s"unsupported bit depth $bits (want 16)")
    require(dataOff >= 0, "no data chunk")
    (srHz, dataOff, dataLen, buf)
  }

  /** Decode to raw int16 samples (no float buffer) — the hot-path variant
    * for the signature kernel; same RIFF walk and validation as [[decode]].
    * `sample / 32768f` is exact for every int16, so the short-domain feature
    * path downstream is bit-identical to the float one. */
  def decodeShorts(bytes: Array[Byte]): DecodedShorts = {
    val (srHz, dataOff, dataLen, buf) = parse(bytes)
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = buf.getShort(dataOff + 2 * i)
      i += 1
    }
    DecodedShorts(srHz, out)
  }

  private def tag(buf: ByteBuffer, off: Int): String =
    new String(Array(buf.get(off), buf.get(off + 1), buf.get(off + 2), buf.get(off + 3)), "US-ASCII")

  /** Signal-to-noise ratio in dB of `test` against `ref` (aligned, equal
    * length). Infinity when bit-identical. The ≥30 dB per-row invariant. */
  def snrDb(ref: Array[Float], test: Array[Float]): Double = {
    require(ref.length == test.length, "SNR needs aligned equal-length signals")
    var sig = 0.0
    var err = 0.0
    var i = 0
    while (i < ref.length) {
      sig += ref(i).toDouble * ref(i)
      val e = ref(i).toDouble - test(i)
      err += e * e
      i += 1
    }
    if (err == 0.0) Double.PositiveInfinity
    else if (sig == 0.0) Double.NegativeInfinity
    else 10.0 * math.log10(sig / err)
  }
}
