package graft.pipeline

import graft.audio.{AudioFeatures, WavCodec}
import graft.conf.GraftConf
import graft.kernel.{BitPack, Hashing, MinHash, Shingles, SimHash}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Per-clip signature row: everything downstream stages need — including
  * the sorted shingle-hash sets (~0.5–2 KB/row), so the verification stage
  * joins candidates back to THIS table instead of re-shipping and
  * re-decoding multi-KB audio payloads. The heavy `bytes` column never
  * leaves the signature scan; shingle sets never travel through the band
  * shuffle (bands are separate slim rows). */
final case class ClipSignature(
    clip_id: String,
    text_bands: Array[Long],
    audio_bands: Array[Long],
    simhash: Long,
    simhash_bands: Array[Long],
    text_sh: Array[Long],
    audio_sh: Array[Long],
    n_text_shingles: Int,
    n_audio_shingles: Int,
    decode_ok: Boolean)

/** The signature stage — the reimplementation of the reference's
  * partition-parallel hash-function inner loop
  * (`/root/reference/hashIndex/HashCollection.h:66-107`: chunk loop ×
  * per-table OpenMP loop over a BLAS-batched `getHash`). Spark reading:
  * chunk → partition, table → band; one `mapPartitions` pass per partition
  * batches rows through primitive-array kernels (decode → shingle → MinHash
  * → band keys → SimHash) with zero executor RNG and zero driver collection.
  * Stays a typed Dataset op, so Catalyst plans around it (column pruning
  * upstream: only clip_id/bytes/transcript are read).
  */
object Signatures {

  def compute(spark: SparkSession, clips: DataFrame, conf: GraftConf): Dataset[ClipSignature] = {
    import spark.implicits._
    val c = conf
    clips
      .selectExpr("clip_id", "bytes", "transcript")
      .as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition kernel setup (broadcast-equivalent: derived from conf
        // seeds, so constructing locally is cheaper than shipping matrices)
        val textMh = new MinHash(c.textNumPerm, c.seed ^ 0x7e47L)
        val audioMh = new MinHash(c.audioNumPerm, c.seed ^ 0xa0d10L)
        it.map { case (id, bytes, transcript) =>
          val toks = Shingles.tokens(if (transcript == null) "" else transcript)
          val textSh = Shingles.tokenShingles(toks, c.textShingleK, c.seed)
          val textSig = textMh.signature(textSh)
          val textBands = MinHash.bandKeys(textSig, c.textBands, c.textRows, c.seed ^ 0x7e47L)

          var audioSh: Array[Long] = Array.empty
          var decodeOk = false
          if (bytes != null && bytes.length > 0) {
            try {
              val dec = WavCodec.decode(bytes)
              audioSh = AudioFeatures.shingles(dec.samples, c.audioShingleK, c.seed)
              decodeOk = true
            } catch { case _: IllegalArgumentException => () } // malformed row: signature-less, logged via decode_ok
          }
          val audioSig = audioMh.signature(audioSh)
          val audioBands =
            if (decodeOk && audioSh.nonEmpty)
              MinHash.bandKeys(audioSig, c.audioBands, c.audioRows, c.seed ^ 0xa0d10L)
            else Array.empty[Long]

          val sim = SimHash.signature(textSh, c.simhashBits, SimHash.mixBits(c.seed ^ 0x51e4L))
          val simBandVals = BitPack.bands(sim, c.simhashBands, c.simhashBandBits)
          val simBands = simBandVals.zipWithIndex.map { case (v, i) =>
            Hashing.combine(Hashing.derive(c.seed ^ 0x51e4L, 0xb000 + i), v)
          }
          ClipSignature(id, textBands, audioBands, sim, simBands, textSh, audioSh,
            textSh.length, audioSh.length, decodeOk)
        }
      }
  }
}
