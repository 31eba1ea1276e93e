package graft.pipeline

import graft.audio.{AudioFeatures, WavCodec}
import graft.conf.GraftConf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-pair verification — reference operator Q7: LSH recall is
  * probabilistic, so every candidate is re-checked exactly before it becomes
  * an edge (`/root/reference/hashIndex/HashCollection.h:263`: exact L2
  * re-rank of hash candidates; here exact shingle Jaccard / token-substring
  * containment, the dedup metrics).
  *
  * Candidates are a small fraction of the corpus, so the verify stage joins
  * pairs back to the clip table (shuffle hash join on clip_id) and
  * re-derives shingles only for those rows — at 10^12 scale this re-decode
  * of candidates is far cheaper than carrying shingle sets through the band
  * shuffle.
  */
object VerifyPairs {

  /** pairs (a, b, sources, capped) × clips (clip_id, bytes, transcript)
    * → verified edges (a, b, text_jaccard, audio_jaccard, substring,
    *   accepted, reasons). */
  def verify(spark: SparkSession, pairs: DataFrame, clips: DataFrame, conf: GraftConf): DataFrame = {
    import spark.implicits._
    val c = conf
    val needsAudio = array_contains($"sources", "audio")

    val side = clips.select($"clip_id", $"bytes", $"transcript")
    val joined = pairs
      .join(side.select($"clip_id".as("a"), $"bytes".as("bytes_a"), $"transcript".as("text_a")), Seq("a"))
      .join(side.select($"clip_id".as("b"), $"bytes".as("bytes_b"), $"transcript".as("text_b")), Seq("b"))
      // audio payload only travels for audio-sourced candidates
      .withColumn("bytes_a", when(needsAudio, $"bytes_a").otherwise(lit(null)))
      .withColumn("bytes_b", when(needsAudio, $"bytes_b").otherwise(lit(null)))

    joined
      .select($"a", $"b", $"text_a", $"text_b", $"bytes_a", $"bytes_b")
      .as[(String, String, String, String, Array[Byte], Array[Byte])]
      .map { case (a, b, ta, tb, ba, bb) =>
        val sa = graft.kernel.Shingles.tokenShingles(graft.kernel.Shingles.tokens(Option(ta).getOrElse("")), c.textShingleK, c.seed)
        val sb = graft.kernel.Shingles.tokenShingles(graft.kernel.Shingles.tokens(Option(tb).getOrElse("")), c.textShingleK, c.seed)
        val textJ = graft.kernel.Shingles.jaccardSorted(sa, sb)

        val audioJ =
          if (ba != null && bb != null) {
            try {
              val da = WavCodec.decode(ba)
              val db = WavCodec.decode(bb)
              val asa = AudioFeatures.shingles(da.samples, c.audioShingleK, c.seed)
              val asb = AudioFeatures.shingles(db.samples, c.audioShingleK, c.seed)
              graft.kernel.Shingles.jaccardSorted(asa, asb)
            } catch { case _: IllegalArgumentException => 0.0 }
          } else 0.0

        val sub = isTokenSubstring(ta, tb) || isTokenSubstring(tb, ta)
        val accepted = textJ >= c.textJaccardThreshold ||
          audioJ >= c.audioJaccardThreshold || sub
        val reasons = Seq(
          if (textJ >= c.textJaccardThreshold) "text" else null,
          if (audioJ >= c.audioJaccardThreshold) "audio" else null,
          if (sub) "substring" else null).filter(_ != null)
        (a, b, textJ, audioJ, sub, accepted, reasons)
      }
      .toDF("a", "b", "text_jaccard", "audio_jaccard", "substring", "accepted", "reasons")
  }

  /** inner's token sequence appears contiguously in outer's. */
  def isTokenSubstring(inner: String, outer: String): Boolean = {
    if (inner == null || outer == null) false
    else {
      val in = inner.trim
      val out = outer.trim
      in.nonEmpty && out.nonEmpty && (" " + out + " ").contains(" " + in + " ")
    }
  }
}
