package graft.pipeline

import graft.conf.GraftConf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-pair verification — reference operator Q7: LSH recall is
  * probabilistic, so every candidate is re-checked exactly before it becomes
  * an edge (`/root/reference/hashIndex/HashCollection.h:263`: exact L2
  * re-rank of hash candidates; here exact shingle Jaccard / token-substring
  * containment, the dedup metrics).
  *
  * Scale design: the pair set joins back to the SIGNATURE table only (two
  * joins), which carries the sorted shingle-hash sets (~1 KB/row) and the
  * ordered token-hash sequence — the multi-KB `bytes` column never travels
  * through a verification shuffle, audio is never re-decoded, and substring
  * containment is a subarray search over token hashes. All three exact
  * checks (text Jaccard, audio Jaccard, substring containment) run on every
  * candidate, matching the reference-oracle semantics exactly.
  */
object VerifyPairs {

  /** pairs (a, b, sources, capped) × signatures (clip_id, text_sh,
    * audio_sh, toks_h)
    * → verified edges (a, b, text_jaccard, audio_jaccard, substring,
    *   accepted, reasons). */
  def verify(spark: SparkSession, pairs: DataFrame, signatures: DataFrame,
      conf: GraftConf): DataFrame = {
    import spark.implicits._
    val c = conf

    val sigSide = signatures.select($"clip_id", $"text_sh", $"audio_sh", $"toks_h")

    pairs
      .join(sigSide.select($"clip_id".as("a"), $"text_sh".as("tsh_a"), $"audio_sh".as("ash_a"), $"toks_h".as("th_a")), Seq("a"))
      .join(sigSide.select($"clip_id".as("b"), $"text_sh".as("tsh_b"), $"audio_sh".as("ash_b"), $"toks_h".as("th_b")), Seq("b"))
      .select($"a", $"b", $"tsh_a", $"tsh_b", $"ash_a", $"ash_b", $"th_a", $"th_b")
      .as[(String, String, Array[Long], Array[Long], Array[Long], Array[Long], Array[Long], Array[Long])]
      .map { case (a, b, tshA, tshB, ashA, ashB, thA, thB) =>
        val textJ = graft.kernel.Shingles.jaccardSorted(tshA, tshB)
        val audioJ =
          if (ashA.nonEmpty && ashB.nonEmpty) graft.kernel.Shingles.jaccardSorted(ashA, ashB)
          else 0.0
        val sub = isSubSequence(thA, thB) || isSubSequence(thB, thA)
        val accepted = textJ >= c.textJaccardThreshold ||
          (ashA.nonEmpty && ashB.nonEmpty && audioJ >= c.audioJaccardThreshold) || sub
        val reasons = Seq(
          if (textJ >= c.textJaccardThreshold) "text" else null,
          if (audioJ >= c.audioJaccardThreshold) "audio" else null,
          if (sub) "substring" else null).filter(_ != null)
        (a, b, textJ, audioJ, sub, accepted, reasons)
      }
      .toDF("a", "b", "text_jaccard", "audio_jaccard", "substring", "accepted", "reasons")
  }

  /** inner's token-hash sequence appears contiguously in outer's — the
    * token-domain reading of [[isTokenSubstring]] (64-bit token hashes make
    * a false positive a ~2^-64 event). Empty inner never matches (a clip
    * with no transcript is not "contained" in everything). */
  def isSubSequence(inner: Array[Long], outer: Array[Long]): Boolean = {
    if (inner.isEmpty || inner.length > outer.length) return false
    var i = 0
    val limit = outer.length - inner.length
    while (i <= limit) {
      var j = 0
      while (j < inner.length && outer(i + j) == inner(j)) j += 1
      if (j == inner.length) return true
      i += 1
    }
    false
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
