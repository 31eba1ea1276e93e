package graft.kernel

/** Shingling: text / token-sequence / feature-sequence → set of 64-bit
  * shingle ids. The reference hashes dense vectors directly; the dedup graft
  * hashes k-gram shingles of transcripts and audio feature frames instead,
  * which is the document analogue of its feature space. */
object Shingles {

  /** Whitespace tokenization (single spaces in the synthetic corpora). */
  def tokens(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Distinct k-token shingle hashes (word n-grams). */
  def tokenShingles(toks: Array[String], k: Int, seed: Long): Array[Long] = {
    if (toks.length < k) {
      if (toks.isEmpty) Array.empty
      else Array(Hashing.hashString(toks.mkString(" "), seed))
    } else {
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + k <= toks.length) {
        var h = seed
        var j = 0
        while (j < k) { h = Hashing.combine(h, Hashing.hashString(toks(i + j), seed)); j += 1 }
        set.add(h)
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var n = 0
      while (it.hasNext) { out(n) = it.next(); n += 1 }
      out
    }
  }

  /** Distinct k-gram shingle hashes over an arbitrary Long token sequence
    * (used for audio feature-frame sequences). */
  def longShingles(seq: Array[Long], k: Int, seed: Long): Array[Long] = {
    if (seq.isEmpty) return Array.empty
    val kk = math.min(k, seq.length)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + kk <= seq.length) {
      var h = seed
      var j = 0
      while (j < kk) { h = Hashing.combine(h, seq(i + j)); j += 1 }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    out
  }

  /** Exact Jaccard of two SORTED distinct-hash arrays (verification stage,
    * reference operator Q7: exact re-check of hash candidates,
    * `/root/reference/hashIndex/HashCollection.h:263`). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }
}
