package graft.conf

/** Engine configuration — the runtime replacement for the reference's
  * compile-time template instantiation (`HashCollection<Transformer, Hash,
  * Index, MAT>`, `/root/reference/hashIndex/HashCollection.h:21-22`, and the
  * SIKH/PCARR/LSHFOREST compile flags). One engine, one config case class;
  * every pseudo-random draw anywhere derives from `seed`.
  *
  * MinHash banding is the dedup reading of the reference's L-tables × b-bits
  * collection: `bands` ↔ tables, `rows` ↔ bits per table (SURVEY §7.0).
  */
final case class GraftConf(
    seed: Long = 42L,
    // transcript shingling + MinHash banding
    textShingleK: Int = 3,
    textBands: Int = 16,
    textRows: Int = 4,
    // audio shingling + MinHash banding
    audioShingleK: Int = 4,
    audioBands: Int = 16,
    audioRows: Int = 4,
    // SimHash
    simhashBits: Int = 60,
    simhashBands: Int = 4,
    simhashMaxHamming: Int = 8,
    // verification thresholds (exact Jaccard on shingle sets, operator Q7)
    textJaccardThreshold: Double = 0.7,
    audioJaccardThreshold: Double = 0.6,
    // substring pass: seed-window width in tokens
    substringWindow: Int = 10,
    // skew: max bucket size before the chain-pair fallback (SURVEY §7.4).
    // Buckets above this emit O(s) chain pairs instead of O(s²). True dup
    // groups are small (≤7 variants in the fixture; bounded in any real
    // corpus), while common-phrase band collisions grow ∝ corpus size —
    // measured at 800k clips, buckets of 17–128 members (the Zipf tail of
    // shared phrases, sizes ∝ corpus) contributed 42M of 59M candidate
    // pairs with essentially no true dups among them (the reference's own
    // bucket scans are likewise truncated at the retrieval budget,
    // StdHashIndex.h:159-183). 16 keeps every true group (≤7 variants)
    // on the exact path and pushes collision buckets onto the linear
    // chain path — the asymptotic regime any fixed cap reaches at scale.
    bucketCap: Int = 16,
    chainWidth: Int = 2,
    // absolute per-group buffer bound for the pair generator: members up to
    // this count are buffered (sorted, deterministic chain); members BEYOND
    // it are chain-paired in a bounded-memory streaming pass (arrival
    // order) bridged to the buffered chain — connected, never dropped,
    // flagged `capped`. See CandidatePairs for the determinism caveat.
    bucketHardStop: Int = 4 * 1000 * 1000,
    // connected components
    maxCcIterations: Int = 50,
    // checkpointing
    checkpointDir: Option[String] = None,
    // Shuffle diet: band/candidate stages shuffle Long SURROGATE ids
    // (xxhash64 of clip_id) instead of the id strings; strings are restored
    // inside the verify join (which carries them anyway), so accepted edges
    // and the CC loop keep native string labels (Components' collision-free
    // labeling argument is untouched). Surrogate collisions only ever ADD
    // candidate pairs, which exact verification rejects — except a 2^-64
    // same-pair collision (a dup pair whose two members hash equal is
    // dropped by the a<b predicate), the same accepted probability class as
    // the CC fingerprint early-stop. See DedupPipeline.
    surrogateIds: Boolean = false
) {
  def textNumPerm: Int = textBands * textRows
  def audioNumPerm: Int = audioBands * audioRows
  require(simhashBits % simhashBands == 0, "simhash bands must divide bits")
  require(bucketHardStop > bucketCap && bucketHardStop >= 2,
    "bucketHardStop must exceed bucketCap")
  require(chainWidth >= 1, "chainWidth must be positive")
  def simhashBandBits: Int = simhashBits / simhashBands
}
