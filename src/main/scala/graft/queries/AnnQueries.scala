package graft.queries

import graft.kernel.Probes
import org.apache.spark.sql.{DataFrame, SparkSession}
import CrossSql._

/** The reference's production read path (`batchQuery`, operator Q5,
  * `/root/reference/hashIndex/HashCollection.h:232-295`) re-expressed
  * end-to-end as one relational query over `embeddings`, cross-engine
  * checkable — and, on the Spark side, executed with the reference's ACTUAL
  * query mechanism:
  *
  *   1. hash queries + base with the H1 sign-projection code (the hoisted
  *      md5-parity matrix of [[CrossSql.sparkSgnCte]]);
  *   2. candidate gather = EXECUTED MULTIPROBE: the 16-bit code is split
  *      into [[Bands]] sub-codes (H6 banding, [[graft.kernel.BitPack.bands]]
  *      semantics), each band's bucket key is probed at every XOR mask of
  *      the expanding Hamming ball [[BandProbeMasks]]
  *      ([[graft.kernel.Probes.ballMasks]] — operator P2), and probes
  *      equi-join bucket members on `(band_idx, probed_key)` — operators
  *      Q1/Q2's `bucket[hashCode ^ mask]` lookups
  *      (`/root/reference/hashIndex/StdHashIndex.h:129-157`) as a shuffled
  *      hash join instead of a pairwise theta-join. Candidates from all
  *      bands union via DISTINCT (Q4, `HashCollection.h:196-210`; the
  *      reference accumulates per-table candidates in a round-robin
  *      interleave there — LshForestSpec's "Q4 depth-major round-robin"
  *      set-equivalence argument covers this non-forest union too, since
  *      unbudgeted per-table candidate SETS are interleave-order-invariant
  *      and the budgeted gather is truncated in the same expanding-distance
  *      order the interleave visits).
  *      Completeness: a pair within global Hamming distance [[ProbeRadius]]
  *      must agree within [[BandRadius]] on ≥1 band (pigeonhole:
  *      4 bands all differing by ≥2 ⇒ total ≥ 8 > 6), so the probe join
  *      dominates the ball and the post-join `bit_count(xor) ≤ r` filter
  *      restores exactness; the gather is truncated at the per-query
  *      retrieval budget [[GatherCap]] (the reference's early exit) in
  *      expanding-distance order;
  *   3. exact re-rank by cosine (Q7) + per-query top-k rank window (Q8).
  *
  * The DuckDB oracle keeps the direct `bit_count(xor(a,b)) ≤ r` theta
  * formulation — an independent spelling of the same candidate set, so the
  * cross-engine hash compare also certifies the multiprobe plan's
  * completeness argument on real data.
  *
  * q_ann_recall then scores the ANN result against the brute-force kNN —
  * the HashError evaluation operator (O2,
  * `/root/reference/hashBitOptimizers/HashError.h:29-83`) as a query:
  * per-query hit count at k, all-integer outputs. (Its ground-truth CTE is
  * the deliberate brute-force baseline, the reference's own ground-truth
  * path `TestLSH.h:150-180`.)
  */
object AnnQueries {

  val Dim = EmbedQueries.Dim
  val TopK = 5
  val ProbeRadius = 6 // global Hamming radius over CodeBits=16
  val QueryStride = EmbedQueries.QueryStride

  /** Banding of the 16-bit code for the probe join. At production scale the
    * same plan runs with 64-bit codes in 4×16-bit bands and a per-band ball
    * of radius floor(r/4) — key cardinality 2^16 per band keeps the shuffle
    * well spread; the join/probe shape is scale-free. */
  val Bands = 4
  val BandBits: Int = EmbedQueries.CodeBits / Bands
  /** Pigeonhole per-band radius: if every band differs by more than
    * floor(ProbeRadius/Bands), the total exceeds ProbeRadius. */
  val BandRadius: Int = ProbeRadius / Bands
  /** P2 expanding-ball XOR masks actually executed in the plan. */
  val BandProbeMasks: Array[Long] = Probes.ballMasks(BandBits, BandRadius)

  /** Per-query retrieval budget on the candidate gather — the reference's
    * early exit (`StdHashIndex.h:129-157` at `:150`: stop probing once
    * enough candidates are retrieved) as a deterministic rank cap ordered
    * by (Hamming distance, id), i.e. the expanding-ball discovery order.
    * Without it a dense duplicate region floods the exact re-rank with
    * unbounded candidates — the one 100 TB hazard the uncapped plan had.
    *
    * Cross-dialect equivalence: the Spark probe join gathers a SUPERSET of
    * the Hamming ball (pigeonhole), but every extra has distance
    * > [[ProbeRadius]], strictly greater than every ball member's — so
    * ball members' (distance, id) ranks are identical whether computed
    * within the superset (Spark) or within the exact ball (oracle), and
    * the post-cap `bit_count ≤ r` filter leaves the same capped set. */
  val GatherCap = 128

  private def sparkDot(a: String, b: String): String =
    s"aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) -> acc + CAST(element_at($a, i) AS DOUBLE) * CAST(element_at($b, i) AS DOUBLE))"
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def codesCte(bitDot: Int => String, normExpr: String): String =
    // per-vector norm precomputed once (identical double fold as per-pair)
    s"codes AS (SELECT vec_id, embedding, sqrt($normExpr) AS nrm, CAST(${EmbedQueries.codeExpr(bitDot)} AS BIGINT) AS code FROM embeddings CROSS JOIN sgn)"

  private val duckCodes = codesCte(EmbedQueries.duckBitDot, duckDot("embedding", "embedding"))

  /** The table-0 ("rp") code table's defining SQL — materialized once per
    * (session, dir) via [[CodesCache]] (see there for why: CTE inlining
    * rebuilt it under every reference). Shared with [[ForestQueries]],
    * whose table 0 is the same projection. */
  private[queries] val codesRpSql: String =
    s"""WITH ${sparkSgnCte("rp", EmbedQueries.CodeBits, Dim)}
       |SELECT vec_id, embedding, sqrt(${sparkDot("embedding", "embedding")}) AS nrm,
       |  CAST(${EmbedQueries.codeExpr(EmbedQueries.sparkBitDot)} AS BIGINT) AS code
       |FROM embeddings CROSS JOIN sgn""".stripMargin

  /** Registered view name of the materialized rp code table. */
  private[queries] def codesRpView(spark: SparkSession, dir: String): String =
    CodesCache.materialize(spark, dir, "codes_rp", codesRpSql)

  private def sparkWith(spark: SparkSession, dir: String): String =
    s"codes AS (SELECT vec_id, embedding, nrm, code FROM ${codesRpView(spark, dir)})"
  private val duckWith =
    s"${duckSgnCte("rp", EmbedQueries.CodeBits, Dim)},\n$duckCodes"

  /** Spark CTE chain on top of `codes`: banded multiprobe equi-join →
    * exact filter + re-rank (see class doc, step 2). */
  private val sparkAnnCtes: String = {
    val bandMask = (1L << BandBits) - 1
    val probes = BandProbeMasks.map(m => s"CAST($m AS BIGINT)").mkString(", ")
    s"""q AS (SELECT * FROM codes WHERE vec_id % $QueryStride = 0),
       |bb AS (
       |  SELECT vec_id, band_idx, shiftright(code, band_idx * $BandBits) & $bandMask AS band_key
       |  FROM codes LATERAL VIEW explode(sequence(0, ${Bands - 1})) tb AS band_idx),
       |qp AS (
       |  SELECT vec_id, band_idx,
       |    (shiftright(code, band_idx * $BandBits) & $bandMask) ^ pm AS band_key
       |  FROM q LATERAL VIEW explode(sequence(0, ${Bands - 1})) tb AS band_idx
       |       LATERAL VIEW explode(array($probes)) tm AS pm),
       |cand0 AS (
       |  SELECT DISTINCT qp.vec_id AS query_id, bb.vec_id AS neighbor_id
       |  FROM qp JOIN bb ON qp.band_idx = bb.band_idx AND qp.band_key = bb.band_key
       |  WHERE qp.vec_id <> bb.vec_id),
       |cand_ids AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT c0.query_id, c0.neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY c0.query_id
       |        ORDER BY bit_count(cq.code ^ cb.code) ASC, c0.neighbor_id ASC) AS BIGINT) AS crank
       |    FROM cand0 c0
       |    JOIN q cq ON cq.vec_id = c0.query_id
       |    JOIN codes cb ON cb.vec_id = c0.neighbor_id) rc
       |  WHERE crank <= $GatherCap),
       |cand AS (
       |  SELECT ci.query_id, ci.neighbor_id,
       |    ${sparkDot("q.embedding", "b.embedding")} / (q.nrm * b.nrm) AS score
       |  FROM cand_ids ci
       |  JOIN q ON q.vec_id = ci.query_id
       |  JOIN codes b ON b.vec_id = ci.neighbor_id
       |  WHERE bit_count(q.code ^ b.code) <= $ProbeRadius),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
       |  FROM cand)""".stripMargin
  }

  /** DuckDB oracle chain: the same candidate set spelled as the direct
    * Hamming predicate (independent of the probe mechanism), with the SAME
    * (distance, id)-ordered rank cap — see [[GatherCap]] for why the capped
    * sets coincide. */
  private val duckAnnCtes: String =
    s"""q AS (SELECT * FROM codes WHERE vec_id % $QueryStride = 0),
       |cand0 AS (
       |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    bit_count(xor(q.code, b.code)) AS hd
       |  FROM q JOIN codes b ON q.vec_id <> b.vec_id
       |    AND bit_count(xor(q.code, b.code)) <= $ProbeRadius),
       |cand_ids AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT c0.query_id, c0.neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY c0.query_id
       |        ORDER BY c0.hd ASC, c0.neighbor_id ASC) AS BIGINT) AS crank
       |    FROM cand0 c0) rc
       |  WHERE crank <= $GatherCap),
       |cand AS (
       |  SELECT ci.query_id, ci.neighbor_id,
       |    ${duckDot("q.embedding", "b.embedding")} / (q.nrm * b.nrm) AS score
       |  FROM cand_ids ci
       |  JOIN q ON q.vec_id = ci.query_id
       |  JOIN codes b ON b.vec_id = ci.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
       |  FROM cand)""".stripMargin

  private def annKnnSql(withCtes: String, annCtes: String): String =
    s"""WITH $withCtes,
       |$annCtes
       |SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  private val annKnnDuckSql = annKnnSql(duckWith, duckAnnCtes)

  /** O2 HashError as a query: per query point, how many of the exact top-k
    * (brute force, same tie rules as q_knn_cosine but k=TopK) the
    * multiprobe ANN recovered. The `exact` CTE is the brute-force
    * ground-truth baseline by design. */
  private def annRecallSql(withCtes: String, annCtes: String,
      dot: (String, String) => String): String =
    s"""WITH $withCtes,
       |$annCtes,
       |ann AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $TopK),
       |exact AS (SELECT query_id, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${dot("q.embedding", "b.embedding")} / (q.nrm * b.nrm) DESC,
       |      b.vec_id ASC) AS BIGINT) AS rank
       |  FROM q JOIN codes b ON q.vec_id <> b.vec_id) t
       |WHERE rank <= $TopK)
       |SELECT exact.query_id AS query_id, COUNT(ann.neighbor_id) AS hits, COUNT(*) AS k
       |FROM exact LEFT JOIN ann
       |  ON ann.query_id = exact.query_id AND ann.neighbor_id = exact.neighbor_id
       |GROUP BY exact.query_id ORDER BY query_id""".stripMargin

  private val annRecallDuckSql = annRecallSql(duckWith, duckAnnCtes, duckDot)

  /** Q6 — the instrumented query (`testQuery`,
    * `/root/reference/hashIndex/HashCollection.h:153-192`): the reference
    * preserves candidate DISCOVERY ORDER so recall-vs-candidate-budget
    * curves can be computed (`TestLSH.h:186-197`). The ball probe discovers
    * buckets in expanding Hamming order (P2), so discovery rank =
    * row_number over (hamming distance, id); recall@r = exact top-k hits
    * within the first r discovered candidates, per query × budget. */
  val CurveBudgets: Seq[Int] = Seq(1, 5, 10, 20)

  private def recallCurveSql(withCtes: String, annCtes: String,
      xor: (String, String) => String, dot: (String, String) => String,
      budgetsRel: String): String =
    s"""WITH $withCtes,
       |$annCtes,
       |disc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY
       |      bit_count(${xor("q.code", "b.code")}) ASC, c.neighbor_id ASC) AS BIGINT) AS drank
       |  FROM cand c
       |  JOIN q ON q.vec_id = c.query_id
       |  JOIN codes b ON b.vec_id = c.neighbor_id),
       |exact AS (SELECT query_id, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${dot("q.embedding", "b.embedding")} / (q.nrm * b.nrm) DESC,
       |      b.vec_id ASC) AS BIGINT) AS rank
       |  FROM q JOIN codes b ON q.vec_id <> b.vec_id) t
       |WHERE rank <= $TopK),
       |budgets AS ($budgetsRel)
       |SELECT exact.query_id AS query_id, budgets.r AS r,
       |  COUNT(disc.neighbor_id) AS hits, COUNT(*) AS k
       |FROM exact CROSS JOIN budgets
       |LEFT JOIN disc ON disc.query_id = exact.query_id
       |  AND disc.neighbor_id = exact.neighbor_id AND disc.drank <= budgets.r
       |GROUP BY exact.query_id, budgets.r ORDER BY query_id, r""".stripMargin

  private val budgetsList = CurveBudgets.mkString(", ")
  private val recallCurveDuckSql = recallCurveSql(duckWith, duckAnnCtes,
    (a, b) => s"xor($a, $b)", duckDot,
    s"SELECT CAST(unnest([$budgetsList]) AS BIGINT) AS r")

  /** Register the input table, then build the SQL — the materialized codes
    * view resolves against the freshly registered `embeddings`. */
  private def q(spark: SparkSession, dir: String)(mkSql: => String): DataFrame = {
    view(spark, dir, "embeddings")
    spark.sql(mkSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_hamming_knn" -> ((s, d) =>
      q(s, d)(annKnnSql(sparkWith(s, d), sparkAnnCtes))),
    "q_ann_recall" -> ((s, d) =>
      q(s, d)(annRecallSql(sparkWith(s, d), sparkAnnCtes, sparkDot))),
    "q_ann_recall_curve" -> ((s, d) =>
      q(s, d)(recallCurveSql(sparkWith(s, d), sparkAnnCtes,
        (a, b) => s"$a ^ $b", sparkDot,
        s"SELECT CAST(r AS BIGINT) AS r FROM (SELECT explode(array($budgetsList)) AS r)")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_ann_hamming_knn" -> annKnnDuckSql,
    "q_ann_recall" -> annRecallDuckSql,
    "q_ann_recall_curve" -> recallCurveDuckSql
  )
}
