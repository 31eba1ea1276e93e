package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import CrossSql._

/** The reference's production read path (`batchQuery`, operator Q5,
  * `/root/reference/hashIndex/HashCollection.h:232-295`) re-expressed
  * end-to-end as one relational query over `embeddings`, cross-engine
  * checkable:
  *
  *   1. hash queries + base with the H1 sign-projection code (q_ann_codes'
  *      md5-parity projection);
  *   2. candidate gather = Hamming-ball probe: candidates within Hamming
  *      radius `ProbeRadius` of the query code (operators Q1/Q2's
  *      `code ^ mask` bucket probes, expressed as the equivalent
  *      bit_count(xor) ≤ r predicate; P1/P2 enumerate the same ball);
  *   3. exact re-rank by cosine (Q7) + per-query top-k rank window (Q8).
  *
  * q_ann_recall then scores the ANN result against the brute-force kNN —
  * the HashError evaluation operator (O2,
  * `/root/reference/hashBitOptimizers/HashError.h:29-83`) as a query:
  * per-query hit count at k, all-integer outputs.
  */
object AnnQueries {

  val Dim = EmbedQueries.Dim
  val TopK = 5
  val ProbeRadius = 6 // of CodeBits=16
  val QueryStride = EmbedQueries.QueryStride

  private def sparkDot(a: String, b: String): String =
    s"aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) -> acc + CAST(element_at($a, i) AS DOUBLE) * CAST(element_at($b, i) AS DOUBLE))"
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def sparkSgn(b: Int): String =
    s"CASE WHEN (${sparkH60(s"concat('rp', '$b', '_', CAST(i AS STRING))")} & 1) = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END"
  private def duckSgn(b: Int): String =
    s"CASE WHEN (${duckH60(s"concat('rp', '$b', '_', CAST(i AS VARCHAR))")} & 1) = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END"

  private def codesCte(codeTerm: Int => String, normExpr: String): String = {
    val code = (0 until EmbedQueries.CodeBits)
      .map(b => s"CASE WHEN ${codeTerm(b)} > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    // per-vector norm precomputed once (identical double fold as per-pair)
    s"codes AS (SELECT vec_id, embedding, sqrt($normExpr) AS nrm, CAST($code AS BIGINT) AS code FROM embeddings)"
  }

  private val sparkCodes = codesCte(b =>
    s"aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) -> acc + ${sparkSgn(b)} * CAST(element_at(embedding, i) AS DOUBLE))",
    sparkDot("embedding", "embedding"))
  private val duckCodes = codesCte(b =>
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> ${duckSgn(b)} * CAST(embedding[i] AS DOUBLE)))",
    duckDot("embedding", "embedding"))

  /** Shared CTE chain on top of `codes`: probe candidates → ranked ANN. */
  private def annCtes(xor: (String, String) => String,
      dot: (String, String) => String): String =
    s"""q AS (SELECT * FROM codes WHERE vec_id % $QueryStride = 0),
       |cand AS (
       |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dot("q.embedding", "b.embedding")} / (q.nrm * b.nrm) AS score
       |  FROM q JOIN codes b ON q.vec_id <> b.vec_id
       |    AND bit_count(${xor("q.code", "b.code")}) <= $ProbeRadius),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
       |  FROM cand)""".stripMargin

  private def annKnnSql(codes: String, xor: (String, String) => String,
      dot: (String, String) => String): String =
    s"""WITH $codes,
       |${annCtes(xor, dot)}
       |SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  private val annKnnSparkSql = annKnnSql(sparkCodes, (a, b) => s"$a ^ $b", sparkDot)
  private val annKnnDuckSql = annKnnSql(duckCodes, (a, b) => s"xor($a, $b)", duckDot)

  /** O2 HashError as a query: per query point, how many of the exact top-k
    * (brute force, same tie rules as q_knn_cosine but k=TopK) the
    * Hamming-probe ANN recovered. */
  private def annRecallSql(codes: String, xor: (String, String) => String,
      dot: (String, String) => String): String =
    s"""WITH $codes,
       |${annCtes(xor, dot)},
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

  private val annRecallSparkSql = annRecallSql(sparkCodes, (a, b) => s"$a ^ $b", sparkDot)
  private val annRecallDuckSql = annRecallSql(duckCodes, (a, b) => s"xor($a, $b)", duckDot)

  private def q(spark: SparkSession, dir: String, sql: String): DataFrame = {
    view(spark, dir, "embeddings")
    spark.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_hamming_knn" -> ((s, d) => q(s, d, annKnnSparkSql)),
    "q_ann_recall" -> ((s, d) => q(s, d, annRecallSparkSql))
  )

  val oracleSql: Map[String, String] = Map(
    "q_ann_hamming_knn" -> annKnnDuckSql,
    "q_ann_recall" -> annRecallDuckSql
  )
}
