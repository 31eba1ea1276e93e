package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import CrossSql._

/** Embedding-family queries over `embeddings(vec_id, embedding float[64],
  * label)` — the dense-vector half of the reference re-expressed relationally:
  *
  *  - q_knn_cosine / q_knn_l2: the reference's `batchQuery` public API
  *    (operator Q5, `/root/reference/hashIndex/HashCollection.h:232-295`):
  *    query set × base set, exact distance (Q7), per-query top-k (Q8 as a
  *    rank window instead of the bounded heap).
  *  - q_ann_codes: H1 RandomProjection sign codes (SimHash over the dense
  *    space, `/root/reference/hashFunction/RandomProjectionHashFunction.h:47-53`)
  *    with a cross-engine ±1 projection derived from md5 parity — the
  *    SQL-checkable analogue of the seeded Gaussian kernel.
  *  - q_ann_buckets: B1 bucket directory (code → member count) as a groupBy.
  *
  * Float determinism contract: every dot product is computed as an ordered
  * left-to-right fold over double-cast elements — both dialects spell the
  * identical reduction, so doubles match bit-for-bit and rank windows agree.
  */
object EmbedQueries {

  val Dim = 64
  val TopK = 10
  val QueryStride = 25 // vec_id % stride == 0 → query point
  val CodeBits = 16

  /** Ordered double dot product of two FLOAT[] columns, Spark dialect. */
  private def sparkDot(a: String, b: String): String =
    s"aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) -> acc + CAST(element_at($a, i) AS DOUBLE) * CAST(element_at($b, i) AS DOUBLE))"

  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def knnSql(scoreOf: String, asc: Boolean, normExpr: String = ""): String = {
    val ord = if (asc) "ASC" else "DESC"
    val base =
      if (normExpr.isEmpty) "SELECT vec_id, embedding FROM embeddings"
      // norms precomputed once per vector (identical double fold → identical
      // value as recomputing per pair, at 1/|B| the cost)
      else s"SELECT vec_id, embedding, sqrt($normExpr) AS nrm FROM embeddings"
    s"""WITH base AS ($base),
       |q AS (SELECT * FROM base WHERE vec_id % $QueryStride = 0),
       |scored AS (
       |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, $scoreOf AS score
       |  FROM q JOIN base b ON q.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score $ord, neighbor_id ASC) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  private val knnCosSparkSql = knnSql(
    s"${sparkDot("q.embedding", "b.embedding")} / (q.nrm * b.nrm)",
    asc = false, normExpr = sparkDot("embedding", "embedding"))
  private val knnCosDuckSql = knnSql(
    s"${duckDot("q.embedding", "b.embedding")} / (q.nrm * b.nrm)",
    asc = false, normExpr = duckDot("embedding", "embedding"))

  private def sparkDist2(a: String, b: String): String =
    s"aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) -> acc + (CAST(element_at($a, i) AS DOUBLE) - CAST(element_at($b, i) AS DOUBLE)) * (CAST(element_at($a, i) AS DOUBLE) - CAST(element_at($b, i) AS DOUBLE)))"
  private def duckDist2(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  private val knnL2SparkSql = knnSql(sparkDist2("q.embedding", "b.embedding"), asc = true)
  private val knnL2DuckSql = knnSql(duckDist2("q.embedding", "b.embedding"), asc = true)

  private val normsSparkSql =
    s"""SELECT vec_id, CAST(floor(1000000 * sqrt(${sparkDot("embedding", "embedding")})) AS BIGINT) AS norm_x1e6
       |FROM embeddings ORDER BY vec_id""".stripMargin
  private val normsDuckSql =
    s"""SELECT vec_id, CAST(floor(1000000 * sqrt(${duckDot("embedding", "embedding")})) AS BIGINT) AS norm_x1e6
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Signed projection of row b against the hoisted sign matrix `m`
    * ([[CrossSql.sparkSgnCte]], tag "rp"): the H1 bit dot product as an
    * ordered fold — identical values to deriving each ±1 inline, but the
    * md5 family is evaluated once per query instead of once per row. */
  private[queries] def sparkBitDot(b: Int): String =
    s"aggregate(sequence(1, $Dim), CAST(0 AS DOUBLE), (acc, i) -> acc + element_at(element_at(m, ${b + 1}), i) * CAST(element_at(embedding, i) AS DOUBLE))"
  private[queries] def duckBitDot(b: Int): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> m[${b + 1}][i] * CAST(embedding[i] AS DOUBLE)))"

  /** H6 bit packing of the CodeBits sign bits as a SQL sum of powers of 2. */
  private[queries] def codeExpr(dotTerm: Int => String): String =
    (0 until CodeBits)
      .map(b => s"CASE WHEN ${dotTerm(b)} > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")

  private def annCodesSql(sgnCte: String, dotTerm: Int => String): String =
    s"""WITH $sgnCte
       |SELECT vec_id, CAST(${codeExpr(dotTerm)} AS BIGINT) AS code
       |FROM embeddings CROSS JOIN sgn ORDER BY vec_id""".stripMargin

  private val annCodesSparkSql = annCodesSql(sparkSgnCte("rp", CodeBits, Dim), sparkBitDot)
  private val annCodesDuckSql = annCodesSql(duckSgnCte("rp", CodeBits, Dim), duckBitDot)

  private def annBucketsSql(sgnCte: String, dotTerm: Int => String): String =
    s"""WITH $sgnCte,
       |codes AS (SELECT vec_id, CAST(${codeExpr(dotTerm)} AS BIGINT) AS code FROM embeddings CROSS JOIN sgn)
       |SELECT code, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
       |FROM codes GROUP BY code ORDER BY code""".stripMargin

  private def q(spark: SparkSession, dir: String, sql: String): DataFrame = {
    view(spark, dir, "embeddings")
    spark.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_norms" -> ((s, d) => q(s, d, normsSparkSql)),
    "q_knn_cosine" -> ((s, d) => q(s, d, knnCosSparkSql)),
    "q_knn_l2" -> ((s, d) => q(s, d, knnL2SparkSql)),
    "q_ann_codes" -> ((s, d) => q(s, d, annCodesSparkSql)),
    "q_ann_buckets" -> ((s, d) => q(s, d, annBucketsSql(sparkSgnCte("rp", CodeBits, Dim), sparkBitDot)))
  )

  val oracleSql: Map[String, String] = Map(
    "q_embed_norms" -> normsDuckSql,
    "q_knn_cosine" -> knnCosDuckSql,
    "q_knn_l2" -> knnL2DuckSql,
    "q_ann_codes" -> annCodesDuckSql,
    "q_ann_buckets" -> annBucketsSql(duckSgnCte("rp", CodeBits, Dim), duckBitDot)
  )
}
