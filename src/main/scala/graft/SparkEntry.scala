package graft

import graft.queries.{AnnQueries, ClipQueries, DocQueries, EmbedQueries, ForestQueries, KernelQueries, RelQueries, TransformQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator surface of the engine (SURVEY §2 inventory +
  * the web-scale training-data ops); `oracleSql` carries a DuckDB-runnable
  * equivalent wherever the semantics are ANSI-SQL-expressible (shared
  * md5-based hash family, ordered double folds, integer-only outputs —
  * see [[graft.queries.CrossSql]]). Kernel-only ops (WAV decode, seeded
  * MinHash/SimHash pipeline) are rows-only here and oracle-checked in
  * `sbt test` against [[graft.oracle.RefOracle]].
  */
object SparkEntry {

  /** Flagship: LSH near-duplicate detection over `documents` —
    * shingle → MinHash → band → candidate pairs → exact-Jaccard verify
    * (the reference's hash→probe→verify read path as one query). */
  def entry(spark: SparkSession): DataFrame =
    DocQueries.queries("q_near_dup_pairs")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DocQueries.queries ++ EmbedQueries.queries ++ AnnQueries.queries ++
      RelQueries.queries ++ ClipQueries.queries ++ TransformQueries.queries ++
      KernelQueries.queries ++ ForestQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    DocQueries.oracleSql ++ EmbedQueries.oracleSql ++ AnnQueries.oracleSql ++
      RelQueries.oracleSql ++ ClipQueries.oracleSql ++ TransformQueries.oracleSql ++
      KernelQueries.oracleSql ++ ForestQueries.oracleSql
}
