package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once materialization of the derived "index" tables the ANN/forest
  * read paths query repeatedly (the H1 sign-code tables).
  *
  * The reference separates index BUILD from QUERY (`HashCollection.h:66-107`
  * builds the hash tables once; `batchQuery` only probes them). The pure-CTE
  * SQL form lost that split on the Spark side: Catalyst INLINES every CTE
  * reference into its consumer, so one forest-kNN plan instantiated the
  * md5 sign-matrix cross join + the interpreted higher-order-function code
  * dot products 40 times (measured via PlanDump at sf0.1 — 40 FileScans of
  * the same parquet, 5.4 s for a 5k-row table). Materializing the code
  * table once per (session, input dir) restores build/query: queries scan
  * the cached index instead of rebuilding it under every CTE reference.
  *
  * At production scale this materialization is the bucketed codes table
  * you would write to distributed storage once per index build (operator
  * B1/B2); `persist` is the single-box analogue. The DuckDB oracles keep
  * the single-statement WITH form — DuckDB materializes multi-referenced
  * CTEs on its own — so cross-engine hash-match is unaffected: the view is
  * defined by the exact same SQL text the CTE previously held.
  */
object CodesCache {

  private final case class Entry(view: String, df: DataFrame)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), Entry]()

  /** Temp-view name of `sql` (over `dir`'s already-registered tables),
    * materialized once per (session, dir, name); later calls — including
    * from other query families in the same session — reuse the view. The
    * view name carries a dir hash so one session can hold several dirs'
    * indexes side by side.
    *
    * Materialization is an EAGER `localCheckpoint`, not `persist`: the
    * code expressions are higher-order-function folds whose lambda
    * variables defeat canonicalized plan matching, so the CacheManager
    * never substitutes an InMemoryRelation for view references (measured:
    * 0 substitutions with `persist`). The checkpoint truncates the view's
    * plan to a scan of the computed blocks — references CANNOT re-expand
    * into a rebuild. Blocks are storage-level MEMORY_AND_DISK and die
    * with the session. */
  def materialize(spark: SparkSession, dir: String, name: String, sql: String): String = {
    evictStopped()
    cache.computeIfAbsent((spark, dir, name), _ => {
      val viewName = s"${name}_${java.lang.Integer.toHexString(dir.hashCode)}"
      val df = spark.sql(sql).localCheckpoint(true)
      df.createOrReplaceTempView(viewName)
      Entry(viewName, df)
    }).view
  }

  /** Drop entries of stopped sessions (their storage blocks died with the
    * session; only the map entry leaks otherwise — same lifecycle policy
    * as ClipQueries' pipeline cache). */
  private def evictStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    }
  }
}
