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
  * B1/B2). Two single-box analogues, selected by `GRAFT_INDEX_DIR`:
  *
  *  - default (unset): eager `localCheckpoint` — MEMORY_AND_DISK blocks
  *    with TRUNCATED lineage. **Fault model, stated plainly:** on a real
  *    cluster, losing an executor mid-session destroys that executor's
  *    blocks and, because the lineage is gone, every query over the view
  *    fails permanently (no recompute path) until the index is rebuilt in
  *    a new session. That is acceptable for the single-JVM sandbox (the
  *    "executor" dying means the whole session died) and for ephemeral
  *    benchmark sessions, NOT for long-lived production sessions.
  *  - `GRAFT_INDEX_DIR=<dir>`: the production shape — the relation is
  *    written ONCE as parquet under `<dir>/<view name>` and the view reads
  *    the files. Executor loss costs a re-scan of storage, never a rebuild
  *    or a dead view; the files also outlive the session, which is exactly
  *    the reference's persisted index the `saveTable` stubs never
  *    implemented (`StdHashIndex.h:189-192`).
  *
  * The DuckDB oracles keep the single-statement WITH form — DuckDB
  * materializes multi-referenced CTEs on its own — so cross-engine
  * hash-match is unaffected: the view is defined by the exact same SQL
  * text the CTE previously held.
  *
  * Static-input assumption (documented contract): a (session, dir, name)
  * entry is built once and never invalidated — rewriting the parquet under
  * `dir` mid-session serves the OLD index, exactly as the reference's
  * built hash tables do not track mutations of the base data. Use a new
  * session (or a new dir) for new data.
  */
object CodesCache {

  private final case class Entry(view: String, df: DataFrame)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), Entry]()

  /** Collision-resistant dir tag for view names: 16 hex chars of SHA-256.
    * (32-bit String.hashCode collides birthday-style across a few tens of
    * thousands of dirs — and a collision would silently serve one dir's
    * index for another, since createOrReplaceTempView overwrites.) */
  private def dirTag(dir: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Temp-view name of `sql` (over `dir`'s already-registered tables),
    * materialized once per (session, dir, name); later calls — including
    * from other query families in the same session — reuse the view. The
    * view name carries a dir digest so one session can hold several dirs'
    * indexes side by side.
    *
    * Materialization is an EAGER `localCheckpoint` (or a parquet write
    * when `GRAFT_INDEX_DIR` is set — see class doc for the fault-model
    * trade), not `persist`: the code expressions are higher-order-function
    * folds whose lambda variables defeat canonicalized plan matching, so
    * the CacheManager never substitutes an InMemoryRelation for view
    * references (measured: 0 substitutions with `persist`). The checkpoint
    * truncates the view's plan to a scan of the computed blocks —
    * references CANNOT re-expand into a rebuild. */
  def materialize(spark: SparkSession, dir: String, name: String, sql: String): String = {
    evictStopped()
    cache.computeIfAbsent((spark, dir, name), _ => {
      val viewName = s"${name}_${dirTag(dir)}"
      // env for deployments; -Dgraft.index.dir for in-JVM callers (tests)
      val df = sys.props.get("graft.index.dir").orElse(sys.env.get("GRAFT_INDEX_DIR")) match {
        case Some(root) =>
          // production spill path: build once to storage, query the files.
          // Re-tighten array-element nullability from the query's OWN
          // schema (analysis-only, cheap): the parquet reader widens
          // elements to nullable, which downstream native kernels reject
          // at analysis time.
          val target = s"$root/$viewName"
          val fs = new java.io.File(target)
          val planned = spark.sql(sql)
          if (!fs.isDirectory || !new java.io.File(fs, "_SUCCESS").isFile)
            planned.write.mode("overwrite").parquet(target)
          graft.functions.SchemaAsserts.tightenArrays(
            spark.read.parquet(target), planned.schema)
        case None =>
          spark.sql(sql).localCheckpoint(true)
      }
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
