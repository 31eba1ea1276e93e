package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import CrossSql.view

/** Relational sanity queries over the TPC-H-ish tables — the standard
  * operator checklist of SURVEY §2.8 (hash aggregate, broadcast equi-join,
  * rank window, sort/limit) exercised through the plain DataFrame API so
  * Catalyst's physical choices (broadcast vs shuffle join, partial
  * aggregation, WholeStageCodegen) are visible in `.explain`.
  *
  * Double-type columns are floored per row before summing: cross-engine sums
  * over BIGINT are order-insensitive, raw double sums are not.
  */
object RelQueries {

  /** Pricing-summary aggregate (hash agg with map-side partial combine). */
  private def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = view(spark, dir, "lineitem")
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        sum(floor(col("l_extendedprice"))).as("sum_price_floor"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Orders ⋈ customer (small dim → broadcast) ⋈ nation, grouped rollup. */
  private def qJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = view(spark, dir, "orders")
    val customer = view(spark, dir, "customer")
    val nation = view(spark, dir, "nation")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice"))).as("sum_price_floor"))
      .orderBy(col("n_name"), col("o_orderstatus"))
  }

  /** Latest event per user (rank window, Q8's top-k as row_number). */
  private def qWindowLatest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = view(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").asc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("latest_event_id"), col("event_type"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => q1Agg(s, d)),
    "q_join_agg" -> ((s, d) => qJoinAgg(s, d)),
    "q_window_latest" -> ((s, d) => qWindowLatest(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_price_floor, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_agg" ->
      """SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price_floor
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, o_orderstatus ORDER BY n_name, o_orderstatus""".stripMargin,
    "q_window_latest" ->
      """SELECT user_id, latest_event_id, event_type FROM (
        |  SELECT user_id, event_id AS latest_event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
        |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
