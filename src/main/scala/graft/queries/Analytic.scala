package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** OVER-window analytics, sorts and limits — the analytic surface the
  * reference's docs advertise (latency percentiles docs-site/dashboard.md:84,
  * leaderboards/top-k docs-site/examples.md).
  *
  * Scale notes: window functions shuffle once on partitionBy keys and sort
  * within partitions — per-customer/per-user partitions are small and evenly
  * distributed, so this holds at 100 TB (no global sort). Top-k via
  * orderBy+limit compiles to TakeOrderedAndProject (per-partition heap +
  * driver merge of k rows, not a full sort).
  */
object Analytic extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, QFn] = Map(
    // -- Q13: ranking — top-3 orders per customer (deterministic tie-break)
    "q13_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // -- Q14: running aggregate with an explicit ROWS frame
    "q14_window_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // -- Q15: LAG — per-user delta of value over event time
    "q15_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(
          col("user_id"), col("event_id"),
          round(col("value") - lag(col("value"), 1).over(w), 4).as("delta"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // -- Q16: global top-k (TakeOrderedAndProject — no full sort at scale)
    "q16_top_k" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))), 4)
            .cast("double").as("net"))
        .orderBy(col("net").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    }),

    // -- percentiles (docs-site/dashboard.md:84 P50/P95/P99)
    "q25_percentiles" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)"), 4).as("p50"),
          round(expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY value)"), 4).as("p95"),
          round(expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY value)"), 4).as("p99"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q13_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q14_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q15_window_lag" ->
      """SELECT user_id, event_id,
        |  ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id), 4) AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q16_top_k" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))), 4) AS DOUBLE) AS net
        |FROM lineitem ORDER BY net DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,

    "q25_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |  ROUND(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
