package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-stream analytics executed in batch — the batch analogs of the
  * streaming surface the reference delegates to Flink: tumbling windows
  * (docs-site/ai-generation.md:272 TUMBLE TVF), dedup (`is_duplicate` in the
  * reference's mock pipeline internal/llm/service.go:1064), JSON field
  * extraction, and an as-of join (SURVEY.md §2.B join matrix).
  *
  * The same logic runs in Structured Streaming via graft.streaming — these
  * batch forms are the oracle-checkable instantiation.
  */
object Events extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, QFn] = Map(
    // -- Q20: tumbling 1-hour window aggregation (batch analog of
    //    groupBy(window($"ts","1 hour")) in streaming)
    "q20_tumble_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
             round(sum(dec2(col("value"))), 4).cast("double").as("sum_value"))
        .select(
          col("window.start").cast("long").as("win_start"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // -- Q21: exact dedup — earliest event per (user_id, event_type); the
    //    batch form of dropDuplicates/dropDuplicatesWithinWatermark
    "q21_dedup_first" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
                col("event_id").as("first_event_id"), col("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // -- Q34: sliding (HOP) window batch analog — every event lands in
    //    size/slide = 2 overlapping windows (streaming form:
    //    graft.streaming.Windows.hop)
    "q34_hop_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
             round(sum(dec2(col("value"))), 4).cast("double").as("sum_value"))
        .select(col("window.start").cast("long").as("win_start"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // -- Q35: session window batch analog (30-min gap, per user); the
    //    oracle derives identical sessions with gaps-and-islands SQL.
    //    Merge rule matches Spark: strict `diff < gap` (window end is
    //    exclusive).
    "q35_session_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("session_window.start").cast("long").as("session_start"),
          col("session_window.end").cast("long").as("session_end"),
          col("user_id"), col("cnt"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // -- Q22: JSON field extraction from the props payload column
    "q22_json_extract" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy(col("event_id"))
    }),

    // -- Q36: schema-full JSON parse + re-serialize (from_json/to_json —
    //    the structured side of the JSON format surface; q22 covers the
    //    path-extraction side)
    "q36_from_json" -> ((s, dir) => {
      val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")
      Tables(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), schema).as("p"))
        .select(col("event_id"), col("p.k").as("k"),
          to_json(struct(col("p.k").as("k"))).as("rejson"))
        .orderBy(col("event_id"))
    }),

    // -- as-of join: for each purchase, the latest click by the same user at
    //    or before the purchase. Implemented with one window pass (union
    //    trick): single shuffle on user_id, no range-join explosion — this
    //    shape survives 100 TB because state per user is one running value.
    "q26_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("click_id"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q20_tumble_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    "q21_dedup_first" ->
      """SELECT user_id, event_type, event_id AS first_event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q34_hop_window" ->
      """WITH hopped AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
        |    time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) - k.off * INTERVAL '1 hour' AS w_start
        |  FROM events CROSS JOIN (VALUES (0), (1)) AS k(off))
        |SELECT CAST(epoch(w_start) AS BIGINT) AS win_start, event_type,
        |  COUNT(*) AS cnt, CAST(ROUND(SUM(v), 4) AS DOUBLE) AS sum_value
        |FROM hopped GROUP BY w_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "q35_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |l AS (SELECT user_id, ts,
        |  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL '30 minutes'
        |       THEN 0 ELSE 1 END AS brk
        |  FROM e),
        |g AS (SELECT user_id, ts,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM l)
        |SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |  CAST(FLOOR(epoch(MAX(ts) + INTERVAL '30 minutes')) AS BIGINT) AS session_end,
        |  user_id, COUNT(*) AS cnt
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q22_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q36_from_json" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  '{"k":' || CAST(json_extract(props, '$.k') AS BIGINT) || '}' AS rejson
        |FROM events ORDER BY event_id""".stripMargin,

    "q26_asof_join" ->
      """SELECT event_id, user_id, click_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin
  )
}
