package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SparkSpec

/** Golden-output suites for the streaming semantics that the DuckDB
  * oracle cannot check (SURVEY.md §5.2): watermark late-data drop,
  * session-window merging, dedup-within-watermark, output modes, and
  * bounded AvailableNow completion.
  */
class StreamingGoldenSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$second%02d")

  private def startMemorySink(df: DataFrame, name: String, mode: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  test("tumbling window with watermark drops late data (append mode)") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = Windows.flatten(
      Windows.tumble(
        StreamOps.withEventTime(in.toDF().toDF("ts", "k", "v"), "ts", "5 minutes"),
        "ts", "10 minutes")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v")))
    val q = startMemorySink(agg, "tumble_golden", "append")
    try {
      // window [10:00,10:10): 2 rows; then advance watermark beyond 10:15
      in.addData((ts(1), "a", 1.0), (ts(4), "b", 2.0))
      q.processAllAvailable()
      in.addData((ts(21), "c", 4.0)) // watermark -> 10:16, finalizes [10:00,10:10)
      q.processAllAvailable()
      // LATE: belongs to the already-finalized window -> dropped
      in.addData((ts(3), "late", 100.0))
      q.processAllAvailable()
      // close [10:20,10:30) too
      in.addData((ts(40), "d", 8.0))
      q.processAllAvailable()
      val rows = sp.table("tumble_golden")
        .select(col("window_start").cast("string"), col("cnt"), col("sum_v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(
        ("2026-01-01 10:00:00", 2L, 3.0),   // late row NOT included
        ("2026-01-01 10:20:00", 1L, 4.0)))
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val agg = Windows.flatten(
      Windows.session(
        StreamOps.withEventTime(in.toDF().toDF("ts", "user"), "ts", "0 seconds"),
        "ts", "15 seconds", col("user"))
      .agg(count(lit(1)).as("cnt")))
    val q = startMemorySink(agg, "session_golden", "append")
    try {
      // u1: 10:00:00, 10:00:10 (gap 10s -> merge), 10:00:40 (gap 30s -> new)
      in.addData((ts(0, 0), "u1"), (ts(0, 10), "u1"), (ts(0, 40), "u1"))
      q.processAllAvailable()
      in.addData((ts(5, 0), "u1")) // advance watermark, finalize sessions
      q.processAllAvailable()
      in.addData((ts(9, 0), "u1"))
      q.processAllAvailable()
      val rows = sp.table("session_golden")
        .select(col("window_start").cast("string"), col("window_end").cast("string"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2026-01-01 10:00:00", "2026-01-01 10:00:25", 2L)),
        s"merged session missing: $rows")
      assert(rows.contains(("2026-01-01 10:00:40", "2026-01-01 10:00:55", 1L)),
        s"singleton session missing: $rows")
    } finally q.stop()
  }

  test("dynamic-gap session windows honor the per-row gap in streaming mode") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String, String)]
    // premium users tolerate a 60s gap, others 10s
    val gap = when(col("tier") === "premium", lit("60 seconds")).otherwise(lit("10 seconds"))
    val agg = Windows.flatten(
      Windows.sessionDynamic(
        StreamOps.withEventTime(in.toDF().toDF("ts", "user", "tier"), "ts", "0 seconds"),
        "ts", gap, col("user"))
      .agg(count(lit(1)).as("cnt")))
    val q = startMemorySink(agg, "dynsession_golden", "append")
    try {
      // both users emit at :00 and :30. premium (60s gap) merges into one
      // session; standard (10s gap) splits into two singletons.
      in.addData((ts(0, 0), "p", "premium"), (ts(0, 30), "p", "premium"),
        (ts(0, 0), "s", "standard"), (ts(0, 30), "s", "standard"))
      q.processAllAvailable()
      in.addData((ts(10, 0), "x", "standard")) // advance watermark, finalize
      q.processAllAvailable()
      in.addData((ts(11, 0), "x", "standard"))
      q.processAllAvailable()
      val rows = sp.table("dynsession_golden")
        .select(col("window_start").cast("string"), col("window_end").cast("string"), col("cnt"))
        .where(col("window_start").cast("string").startsWith("2026-01-01 10:0"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2026-01-01 10:00:00", "2026-01-01 10:01:30", 2L)),
        s"premium 60s-gap session should merge :00 and :30: $rows")
      assert(rows.contains(("2026-01-01 10:00:00", "2026-01-01 10:00:10", 1L)) &&
        rows.contains(("2026-01-01 10:00:30", "2026-01-01 10:00:40", 1L)),
        s"standard 10s-gap sessions should stay split: $rows")
    } finally q.stop()
  }

  test("late side output captures exactly the rows a stateful operator would drop") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val onTime = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val late = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    def drain(df: DataFrame, sink: java.util.concurrent.ConcurrentLinkedQueue[(String, String)]): Unit =
      df.select(col("ts").cast("string"), col("k")).collect()
        .foreach(r => sink.add((r.getString(0), r.getString(1))))
    val writer = StreamOps.lateSideOutput(
        in.toDF().toDF("ts", "k"), "ts", delayMs = 5 * 60 * 1000L) {
      (df, _) => drain(df, onTime)
    } {
      (df, _) => drain(df, late)
    }
    val q = writer.start()
    try {
      in.addData((ts(1), "a"), (ts(4), "b"))
      q.processAllAvailable() // watermark after batch: 10:04 - 5min = 09:59
      in.addData((ts(21), "c")) // on time vs 09:59; watermark -> 10:16
      q.processAllAvailable()
      in.addData((ts(3), "late1"), (ts(30), "d")) // 10:03 < 10:16 -> late
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(late.asScala.toSet == Set(("2026-01-01 10:03:00", "late1")))
      assert(onTime.asScala.map(_._2).toSet == Set("a", "b", "c", "d"))
    } finally q.stop()
  }

  test("hop (sliding) windows assign events to every overlapping window") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(Timestamp, Double)]
    val agg = Windows.flatten(
      Windows.hop(in.toDF().toDF("ts", "v"), "ts", "10 minutes", "5 minutes")
        .agg(count(lit(1)).as("cnt")))
    val q = startMemorySink(agg, "hop_golden", "complete")
    try {
      in.addData((ts(7), 1.0)) // falls in [10:00,10:10) and [10:05,10:15)
      q.processAllAvailable()
      val rows = sp.table("hop_golden")
        .select(col("window_start").cast("string"))
        .collect().map(_.getString(0)).toSet
      assert(rows == Set("2026-01-01 10:00:00", "2026-01-01 10:05:00"))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes dups inside the delay") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String, String)]
    val dedup = StreamOps.dedupWithinWatermark(
      StreamOps.withEventTime(in.toDF().toDF("ts", "event_id", "payload"), "ts", "10 minutes"),
      Seq("event_id"))
    val q = startMemorySink(dedup, "dedup_golden", "append")
    try {
      in.addData((ts(0), "e1", "first"), (ts(1), "e1", "dup"), (ts(2), "e2", "x"))
      q.processAllAvailable()
      in.addData((ts(3), "e1", "dup2"), (ts(4), "e3", "y"))
      q.processAllAvailable()
      val rows = sp.table("dedup_golden")
        .select(col("event_id"), col("payload"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("e1", "first"), ("e2", "x"), ("e3", "y")))
    } finally q.stop()
  }

  test("output mode complete re-emits full running aggregates") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(String, Int)]
    val agg = in.toDF().toDF("k", "v").groupBy(col("k")).agg(sum(col("v")).as("total"))
    val q = startMemorySink(agg, "complete_golden", "complete")
    try {
      in.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      in.addData(("a", 10))
      q.processAllAvailable()
      val rows = sp.table("complete_golden")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("a", 11L), ("b", 2L)))
    } finally q.stop()
  }

  test("stream-static lookup join enriches the stream without shuffle of the stream") {
    val sp = spark
    import sp.implicits._
    val dim = Seq((1, "gold"), (2, "silver")).toDF("tier_id", "tier")
    val in = MemoryStream[(String, Int)]
    val joined = StreamOps.lookupJoin(in.toDF().toDF("user", "tier_id"), dim, Seq("tier_id"))
    val q = startMemorySink(joined, "lookup_golden", "append")
    try {
      in.addData(("u1", 1), ("u2", 2), ("u3", 3))
      q.processAllAvailable()
      val rows = sp.table("lookup_golden")
        .select(col("user"), col("tier"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("u1", "gold"), ("u2", "silver"))) // u3 has no tier -> inner drop
    } finally q.stop()
  }

  test("expected-count stop: continuous query stops at the target count") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[Int]
    val q = in.toDF().writeStream.format("memory").queryName("expected_count")
      .outputMode("append").trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      in.addData(1 to 30: _*)
      in.addData(31 to 60: _*)
      val (outcome, n) = BoundedRun.awaitExpectedCount(sp, q, expected = 60,
        noProgressTimeoutMs = 20000)
      assert(outcome == BoundedRun.ReachedExpected)
      assert(n >= 60)
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()
  }

  test("no-progress timeout stops an idle query (consumer 30s analog)") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[Int]
    val q = in.toDF().writeStream.format("memory").queryName("idle_stop")
      .outputMode("append").trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      in.addData(1, 2, 3)
      val (outcome, n) = BoundedRun.awaitExpectedCount(sp, q, expected = 100,
        noProgressTimeoutMs = 1500)
      assert(outcome == BoundedRun.NoProgressTimeout)
      assert(n == 3)
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()
  }
}
