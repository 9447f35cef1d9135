package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StatefulSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$second%02d")

  test("flatMapGroupsWithState session tracker: running updates, watermark-driven close") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[Stateful.Event]
    val out = Stateful.sessionTracker(in.toDS(), idleTimeoutMs = 60000)
    val q = out.toDF().writeStream.format("memory").queryName("session_state")
      .outputMode("update").start()
    try {
      in.addData(Stateful.Event("u1", ts(0, 0), 10.0), Stateful.Event("u1", ts(0, 5), 5.0),
        Stateful.Event("u2", ts(0, 2), 1.0))
      q.processAllAvailable()
      in.addData(Stateful.Event("u1", ts(0, 30), 2.5))
      q.processAllAvailable()
      // far-future event advances the watermark past every idle deadline →
      // u1/u2 sessions close and their state is evicted
      in.addData(Stateful.Event("u3", ts(30, 0), 0.0))
      q.processAllAvailable()
      in.addData(Stateful.Event("u3", ts(31, 0), 0.0)) // extra batch so timeouts fire
      q.processAllAvailable()
      val rows = sp.table("session_state")
        .select(col("user"), col("events"), col("total"), col("closed"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
      // running updates: batch 1: u1 (2 events, 15.0), u2 (1, 1.0); batch 2: u1 (3, 17.5)
      assert(rows.contains(("u1", 2L, 15.0, false)))
      assert(rows.contains(("u2", 1L, 1.0, false)))
      assert(rows.contains(("u1", 3L, 17.5, false)))
      // watermark-driven closes
      assert(rows.contains(("u1", 3L, 17.5, true)))
      assert(rows.contains(("u2", 1L, 1.0, true)))
    } finally q.stop()
  }

  test("transformWithState top-k tracker: composite state, timers, RocksDB provider") {
    val sp = spark
    import sp.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(providerKey)
    // transformWithState requires the RocksDB provider (Spark enforces it)
    sp.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Stateful.Event]
    val out = Stateful.topKTracker(in.toDS(), k = 3, idleTimeoutMs = 60000)
    val q = out.toDF().writeStream.format("memory").queryName("topk_state")
      .outputMode("update").start()
    try {
      in.addData(Stateful.Event("u1", ts(0, 0), 10.0), Stateful.Event("u1", ts(0, 5), 5.0),
        Stateful.Event("u1", ts(0, 10), 7.0), Stateful.Event("u1", ts(0, 15), 20.0),
        Stateful.Event("u2", ts(0, 2), 1.0))
      q.processAllAvailable()
      in.addData(Stateful.Event("u1", ts(0, 30), 15.0))
      q.processAllAvailable()
      // far-future event advances the watermark past both idle deadlines;
      // one extra batch so the timers actually fire
      in.addData(Stateful.Event("u3", ts(30, 0), 0.0))
      q.processAllAvailable()
      in.addData(Stateful.Event("u3", ts(31, 0), 0.0))
      q.processAllAvailable()
      val rows = sp.table("topk_state")
        .collect().map(r => (r.getString(0), r.getSeq[Double](1).toList, r.getBoolean(2))).toSet
      // running updates: ListState top-3 survives across batches
      assert(rows.contains(("u1", List(20.0, 10.0, 7.0), false)))
      assert(rows.contains(("u1", List(20.0, 15.0, 10.0), false)))
      assert(rows.contains(("u2", List(1.0), false)))
      // timer-driven closes with state eviction
      assert(rows.contains(("u1", List(20.0, 15.0, 10.0), true)))
      assert(rows.contains(("u2", List(1.0), true)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => sp.conf.set(providerKey, v)
        case None    => sp.conf.unset(providerKey)
      }
    }
  }

  test("stream-stream interval join matches rows within the time range only") {
    val sp = spark
    import sp.implicits._
    val clicks = MemoryStream[(Timestamp, String, String)]
    val buys = MemoryStream[(Timestamp, String, String)]
    val joined = Stateful.intervalJoin(
      clicks.toDF().toDF("cts", "user", "click_id"), "cts", "1 minute",
      buys.toDF().toDF("bts", "user2", "buy_id").withColumnRenamed("user2", "user"),
      "bts", "1 minute", "user", rangeMs = 120000)
      .select(col("click_id"), col("buy_id"))
    val q = joined.writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      clicks.addData((ts(0, 0), "u1", "c1"), (ts(10, 0), "u1", "c2"), (ts(0, 0), "u2", "c3"))
      buys.addData((ts(1, 0), "u1", "b1"),  // 60s after c1: in range of c1 only
        (ts(30, 0), "u2", "b2"))            // 30min after c3: out of range
      q.processAllAvailable()
      val rows = sp.table("interval_join")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("c1", "b1")))
    } finally q.stop()
  }

  test("intervalJoin honors sub-second ranges (rangeMs is not truncated to seconds)") {
    val sp = spark
    import sp.implicits._
    val clicks = MemoryStream[(Timestamp, String, String)]
    val buys = MemoryStream[(Timestamp, String, String)]
    // 1500 ms range: a buy 1.2 s after the click is IN range; the old
    // `rangeMs / 1000 SECONDS` truncation made this a 1 s range and
    // silently dropped it
    val joined = Stateful.intervalJoin(
      clicks.toDF().toDF("cts", "user", "click_id"), "cts", "1 minute",
      buys.toDF().toDF("bts", "user2", "buy_id").withColumnRenamed("user2", "user"),
      "bts", "1 minute", "user", rangeMs = 1500)
      .select(col("click_id"), col("buy_id"))
    val q = joined.writeStream.format("memory").queryName("interval_join_subsec")
      .outputMode("append").start()
    try {
      val t0 = ts(0, 0)
      clicks.addData((t0, "u1", "c1"))
      buys.addData((new Timestamp(t0.getTime + 1200), "u1", "b1"),  // +1.2s: in
        (new Timestamp(t0.getTime + 1800), "u1", "b2"))             // +1.8s: out
      q.processAllAvailable()
      val rows = sp.table("interval_join_subsec")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("c1", "b1")))
    } finally q.stop()
  }

  test("update output mode emits only changed aggregate rows per batch") {
    val sp = spark
    import sp.implicits._
    val in = MemoryStream[(String, Int)]
    val agg = in.toDF().toDF("k", "v").groupBy(col("k")).agg(sum(col("v")).as("total"))
    val q = agg.writeStream.format("memory").queryName("update_mode")
      .outputMode("update").trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      in.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      val afterBatch1 = sp.table("update_mode").count()
      in.addData(("a", 10)) // only 'a' changes; update mode re-emits just 'a'
      q.processAllAvailable()
      val rows = sp.table("update_mode")
        .collect().map(r => (r.getString(0), r.getLong(1))).toList
      assert(afterBatch1 == 2)
      assert(rows.size == 3) // 2 from batch 1 + 1 update
      assert(rows.count(_._1 == "a") == 2 && rows.contains(("a", 11L)))
      assert(rows.count(_._1 == "b") == 1)
    } finally q.stop()
  }
}
