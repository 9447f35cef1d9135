package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Checkpoint-recovery goldens: a restarted query must resume from its
  * checkpoint exactly-once — no reprocessing of already-committed input,
  * no loss, and stateful operators must carry their state across the
  * restart. This is the durability half of the streaming contract (the
  * reference delegates it to Flink checkpoints; Spark's WAL + state store
  * provide it here).
  */
class RecoverySpec extends SparkSpec {

  test("stateless sink query resumes exactly-once across a restart") {
    val sp = spark
    import sp.implicits._
    val src = Files.createTempDirectory("graft-rec-src").toString
    val ckpt = Files.createTempDirectory("graft-rec-ckpt").toString
    val out = Files.createTempDirectory("graft-rec-out").toString

    def run(): Unit = {
      val q = sp.readStream.schema("v LONG").json(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "drain timed out")
    }

    (1L to 50L).toDF("v").coalesce(1).write.mode("append").json(src)
    run()
    assert(sp.read.parquet(out).count() == 50)

    // new input lands while the query is DOWN; restart from the same
    // checkpoint must pick up only the new files
    (51L to 80L).toDF("v").coalesce(1).write.mode("append").json(src)
    run()
    val vals = sp.read.parquet(out).select("v").as[Long].collect().sorted.toSeq
    assert(vals == (1L to 80L), "exactly-once: no duplicates, no loss")
  }

  test("aggregation state survives the restart (counts span both runs)") {
    val sp = spark
    import sp.implicits._
    val src = Files.createTempDirectory("graft-rec2-src").toString
    val ckpt = Files.createTempDirectory("graft-rec2-ckpt").toString

    def run(name: String): Map[Long, Long] = {
      val q = sp.readStream.schema("v LONG").json(src)
        .groupBy((col("v") % 5).as("k")).agg(count(lit(1)).as("cnt"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(name).outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "drain timed out")
      sp.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    (1L to 100L).toDF("v").coalesce(1).write.mode("append").json(src)
    assert(run("rec_agg_1") == (0L to 4L).map(_ -> 20L).toMap)

    // 50 more rows after the restart: the complete-mode output of the NEW
    // query instance must reflect restored state + new input
    (101L to 150L).toDF("v").coalesce(1).write.mode("append").json(src)
    val after = run("rec_agg_2")
    assert(after == (0L to 4L).map(_ -> 30L).toMap,
      s"state must span both runs, got $after")
  }

  test("transformWithState carries ~1e5 keys of RocksDB state across a restart") {
    // VERDICT_r05 next-round #7: the toy-sized TWS goldens (StatefulSpec)
    // prove semantics; this one proves the recovery path at realistic
    // per-partition state volume — 100k keys, each with a ListState +
    // ValueState + a registered timer, checkpointed by run 1 and REQUIRED
    // by run 2's merge logic (every output row must contain run 1's
    // amount, so a state loss is 100k failed rows, not a flake).
    val sp = spark
    import sp.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = Files.createTempDirectory("graft-tws-src").toString
    val ckpt = Files.createTempDirectory("graft-tws-ckpt").toString
    val nKeys = 100000
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

    def writeBatch(amount: Double, offsetSec: Int): Unit =
      (0 until nKeys)
        .map(i => (s"u$i", new java.sql.Timestamp(base.getTime + offsetSec * 1000L), amount))
        .toDF("user", "ts", "amount")
        .coalesce(4).write.mode("append").parquet(src)

    // the memory sink cannot recover from a checkpoint in update mode, so
    // each run drains through foreachBatch into its own parquet dir (the
    // foreachBatch sink IS checkpoint-recoverable)
    def run(outDir: String): Unit = {
      val events = sp.readStream
        .schema("user STRING, ts TIMESTAMP, amount DOUBLE").parquet(src)
        .as[Stateful.Event]
      val q = Stateful.topKTracker(events, k = 2, idleTimeoutMs = 3600L * 1000)
        .toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "drain timed out")
    }

    def readOut(outDir: String): Array[(String, List[Double], Boolean)] =
      sp.read.parquet(outDir)
        .collect().map(r => (r.getString(0), r.getSeq[Double](1).toList, r.getBoolean(2)))

    val out1 = Files.createTempDirectory("graft-tws-out1").toString
    val out2 = Files.createTempDirectory("graft-tws-out2").toString
    try {
      writeBatch(1.0, 0)
      run(out1)
      val first = readOut(out1)
      assert(first.length == nKeys)
      assert(first.forall { case (_, top, closed) => top == List(1.0) && !closed })

      // new input lands while the query is DOWN; the restarted instance
      // must restore every key's ListState and merge, not re-initialize
      writeBatch(2.0, 60)
      run(out2)
      val second = readOut(out2)
      assert(second.length == nKeys, s"expected $nKeys updated keys, got ${second.length}")
      val carried = second.count { case (_, top, closed) => top == List(2.0, 1.0) && !closed }
      assert(carried == nKeys,
        s"state carryover: only $carried/$nKeys keys merged run 1's amount")
    } finally {
      prev match {
        case Some(v) => sp.conf.set(providerKey, v)
        case None    => sp.conf.unset(providerKey)
      }
    }
  }

  test("restart latency from an existing checkpoint is bounded (reported)") {
    val sp = spark
    import sp.implicits._
    val src = Files.createTempDirectory("graft-rec3-src").toString
    val ckpt = Files.createTempDirectory("graft-rec3-ckpt").toString
    val out = Files.createTempDirectory("graft-rec3-out").toString

    def run(): Double = {
      val t0 = System.nanoTime()
      val q = sp.readStream.schema("v LONG").json(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "drain timed out")
      (System.nanoTime() - t0) / 1e9
    }

    (1L to 1000L).toDF("v").coalesce(4).write.mode("append").json(src)
    run() // cold start: builds the checkpoint
    (1001L to 1100L).toDF("v").coalesce(1).write.mode("append").json(src)
    // warm restart: WAL replay + offset restore + one small batch — the
    // number recorded in README's streaming posture
    val restart = run()
    info(f"checkpoint restart latency: $restart%.2f s (offset restore + 100-row drain)")
    println(f"RECOVERY restart_latency=$restart%.2f s")
    assert(sp.read.parquet(out).count() == 1100)
    // generous bound: the restart must be seconds, not a reprocess of the
    // full history (which at this size would not show, so the real gate is
    // the exactly-once row count above plus the recorded latency)
    assert(restart < 30.0, f"restart took $restart%.1f s")
  }
}
