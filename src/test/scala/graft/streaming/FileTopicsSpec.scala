package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** End-to-end pipeline over the file-backed topic transport — the analog
  * of the reference's `pipegen run`: produce to an input topic, stand up a
  * continuous INSERT-SELECT, read the output topic back and validate
  * counts (reference: internal/pipeline/runner.go:169-448). */
class FileTopicsSpec extends SparkSpec {

  private def freshTopics(): FileTopics =
    FileTopics(Files.createTempDirectory("graft-topics").toString)

  private val payload = StructType.fromDDL(
    "event_id STRING, user_id INT, amount DOUBLE")

  test("produce -> topic -> readAll round-trips the payload") {
    val sp = spark
    import sp.implicits._
    val t = freshTopics()
    val in = Seq(("e1", 1, 10.0), ("e2", 2, 20.5), ("e3", 1, 0.25))
      .toDF("event_id", "user_id", "amount")
    t.produce(in, "input-events", keyCol = Some("event_id"))
    val back = t.readAll(sp, "input-events", payload)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(back == Set(("e1", 1, 10.0), ("e2", 2, 20.5), ("e3", 1, 0.25)))
  }

  test("continuous INSERT-SELECT: input topic -> transform -> output topic (AvailableNow)") {
    val sp = spark
    import sp.implicits._
    val t = freshTopics()
    val in = (1 to 100).map(i => (s"e$i", i % 10, i.toDouble))
      .toDF("event_id", "user_id", "amount")
    t.produce(in, "input-events", keyCol = Some("event_id"))

    // the processing statement: SELECT user_id, amount * 2 AS doubled
    val stream = t.readStream(sp, "input-events", payload)
      .select(col("user_id"), (col("amount") * 2).as("doubled"))
    val q = t.insertInto(stream, "output-results", "proc1",
      trigger = Trigger.AvailableNow())
    BoundedRun.runAvailableNow(q)

    val outSchema = StructType.fromDDL("user_id INT, doubled DOUBLE")
    val out = t.readAll(sp, "output-results", outSchema)
    assert(out.count() == 100)
    val sums = out.agg(sum(col("doubled"))).head().getDouble(0)
    assert(sums == (1 to 100).map(_ * 2.0).sum)
  }

  test("validating-consumer analog: expected count reached on the output topic") {
    val sp = spark
    import sp.implicits._
    val t = freshTopics()
    val in = (1 to 50).map(i => (s"e$i", i, i.toDouble)).toDF("event_id", "user_id", "amount")
    t.produce(in, "in2", keyCol = Some("event_id"))
    val q = t.insertInto(t.readStream(sp, "in2", payload), "out2", "proc2",
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      val (outcome, n) = BoundedRun.awaitExpectedCount(sp, q, expected = 50,
        noProgressTimeoutMs = 30000)
      assert(outcome == BoundedRun.ReachedExpected)
      assert(n >= 50)
    } finally if (q.isActive) q.stop()
    assert(t.readAll(sp, "out2", payload).count() == 50)
  }
}
