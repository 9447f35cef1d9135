package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Stream-batch equivalence (SURVEY.md §5.2): the same windowed
  * aggregation over the same rows must produce identical results whether
  * executed as a batch DataFrame or as a Structured Streaming query over
  * the topic transport — graft.queries.Events documents its batch forms
  * as "the oracle-checkable instantiation" of the streaming surface; this
  * suite proves the equivalence on real testdata. */
class StreamBatchEquivalenceSpec extends SparkSpec {

  test("tumbling-window aggregation: streaming(AvailableNow) == batch on events data") {
    val sp = spark
    // small slice of the real events table
    val events = graft.Tables(sp, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      .limit(2000)

    // batch form
    def agg(df: org.apache.spark.sql.DataFrame) =
      Windows.flatten(
        Windows.tumble(df, "ts", "1 hour", col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,2)")).as("sum_v")))
        .select(col("window_start").cast("long").as("ws"), col("event_type"),
          col("cnt"), col("sum_v"))
    val batch = agg(events).collect().map(_.toSeq).toSet

    // streaming form over the file transport
    val t = FileTopics(Files.createTempDirectory("graft-eq").toString)
    t.produce(events, "events-in", keyCol = Some("event_id"), tsCol = None)
    val payload = StructType.fromDDL(
      "event_id STRING, event_type STRING, value DOUBLE, ts TIMESTAMP")
    val stream = t.readStream(sp, "events-in", payload)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"))
    val q = agg(stream)
      .writeStream.format("memory").queryName("eq_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = sp.table("eq_stream").collect().map(_.toSeq).toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
