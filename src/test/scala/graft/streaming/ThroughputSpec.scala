package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming scale-posture golden test: 10,000 events/s sustained through
  * a watermarked windowed aggregation for >= 30 s, with throughput
  * verified from the engine's own progress reports (the listener feed the
  * dashboard/metrics stack consumes) — the reference's published dashboard
  * target (docs-site/dashboard.md:293).
  */
class ThroughputSpec extends SparkSpec {

  test("10k events/s sustained through a windowed agg for 30s (listener-verified)") {
    val targetRate = 10000L
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", targetRate)
      .option("numPartitions", 4)
      .load()
    // watermark + tumbling window + keyed agg — the stateful shape every
    // traffic pipeline runs; update mode keeps state bounded by eviction
    val agg = rate
      .withWatermark("timestamp", "5 seconds")
      .groupBy(window(col("timestamp"), "1 second"),
        pmod(col("value"), lit(10)).as("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
    val q = agg.writeStream.format("noop")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      // run until >= 36 s of progress history exists (3 warmup batches
      // skipped below leave a >= 30 s steady-state span); hard 90 s cap
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      while (q.recentProgress.length < 39 && System.nanoTime() < deadline)
        Thread.sleep(500)
      val steady = q.recentProgress.drop(3)
      assert(steady.length >= 30, s"only ${steady.length} steady batches before timeout")

      val fmt = java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
      def epochMs(ts: String): Long =
        java.time.OffsetDateTime.parse(ts, fmt).toInstant.toEpochMilli
      val spanSec =
        (epochMs(steady.last.timestamp) - epochMs(steady.head.timestamp)) / 1000.0
      assert(spanSec >= 30.0, s"steady-state span only $spanSec s")

      // sustained intake: total rows over the span matches the source rate
      // (one trigger interval of slack for the boundary batches)
      val totalRows = steady.iterator.map(_.numInputRows).sum
      assert(totalRows >= targetRate * (spanSec - 1.0),
        s"intake $totalRows rows over $spanSec s — below ${targetRate}/s sustained")

      // keeping up, not backlogging: processing rate meets the input rate
      val processed = steady.map(_.processedRowsPerSecond).filter(_ > 0)
      val meanProcessed = processed.sum / processed.length
      assert(meanProcessed >= targetRate,
        f"mean processedRowsPerSecond $meanProcessed%.0f < $targetRate")
    } finally q.stop()
  }
}
