package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Bounded-completion control for streaming queries — the Spark-native
  * analog of the reference's validating consumer, which reads an output
  * topic until an expected message count arrives or no message shows up
  * for a timeout (reference: internal/pipeline/consumer.go:45-136:
  * `StartWithExpectedCount`, 30 s no-message timeout).
  *
  * Two modes:
  *  - [[runAvailableNow]]: `Trigger.AvailableNow` — process everything
  *    currently in the source, then stop (bounded run to completion).
  *  - [[awaitExpectedCount]]: leave the query running continuously and
  *    stop it once the cumulative input row count reaches `expected`, or
  *    no progress has been made for `noProgressTimeoutMs`.
  *
  * The listener only accumulates counters; the waiting thread performs
  * `query.stop()` — stopping from inside the listener callback risks a
  * deadlock against the listener bus.
  */
object BoundedRun {

  /** Outcome of a bounded wait. */
  sealed trait Outcome
  case object ReachedExpected extends Outcome
  case object NoProgressTimeout extends Outcome
  case object QueryTerminated extends Outcome

  /** Process all currently-available input, then return once the query
    * has stopped (Trigger.AvailableNow must have been set by the caller's
    * writer — see FileTopics.insertInto / DataStreamWriter.trigger). */
  def runAvailableNow(q: StreamingQuery): Unit = q.awaitTermination()

  /** Stop `q` when its cumulative input rows reach `expected`, or when no
    * batch makes progress for `noProgressTimeoutMs` (reference consumer's
    * 30 s no-message stop). Returns the outcome and the final count. */
  def awaitExpectedCount(spark: SparkSession, q: StreamingQuery, expected: Long,
                         noProgressTimeoutMs: Long = 30000L,
                         pollMs: Long = 50L): (Outcome, Long) = {
    // counts are keyed by batchId so the listener feed and the
    // recentProgress poll below can overlap without double counting —
    // the listener registers AFTER the query started, so batches that
    // completed before registration (and any progress events still in
    // flight on the async listener bus) are only visible via
    // q.recentProgress
    val counted = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    val lastProgressAt = new AtomicLong(System.nanoTime())
    def note(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Unit =
      if (p.id == q.id && p.numInputRows > 0 &&
          counted.putIfAbsent(p.batchId, p.numInputRows) == null)
        lastProgressAt.set(System.nanoTime())
    def seen(): Long = {
      var total = 0L
      counted.values.forEach(v => total += v)
      total
    }
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        note(e.progress)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      var outcome: Outcome = null
      while (outcome == null) {
        q.recentProgress.foreach(note) // pre-registration + in-flight batches
        if (seen() >= expected) outcome = ReachedExpected
        else if (!q.isActive) outcome = QueryTerminated
        else if ((System.nanoTime() - lastProgressAt.get()) / 1000000L > noProgressTimeoutMs)
          outcome = NoProgressTimeout
        else Thread.sleep(pollMs)
      }
      if (q.isActive) q.stop()
      q.awaitTermination()
      q.recentProgress.foreach(note) // final sweep after termination
      (outcome, seen())
    } finally spark.streams.removeListener(listener)
  }
}
