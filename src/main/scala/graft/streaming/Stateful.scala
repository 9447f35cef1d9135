package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful custom operators over `KeyValueGroupedDataset` — the
  * `flatMapGroupsWithState` surface from SURVEY.md §2.B ("stateful custom
  * ops"). The concrete operator is the one the reference's pipelines keep
  * re-creating in SQL: per-key session tracking with custom emission.
  *
  * State is bounded by processing-time timeout — at 100 TB stream scale
  * the state store holds one small record per active key and the timeout
  * evicts idle keys, the same posture as dropDuplicatesWithinWatermark.
  */
object Stateful {

  final case class Event(user: String, ts: Timestamp, amount: Double)
  final case class SessionState(count: Long, total: Double, firstTs: Long, lastTs: Long)
  final case class SessionUpdate(user: String, events: Long, total: Double,
                                 durationMs: Long, closed: Boolean)

  /** Running per-user session aggregate with idle-timeout emission:
    * every batch emits the updated running session; once the event-time
    * watermark passes a key's last activity + `idleTimeoutMs` the session
    * closes and emits a final record, and its state is evicted.
    * (flatMapGroupsWithState, update mode, EventTimeTimeout.)
    *
    * Event-time (not processing-time) timeout on purpose: it is
    * deterministic, replayable, and does not make the engine schedule
    * wall-clock batches forever — with ProcessingTimeTimeout the stream
    * keeps running empty timeout-check batches, which also never settles
    * under processAllAvailable in tests. */
  def sessionTracker(events: Dataset[Event], idleTimeoutMs: Long,
                     watermarkDelay: String = "10 seconds"): Dataset[SessionUpdate] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(user, s.count, s.total, s.lastTs - s.firstTs, closed = true))
          } else {
            val incoming = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
            val next = incoming.foldLeft(prev) { (s, e) =>
              SessionState(s.count + 1, s.total + e.amount,
                math.min(s.firstTs, e.ts.getTime), math.max(s.lastTs, e.ts.getTime))
            }
            state.update(next)
            state.setTimeoutTimestamp(next.lastTs + idleTimeoutMs)
            Iterator(SessionUpdate(user, next.count, next.total,
              next.lastTs - next.firstTs, closed = false))
          }
      }
  }

  /** Stream-stream inner join with watermarks and an event-time range
    * bound (SURVEY.md §2.B join matrix; the Flink interval-join analog).
    * Both sides carry watermarks so state on each side is evicted once
    * the other side's watermark passes the range. */
  def intervalJoin(left: DataFrame, leftTs: String, leftWatermark: String,
                   right: DataFrame, rightTs: String, rightWatermark: String,
                   key: String, rangeMs: Long): DataFrame = {
    val l = left.withWatermark(leftTs, leftWatermark).alias("l")
    val r = right.withWatermark(rightTs, rightWatermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL ${rangeMs / 1000} SECONDS"))
  }
}
