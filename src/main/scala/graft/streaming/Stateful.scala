package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  final case class TopKMeta(lastTs: Long, timerAt: Long)
  final case class TopKUpdate(user: String, topAmounts: Seq[Double], closed: Boolean)

  /** `transformWithState` processor (the Spark-4 arbitrary-state API that
    * supersedes flatMapGroupsWithState): per-key top-k amounts with an
    * event-time idle-close timer.
    *
    * What the new API buys over flatMapGroupsWithState, exercised here:
    *  - COMPOSITE state: a ListState (the top-k buffer) beside a ValueState
    *    (bookkeeping) — fMGWS forces one monolithic state object that is
    *    fully deserialized+rewritten per key per batch, while TWS state
    *    vars are individually addressable in RocksDB;
    *  - explicit TIMERS (registerTimer/handleExpiredTimer) instead of the
    *    single implicit timeout slot — a key can juggle several deadlines;
    *  - per-state TTL (TTLConfig) for GDPR-style retention at 100 TB scale.
    * Requires the RocksDB state store provider (Spark enforces it); the
    * operator sets nothing itself — callers flip
    * `spark.sql.streaming.stateStore.providerClass`.
    *
    * Event-time (not processing-time) timers for the same determinism /
    * testability reasons as [[sessionTracker]]. */
  private final class TopKProcessor(k: Int, idleTimeoutMs: Long)
      extends StatefulProcessor[String, Event, TopKUpdate] {
    @transient private var top: ListState[Double] = _
    @transient private var meta: ValueState[TopKMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState("topAmounts", Encoders.scalaDouble, TTLConfig.NONE)
      meta = getHandle.getValueState("meta", Encoders.product[TopKMeta], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[TopKUpdate] = {
      val incoming = rows.toSeq
      val prevTop = if (top.exists()) top.get().toSeq else Seq.empty[Double]
      val merged = (prevTop ++ incoming.map(_.amount))
        .sorted(Ordering[Double].reverse).take(k)
      top.put(merged.toArray)
      val prev = if (meta.exists()) Some(meta.get()) else None
      val lastTs = math.max(incoming.map(_.ts.getTime).max,
        prev.map(_.lastTs).getOrElse(Long.MinValue))
      prev.filter(_.timerAt > 0).foreach(m => getHandle.deleteTimer(m.timerAt))
      val timerAt = lastTs + idleTimeoutMs
      getHandle.registerTimer(timerAt)
      meta.update(TopKMeta(lastTs, timerAt))
      Iterator(TopKUpdate(key, merged, closed = false))
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[TopKUpdate] = {
      val fin = if (top.exists()) top.get().toSeq else Seq.empty[Double]
      top.clear()
      meta.clear()
      Iterator(TopKUpdate(key, fin, closed = true))
    }
  }

  /** Per-key running top-k amounts with watermark-driven idle close, on the
    * `transformWithState` API (update mode, event-time timers). Emits the
    * updated top-k per key per batch; once the watermark passes last
    * activity + `idleTimeoutMs` the key emits a final `closed=true` record
    * and its state (all state vars + timers) is dropped. */
  def topKTracker(events: Dataset[Event], k: Int, idleTimeoutMs: Long,
                  watermarkDelay: String = "10 seconds"): Dataset[TopKUpdate] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user)
      .transformWithState(new TopKProcessor(k, idleTimeoutMs),
        TimeMode.EventTime(), OutputMode.Update())
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
        // MILLISECONDS, not rangeMs/1000 SECONDS: integer division silently
        // truncated sub-second ranges (500 ms became a 0-width range)
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $rangeMs MILLISECONDS"))
  }
}
