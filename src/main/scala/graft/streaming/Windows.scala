package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Event-time window builders — the Flink TVF surface the reference's
  * generated SQL uses (reference: docs-site/ai-generation.md:272 TUMBLE;
  * docs-site/advanced/performance.md:172,236; prompts require "windowing
  * and aggregations", internal/llm/service.go:226), expressed as Spark
  * `window`/`session_window` grouping.
  *
  * All builders return the grouped dataset; after `.agg(...)`, call
  * [[Windows.flatten]] to expose `window_start`/`window_end` the way
  * Flink's TVF output does.
  *
  * These work identically on batch and streaming DataFrames — the batch
  * forms are the oracle-checkable instantiation (see
  * graft.queries.Events), the streaming forms are exercised by the
  * golden suites in src/test/scala/graft/streaming.
  */
object Windows {

  /** Tumbling window of `size` on `eventTime`, plus optional extra keys. */
  def tumble(df: DataFrame, eventTime: String, size: String,
             keys: Column*): RelationalGroupedDataset =
    df.groupBy(window(col(eventTime), size) +: keys: _*)

  /** Sliding (HOP) window: `size` every `slide`. */
  def hop(df: DataFrame, eventTime: String, size: String, slide: String,
          keys: Column*): RelationalGroupedDataset =
    df.groupBy(window(col(eventTime), size, slide) +: keys: _*)

  /** Session window with a fixed inactivity `gap` (merging windows). */
  def session(df: DataFrame, eventTime: String, gap: String,
              keys: Column*): RelationalGroupedDataset =
    df.groupBy(session_window(col(eventTime), gap) +: keys: _*)

  /** Session window with a per-row dynamic gap expression. */
  def sessionDynamic(df: DataFrame, eventTime: String, gap: Column,
                     keys: Column*): RelationalGroupedDataset =
    df.groupBy(session_window(col(eventTime), gap) +: keys: _*)

  /** Replace the struct `window`/`session_window` column with flat
    * `window_start`/`window_end` columns (Flink TVF output shape). */
  def flatten(df: DataFrame): DataFrame = {
    val wcol = df.columns.find(c => c == "window" || c == "session_window")
      .getOrElse(throw new IllegalArgumentException(
        s"no window column in ${df.columns.mkString(", ")}"))
    val rest = df.columns.filterNot(_ == wcol).map(col)
    df.select(col(s"$wcol.start").as("window_start") +:
      col(s"$wcol.end").as("window_end") +: rest: _*)
  }
}
