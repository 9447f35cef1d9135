package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming transforms the reference's generated pipelines rely on,
  * expressed Spark-first:
  *
  *  - watermarked event time (reference WATERMARK DDL,
  *    docs-site/commands/validate.md:168: `WATERMARK FOR event_time AS
  *    event_time - INTERVAL '5' SECOND` ≡ `withWatermark(col, "5 seconds")`),
  *  - streaming deduplication (the mock pipeline's `is_duplicate` column,
  *    internal/llm/service.go:1064) via dropDuplicates /
  *    dropDuplicatesWithinWatermark,
  *  - stream-static lookup join (the reference docs' lookup-join with
  *    cached dimension, docs-site/advanced/performance.md:175-182).
  */
object StreamOps {

  /** Declare `tsCol` as event time with a watermark `delay`; rows later
    * than the watermark are dropped by downstream stateful operators
    * (Spark semantics: dropped post-watermark; Flink's allowed-lateness
    * side outputs are not reproduced — the reference never uses them). */
  def withEventTime(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Exact streaming dedup on key columns: first occurrence wins, state
    * kept forever (bounded sources / tests) — `dropDuplicates`. */
  def dedupExact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Dedup with state expiry at the watermark: duplicates arriving within
    * the watermark delay of the first occurrence are dropped; state is
    * evicted afterwards, bounding memory at 100 TB stream scale. Caller
    * must have applied [[withEventTime]] first. */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(keys)

  /** Stream-static equi join (lookup-join analog): the static side is
    * broadcast by Catalyst when small, giving the same no-shuffle lookup
    * the reference configures with 'lookup.cache'='SYNC'. */
  def lookupJoin(stream: DataFrame, dim: DataFrame, on: Seq[String],
                 joinType: String = "inner"): DataFrame =
    stream.join(broadcast(dim), on, joinType)
}
