package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Access to the driver-generated parquet tables (see TESTDATA.md).
  *
  * Everything downstream takes plain DataFrames, so at cluster scale these
  * calls are replaced by catalog tables / object-store paths without touching
  * query code. Parquet scans get filter pushdown + column pruning from
  * Catalyst for free — query code must keep projections narrow so the
  * ReadSchema stays minimal.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // r14 note: a blanket Storage.spread here was built and MEASURED OUT.
  // A sub-block-size single-file table scans as one task, and spreading
  // it helps a single-pass per-row-heavy consumer — but the spread
  // exchange is part of the plan, so every ACTION of a multi-job query
  // re-pays scan + shuffle + task fan-out: the full-suite A/B read
  // net-zero (documents-driven one-pass queries gained 1-2 s each;
  // IVF driver loops, edit-distance density probes and other
  // several-jobs-per-query operators lost the same total). The spread
  // therefore lives at the OPERATOR/QUERY level, applied exactly where
  // a measured win exists (winnow, span, DSIR, rule filters, PNG
  // resize) — see Storage.spread.
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Timestamp normalization across driver-side testdata generations. The
    * generator has shipped `ts`/`*date` columns both as TIMESTAMP(NANOS)
    * (no native Spark type; sessions set
    * spark.sql.legacy.parquet.nanosAsLong and we rebuild microseconds —
    * `div` truncates, the same ns→us semantics as DuckDB's CAST) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    * TIMESTAMP_NTZ. Engine code and the DuckDB oracles are written against
    * plain TimestampType under the session's pinned UTC zone — where NTZ
    * and LTZ denote the identical microsecond instant — so both layouts
    * fold to TimestampType here, keeping every downstream cast (e.g.
    * timestamp→long epoch seconds, which Spark forbids from NTZ) legal. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast("timestamp"))
      else d
    }
}
