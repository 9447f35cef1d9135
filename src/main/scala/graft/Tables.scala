package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark has no
    * native type for; sessions set spark.sql.legacy.parquet.nanosAsLong and
    * we rebuild a microsecond TimestampType here. `div` truncates — the
    * same ns→us semantics as DuckDB's CAST(ts_ns AS TIMESTAMP). */
  private def normalizeTs(df: DataFrame): DataFrame =
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
}
