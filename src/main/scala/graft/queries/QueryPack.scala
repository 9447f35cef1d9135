package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of engine queries with (where SQL-expressible) DuckDB
  * oracle equivalents.
  *
  * Contract (driver gate): for every key in `queries` that also appears in
  * `oracles`, the DuckDB SQL must produce the exact same rows, column names
  * and value hashes as the Spark DataFrame. Determinism policy (SURVEY.md
  * §2.B): total ORDER BY on a unique key set; money math in DECIMAL(18,2)
  * then cast to DOUBLE (bit-exact across engines, no float summation-order
  * dependence); computed integers as BIGINT on both sides; timestamps never
  * emitted raw (formatted or epoch seconds instead).
  */
trait QueryPack {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QFn]
  def oracles: Map[String, String]
}
