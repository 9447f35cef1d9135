package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the runtime posture the reference ships for its Flink cluster
  * (reference: internal/templates/files/config/flink-conf.yaml — task slots,
  * checkpoint dir, parallelism defaults) re-expressed as Spark conf:
  *  - UTC session timezone (oracle determinism),
  *  - small fixed shuffle partitioning for local[N] testing; at cluster
  *    scale this is expected to be overridden (AQE coalesces anyway),
  *  - AQE on: runtime re-planning (skew joins, partition coalescing) is the
  *    scale story for 100 TB inputs.
  */
object GraftSession {

  def defaultParallelism: Int =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests/benchmarks (driver contract uses local[N]). */
  def local(appName: String = "graft", cores: Int = defaultParallelism): SparkSession = {
    val spark = builder(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
