package graft.runner

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Listener-fed metrics store — the Spark-native replacement for the
  * reference's REST-polling monitors (reference:
  * internal/pipeline/runner.go:926-1108 polls /jobs every 5 s;
  * internal/dashboard/metrics.go:172-322 every 3 s). Structured Streaming
  * pushes progress events, so there is nothing to poll: every micro-batch
  * updates input-row totals, rates and durations here. */
final class MetricsCollector extends StreamingQueryListener {

  final case class QueryStats(name: String, totalInputRows: Long, batches: Long,
                              lastRowsPerSecond: Double, lastBatchMs: Long,
                              lastProgressAtMs: Long, terminated: Boolean,
                              error: Option[String])

  private val stats = new ConcurrentHashMap[java.util.UUID, QueryStats]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    stats.put(e.id, QueryStats(Option(e.name).getOrElse(e.id.toString),
      0L, 0L, 0.0, 0L, System.currentTimeMillis(), terminated = false, None))

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val prev = Option(stats.get(p.id))
    val base = prev.getOrElse(QueryStats(Option(p.name).getOrElse(p.id.toString),
      0L, 0L, 0.0, 0L, 0L, terminated = false, None))
    stats.put(p.id, base.copy(
      totalInputRows = base.totalInputRows + p.numInputRows,
      batches = base.batches + 1,
      lastRowsPerSecond = p.inputRowsPerSecond,
      lastBatchMs = Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L),
      lastProgressAtMs = System.currentTimeMillis()))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    Option(stats.get(e.id)).foreach { s =>
      stats.put(e.id, s.copy(terminated = true, error = e.exception))
    }
  }

  def snapshot: Seq[QueryStats] = stats.values().asScala.toSeq.sortBy(_.name)

  def totalInputRows: Long = snapshot.map(_.totalInputRows).sum

  def register(spark: SparkSession): this.type = { spark.streams.addListener(this); this }
  def unregister(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

/** Error → remediation suggester (reference:
  * internal/dashboard/metrics.go:388-440 pattern table, re-keyed to the
  * failure modes of this engine's stack). */
object ErrorSuggester {
  private val patterns: Seq[(String, String)] = Seq(
    "connection refused" -> "The backing service is not reachable — check that the broker/registry is up and the endpoint configuration matches.",
    "path does not exist" -> "Input path/topic directory is missing — create the topic (or check the topics root) before deploying.",
    "checkpoint" -> "Checkpoint state conflicts with the query — clear the checkpoint directory or use a fresh query name for a changed plan.",
    "outofmemory" -> "Executor/driver memory exhausted — reduce spark.sql.shuffle.partitions skew, raise memory, or lower the per-batch row budget.",
    "schema" -> "Schema mismatch — re-register the AVRO schema and confirm the subject (<topic>-value) matches the topic.",
    "timeout" -> "Operation timed out — check service health; for streaming queries consider a longer no-progress timeout.",
    "permission" -> "Permission denied — check filesystem/object-store ACLs for the topics root and checkpoint dirs.",
    "parse" -> "Statement failed to parse — validate the SQL against the engine dialect (graft.statements.Statements.validate).")

  def suggest(errorMessage: String): Option[String] = {
    val lower = errorMessage.toLowerCase
    patterns.collectFirst { case (k, v) if lower.contains(k) => v }
  }
}
