package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into the `private[sql]` classic Column ⇄ Expression converters.
  *
  * Spark 4 moved `Column` to the connect-compatible sql-api layer; the only
  * supported way to wrap a custom Catalyst `Expression` into a `Column` in
  * the classic runtime is `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. Extension libraries conventionally expose it via
  * a shim object inside an `org.apache.spark.sql` subpackage — this is that
  * shim, kept to the converters and one storage-release helper.
  */
object Glue {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Deterministically release the blocks behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist` goes through the CacheManager and does
    * NOT touch checkpoint blocks — those belong to the materialized RDD
    * inside the plan's `LogicalRDD` and are otherwise freed only when the
    * ContextCleaner notices the RDD is garbage (fine for query results a
    * session drops soon; wasteful for corpus-scale frames a long session
    * builds index after index from). No-op for non-LogicalRDD plans
    * (persist/reliable-checkpoint datasets — `unpersist` and the
    * checkpoint-dir lifecycle cover those). */
  def releaseLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
