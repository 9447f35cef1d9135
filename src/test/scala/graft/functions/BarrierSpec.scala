package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EvalBarrierExpr: identity on values, opaque to predicate pushdown. */
class BarrierSpec extends SparkSpec {
  import spark.implicits._

  test("evalBarrier is identity on filter semantics") {
    val df = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
    val plain = df.filter(col("v") >= 40.0).collect().map(_.getLong(0)).sorted
    val barred = df.filter(evalBarrier(col("v") >= 40.0)).collect().map(_.getLong(0)).sorted
    assert(barred.sameElements(plain))
  }

  test("a barrier'd predicate stays above a pair join instead of fusing into its condition") {
    val emb = (1L to 20L).map(i => (i, Array.fill(4)(i.toDouble))).toDF("id", "emb")
    val a = emb.toDF("id_a", "emb_a")
    val b = emb.toDF("id_b", "emb_b")

    def joinConditionOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collectFirst {
        case j: Join => j.condition.map(_.sql).getOrElse("")
      }.getOrElse(fail("no join in plan"))

    // without the barrier: the dot-product threshold fuses into the join
    // condition (this is the behavior the barrier exists to prevent)
    val fused = a.join(b, col("id_a") < col("id_b"))
      .filter(dotProduct(col("emb_a"), col("emb_b")) >= 10.0)
    assert(joinConditionOf(fused).toLowerCase.contains("dot_product"),
      s"expected the unbarred predicate to fuse into the join condition:\n${fused.queryExecution.optimizedPlan}")

    // with the barrier: the join keeps only the cheap id compare, and a
    // Filter above carries the barrier'd dot product
    val barred = a.join(b, col("id_a") < col("id_b"))
      .filter(evalBarrier(dotProduct(col("emb_a"), col("emb_b")) >= 10.0))
    val cond = joinConditionOf(barred)
    assert(!cond.toLowerCase.contains("dot_product"),
      s"barrier'd predicate leaked into the join condition: $cond")
    assert(cond.contains("<"), s"expected the id compare to remain the join condition: $cond")
    val hasBarrierFilter = barred.queryExecution.optimizedPlan.collect {
      case f: Filter if f.condition.exists(_.isInstanceOf[EvalBarrierExpr]) => f
    }.nonEmpty
    assert(hasBarrierFilter,
      s"expected a Filter carrying EvalBarrierExpr above the join:\n${barred.queryExecution.optimizedPlan}")

    // and the results are identical either way
    val r1 = fused.select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val r2 = barred.select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(r1.sameElements(r2))
  }
}
