package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that blocks predicate pushdown.
  *
  * Declares itself non-deterministic (it is not), so the optimizer will
  * not push a Filter containing it through projections or into a join
  * condition. This is the ONLY way to pin evaluation order around a
  * cartesian/BNLJ pair join: Catalyst fuses every pushable conjunct into
  * the join condition ordered by push origin — a filter written directly
  * above the join lands at the FRONT of the fused predicate and a cheap
  * `id_a < id_b` join condition at the BACK, so an expensive predicate
  * (vector dot product, bitmap popcount) would run for every ordered pair
  * including the half the id compare alone eliminates. Wrapping the
  * expensive predicate in this barrier keeps it ABOVE the join, where it
  * sees only pairs that already survived the cheap join condition, and
  * above the projection that computes the expensive value exactly once.
  *
  * Codegen is a pass-through of the child (no fallback — the hot filters
  * stay inside whole-stage codegen); `eval` likewise. Results are exactly
  * the child's results, so correctness contracts are unaffected.
  *
  * USAGE CONSTRAINT: the barrier blocks EVERY pushdown rule, not just
  * join-condition fusion — a predicate wrapped in it will never reach a
  * scan's PushedFilters or prune partitions. Only wrap post-join
  * predicates (the expensive verify above a pair join); never wrap a
  * scan-level filter.
  */
case class EvalBarrierExpr(child: Expression) extends UnaryExpression {
  // the lie that blocks pushdown (expressions are otherwise assumed pure)
  override lazy val deterministic: Boolean = false
  // flag consistency with the lie: UnaryExpression's default foldable
  // delegates to the child, and a rule that only checks foldable would
  // happily constant-fold a barrier over a literal — resurrecting the
  // evaluation-order movement the barrier exists to prevent
  override val foldable: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalBarrierExpr =
    copy(child = newChild)
}
