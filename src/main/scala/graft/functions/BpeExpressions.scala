package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ORDERED BPE merge list to a symbol-array column in one
  * per-row expression (r15; guide §4 — expression work in the hot
  * path).
  *
  * Replaces a chain of `Bpe.mergeAdjacent` Catalyst folds, which cost
  * two ways at once: each fold is an interpreted higher-order
  * `aggregate` whose accumulator appends via `concat(out, array(cur))`
  * — a fresh array copy per SYMBOL, so one merge pass over one word is
  * O(symbols²) allocations — and a chain of n folds is a different
  * expression tree at every length, so the BPE training loop's
  * per-iteration census plan recompiled its codegen class every
  * iteration. This expression applies the whole list in a tight
  * two-pointer loop per merge (O(symbols) per pass, zero interpreted
  * lambda dispatch), and because the list rides in the expression
  * OBJECT (the [[IvfAssignExpr]]/[[MaxDotExpr]] pattern), a growing
  * merge list never changes the plan source — the codegen cache hits
  * across training iterations.
  *
  * Semantics contract (SubDocSpec pins this expression against the
  * verbatim `mergeAdjacent` chain, and `train`'s output against the
  * naive reference merge-for-merge): merges apply IN LIST ORDER; each
  * merge rewrites every non-overlapping left-to-right occurrence of
  * the adjacent pair (a, b) into the single symbol a+b ("aaa" +
  * (a,a) → ["aa","a"]); arrays shorter than 2 pass through; a null
  * symbol matches nothing and passes through (the fold's null-falls-
  * to-otherwise behavior). */
case class BpeApplyMergesExpr(child: Expression,
                              merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  require(merges.nonEmpty, "need at least one merge")

  // (a, b, a+b) precomputed once per task as UTF8String
  @transient private lazy val ms: Array[Array[UTF8String]] =
    merges.map { case (a, b) =>
      Array(UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + b))
    }.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_apply_merges"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"input must be array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[ArrayData]
    var cur = new Array[UTF8String](in.numElements())
    var i = 0
    while (i < cur.length) {
      cur(i) = if (in.isNullAt(i)) null else in.getUTF8String(i)
      i += 1
    }
    var m = 0
    while (m < ms.length && cur.length >= 2) {
      val a = ms(m)(0); val b = ms(m)(1); val ab = ms(m)(2)
      val out = new Array[UTF8String](cur.length)
      var j = 0
      var n = 0
      while (j < cur.length) {
        if (j + 1 < cur.length && a.equals(cur(j)) && b.equals(cur(j + 1))) {
          out(n) = ab; n += 1; j += 2
        } else {
          out(n) = cur(j); n += 1; j += 1
        }
      }
      if (n < cur.length) cur = java.util.Arrays.copyOf(out, n)
      m += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeApplyMergesExpr =
    copy(child = newChild)
}
