package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd Catalyst expressions for dense-vector math over `array<float>` /
  * `array<double>` columns.
  *
  * Why not `functions.aggregate` / `zip_with`: Spark's higher-order array
  * functions are `CodegenFallback` — every element evaluation goes through the
  * interpreted path with per-element lambda invocation. On an all-pairs
  * similarity join that interpreted fold dominated round-1 bench time
  * (dedup_embedding_cosine: 87 s at sf0.1). These expressions generate a tight
  * primitive `for` loop inside whole-stage codegen instead: no virtual calls,
  * no boxing, stays fused with the surrounding join/filter stage.
  *
  * Determinism contract (oracle parity): the accumulation is a sequential
  * left-to-right fold in Double, i.e. bit-identical to DuckDB's
  * `list_reduce(list_transform(...), (a, b) -> a + b)` on the same input —
  * required for hash-compared correctness rows.
  */
private[graft] object VectorExpr {
  def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t // unreachable after checkInputDataTypes
  }

  def checkArray(e: Expression, side: String): Option[String] = e.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => None
    case t => Some(s"$side must be array<numeric>, got ${t.catalogString}")
  }

  def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType  => arr.getDouble(i)
    case FloatType   => arr.getFloat(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
  }
}

/** Sequential-fold dot product of two numeric arrays, accumulated in Double.
  * Result over the common prefix if lengths differ (they should not). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpr._

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    checkArray(left, "left").orElse(checkArray(right, "right"))
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, ta, i) * get(b, tb, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val va = CodeGenerator.getValue(a, elemType(left), i)
      val vb = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double)($va)) * ((double)($vb));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared L2 norm of a numeric array, accumulated in Double. */
case class L2NormSqExpr(child: Expression) extends UnaryExpression {
  import VectorExpr._

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm_sq"

  override def checkInputDataTypes(): TypeCheckResult =
    checkArray(child, "input")
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val t = elemType(child)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = get(a, t, i); acc += x * x; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val va = CodeGenerator.getValue(a, elemType(child), i)
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double)($va);
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2NormSqExpr =
    copy(child = newChild)
}

/** Top-`probes` nearest-centroid ids of a numeric array column, ranked by
  * dot product against a small driver-supplied centroid matrix (rows
  * expected unit-normalized, so dot-product ranking == cosine ranking —
  * the row's own norm is a constant factor that cannot change the argmax).
  * Ties break toward the lower centroid id; output is ascending-id
  * `array<int>` of length `min(probes, centroids.size)`.
  *
  * The centroid matrix is part of the expression (captured at plan time,
  * serialized once per task with the plan, k×dim doubles — tiny even for
  * k=4096, dim=1024), so assignment is a pure per-row map: no shuffle, no
  * join, no broadcast variable plumbing. Per-row (not per-pair) work →
  * CodegenFallback is acceptable, same rationale as SketchExpressions. */
case class IvfAssignExpr(child: Expression, centroids: Seq[Seq[Double]], probes: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "need at least one centroid")
  require(probes >= 1, "probes must be >= 1")
  require(centroids.map(_.length).distinct.size == 1,
    "centroids must share one dimensionality")

  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  @transient private lazy val dim: Int = centroids.head.length
  @transient private lazy val k: Int = centroids.size
  @transient private lazy val p: Int = math.min(probes, centroids.size)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_assign"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpr.checkArray(child, "input")
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(v: Any): Any = {
    import VectorExpr._
    val a = v.asInstanceOf[ArrayData]
    val t = elemType(child)
    val n = math.min(a.numElements(), dim)
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { acc += get(a, t, i) * flat(off + i); i += 1 }
      dots(c) = acc
      c += 1
    }
    // selection of the p largest (k is small; ties -> lower id wins by >).
    // best starts at the first untaken index, not -1: with a corrupt
    // vector (NaN element) every dot is NaN and `>` never fires — the row
    // then falls back deterministically to the lowest-id cells instead of
    // crashing the task.
    val picked = new Array[Int](p)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < p) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && (best == -1 || dots(c) > bestDot)) {
          best = c; bestDot = dots(c)
        }
        c += 1
      }
      taken(best) = true
      picked(s) = best
      s += 1
    }
    java.util.Arrays.sort(picked)
    new GenericArrayData(picked)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssignExpr =
    copy(child = newChild)
}

/** Maximum dot product of a numeric array column against a small
  * driver-supplied centroid matrix — the farthest-point init's per-step
  * scan expression (r15). The init loop previously projected one
  * `dot_product(emb, typedLit(c))` per chosen centroid under a growing
  * `greatest(...)`: a DIFFERENT expression tree every step, so each of
  * the k−1 TakeOrdered scans compiled a fresh whole-stage-codegen class
  * (~100–200 ms per step at local job sizes). With the chosen set
  * captured in ONE expression object the per-step plan SOURCE is
  * step-invariant (the matrix rides in the references array), so the
  * codegen cache hits from step 2 on and each step pays only its job.
  *
  * Value contract (the init is centroid-pinned): each per-centroid dot
  * is the identical ascending-index Double fold [[DotProductExpr]]
  * performs, and the max over them equals `greatest` over the same
  * values — so the selected rows, and therefore the trained centroids,
  * are bit-identical to the unfused form (SimilaritySpec pins this).
  * Same CodegenFallback rationale as [[IvfAssignExpr]]. */
case class MaxDotExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.map(_.length).distinct.size == 1,
    "centroids must share one dimensionality")

  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  @transient private lazy val dim: Int = centroids.head.length
  @transient private lazy val k: Int = centroids.size

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_centroid_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpr.checkArray(child, "input")
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(v: Any): Any = {
    import VectorExpr._
    val a = v.asInstanceOf[ArrayData]
    val t = elemType(child)
    val n = math.min(a.numElements(), dim)
    var best = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { acc += get(a, t, i) * flat(off + i); i += 1 }
      if (acc > best) best = acc
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): MaxDotExpr =
    copy(child = newChild)
}

/** Hamming distance between two equal-length bit-packed Long columns is just
  * `bit_count(a ^ b)` — no custom expression needed; kept in
  * [[graft.operators.Dedup]] as built-ins. */
