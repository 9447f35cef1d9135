package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization expressions — the compressed-domain arm of the
  * similarity stack (Quantize.scala holds the train/search drivers).
  *
  * PQ splits a dim-d vector into `m` subvectors of dim/m and replaces each
  * with the index of its nearest (L2) centroid out of `ksub` per-subspace
  * codebook entries: m bytes-ish per vector instead of 4·dim — at 100 TB
  * the codes table is what a search fleet keeps hot, embeddings stay cold.
  * Scoring against a query uses the ADC (asymmetric distance computation)
  * trick: the query precomputes an m×ksub lookup table of partial dot
  * products, and each candidate's approximate score is m array reads —
  * no per-pair float vector math at all.
  */

/** PQ codes of a numeric-array column: element s = argmin_j of the L2
  * distance between subvector s and codebook entry (s, j); ties break to
  * the lower j (deterministic). Returns null for null or short vectors
  * (length < m·dsub) — the same "null rows filter upstream" contract as
  * [[MinHashSigExpr]]. Per ROW, not per pair, so CodegenFallback is fine
  * (the per-candidate hot path is [[PqAdcExpr]]). */
case class PqEncodeExpr(child: Expression, flatCodebooks: Array[Double],
                        m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with CodegenFallback {
  require(m >= 1 && ksub >= 1 && dsub >= 1, s"bad PQ geometry m=$m ksub=$ksub dsub=$dsub")
  require(flatCodebooks.length == m * ksub * dsub,
    s"codebook length ${flatCodebooks.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double|float>, got ${t.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < m * dsub) return null
    val codes = new Array[Any](m)
    var s = 0
    while (s < m) {
      val base = s * ksub * dsub
      val off = s * dsub
      var best = 0
      var bestDist = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) arr.getFloat(off + d).toDouble else arr.getDouble(off + d)
          val diff = x - flatCodebooks(base + j * dsub + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** ADC score of a PQ code array against a query's flattened m×ksub lookup
  * table: sum over subspaces of lut[s·ksub + code_s] — the approximate
  * dot product in m array reads. THE per-candidate hot path of a PQ
  * search, so fully codegen'd (the shortlist ranking runs this once per
  * corpus row). Codes outside [0, ksub) contribute 0 (defensive: a code
  * from a mismatched codebook must not read out of bounds). */
case class PqAdcExpr(child: Expression, lut: Array[Double], ksub: Int)
    extends UnaryExpression {
  require(ksub >= 1 && lut.length % ksub == 0,
    s"lut length ${lut.length} not a multiple of ksub=$ksub")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs array<int>, got ${t.catalogString}")
  }

  private val mSub = lut.length / ksub

  def score(codes: ArrayData): Double = {
    val n = math.min(codes.numElements(), mSub)
    var acc = 0.0
    var s = 0
    while (s < n) {
      val c = codes.getInt(s)
      if (c >= 0 && c < ksub) acc += lut(s * ksub + c)
      s += 1
    }
    acc
  }

  override protected def nullSafeEval(v: Any): Any = score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcExpr =
    copy(child = newChild)
}
