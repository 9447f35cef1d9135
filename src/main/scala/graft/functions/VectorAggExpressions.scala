package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of row-normalized vectors — the Lloyd-iteration
  * per-(cell, dim) fold of [[graft.operators.Similarity
  * .trainIvfCentroids]] folded PER ROW (r15, VERDICT r14 next #4, guide
  * §2.3 "aggregate before you shuffle"): the replaced route posexploded
  * every member vector into `dim` rows before the (cell, pos) hash
  * aggregate — `dim`× the generator traffic per member at any scale.
  *
  * Summation-order contract (the oracle-parity safety net): within one
  * scan partition the buffer accumulates members in ROW ORDER — the
  * identical addition sequence the posexplode route's map-side partial
  * aggregation performed per (cell, pos) — and the caller groups by
  * (spark_partition_id, cell), so each group receives exactly ONE real
  * partial and the cross-partition merge happens ON THE DRIVER in
  * ascending partition id (trainIvfCentroids). That is strictly MORE
  * deterministic than the shuffle it replaces (whose final-aggregate
  * merge order follows block fetch order); SimilaritySpec pins the two
  * routes bit-identical on the fixtures.
  */
case class NormalizedVectorSumAgg(
    emb: Expression,
    nsq: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(emb, nsq)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "normalized_vector_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpr.checkArray(emb, "emb")
      .orElse(nsq.dataType match {
        case DoubleType => None
        case t => Some(s"nsq must be double, got ${t.catalogString}")
      })
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val a = emb.eval(input)
    val n2 = nsq.eval(input)
    if (a != null && n2 != null) {
      val arr = a.asInstanceOf[ArrayData]
      val nrm = math.sqrt(n2.asInstanceOf[Double])
      if (nrm > 0) {
        val et = VectorExpr.elemType(emb)
        val m = math.min(dim, arr.numElements())
        var j = 0
        while (j < m) { buf(j) += VectorExpr.get(arr, et, j) / nrm; j += 1 }
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var j = 0
    while (j < dim) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    var j = 0
    while (j < dim) { bb.putDouble(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](dim)
    var j = 0
    while (j < dim) { buf(j) = bb.getDouble(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NormalizedVectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NormalizedVectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NormalizedVectorSumAgg =
    copy(emb = newChildren(0), nsq = newChildren(1))
}
