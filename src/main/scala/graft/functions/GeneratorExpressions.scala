package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types._

/** Custom table-generating (UDTF) expression — the Generator surface from
  * SURVEY.md §2.B, beyond the built-in explode family.
  *
  * Splits a binary payload into fixed-size frames, keeping every
  * `stride`-th: one input row → rows of (frame_idx, frame). This replaces
  * the round-1 transform(sequence)+posexplode composition in the
  * multimodal path with a single-pass generator: no intermediate array
  * materialization of all frames before the explode (for a 1 GiB video
  * payload and 64 KiB frames the array form held ~16k slices in memory
  * per row; the generator streams them). */
case class SplitFramesExpr(child: Expression, frameBytes: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(frameBytes > 0, "frameBytes must be positive")
  require(stride > 0, "stride must be positive")

  override def elementSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"split_frames needs binary, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val payload = v.asInstanceOf[Array[Byte]]
    // LONG ceil-div: the Int form overflows for frameBytes near
    // Int.MaxValue (the "whole payload in one frame" call), wrapping
    // negative and silently emitting zero frames
    val nFrames = ((payload.length.toLong + frameBytes - 1) / frameBytes).toInt
    Iterator.range(0, nFrames, stride).map { i =>
      val start = i * frameBytes
      val end = math.min(start.toLong + frameBytes, payload.length.toLong).toInt
      InternalRow(i, java.util.Arrays.copyOfRange(payload, start, end))
    }
  }

  override def prettyName: String = "split_frames"

  override protected def withNewChildInternal(newChild: Expression): SplitFramesExpr =
    copy(child = newChild)
}
