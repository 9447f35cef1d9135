package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a pre-built Bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter`, the sketch
  * `DataFrame.stat.bloomFilter` produces).
  *
  * Scale role (the decontamination prefilter): when a membership set is too
  * large to broadcast-HASH-JOIN as raw strings but its ~1.2-bytes-per-item
  * Bloom image still fits in a task binary, filtering the 100 TB scan with
  * `might_contain` first shrinks the exact confirm join's shuffle input to
  * the true matches plus an fpp-sized trickle of false positives. The
  * filter is row-local (no shuffle) and stays inside whole-stage codegen —
  * the serialized image ships once per task binary, like any literal.
  *
  * One-sided error: `false` is definitive, `true` needs the exact confirm
  * join. Callers must never emit bloom-positive rows as results directly —
  * compose as prefilter + exact join (see text_decontaminate_bloom).
  *
  * Hashing matches the builder: BloomFilterImpl.putString hashes the
  * UTF-8 bytes, so probing with the UTF8String's bytes is bit-identical
  * with zero String allocation per row.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // the probe itself is deterministic; fold only if the child is a literal
  // (inherited foldable = child.foldable is correct here)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs string, got ${t.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from both the interpreted and the generated path. */
  def mightContain(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(v: Any): Any =
    mightContain(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the expression (not the BloomFilter) so the lazily
    // deserialized sketch is shared by every row of the task
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.mightContain($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
