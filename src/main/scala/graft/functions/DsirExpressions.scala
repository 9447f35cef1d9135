package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass md5-prefix feature bucketing for DSIR
  * ([[graft.operators.Sampling.dsirSelect]]) — round 14.
  *
  * The DSIR contract pins the bucket function to the ENGINE-PORTABLE
  * `conv(substring(md5(f), 1, 8), 16, 10) % numBuckets` (DuckDB
  * recomputes it verbatim), so md5 per feature occurrence cannot go
  * away — but the round-9 formulation evaluated that chain as composed
  * Catalyst expressions INSIDE an interpreted `aggregate` lambda for
  * the scoring pass (md5 → 32-char hex string → substring → base-16
  * string parse, per feature, interpreted), and again per occurrence in
  * the two census aggregations. This expression computes the identical
  * value from the digest bytes directly: the first 8 hex chars of md5
  * ARE the first 4 digest bytes, so the bucket is
  * `(unsigned int of digest[0..3]) % numBuckets` — no hex encode, no
  * string parse, one MessageDigest pass per feature.
  *
  * Input: the per-row feature array (unigrams ++ bigrams). Output:
  * array<long> of bucket ids, order-preserving (the scoring fold and
  * the census explode both only need occurrences). Null feature slots
  * are impossible by construction (concat of tokens) — so a null slot
  * THROWS rather than silently hashing as something (ADVICE r14: the
  * replaced SQL `conv(substring(md5(f),1,8),16,10)` propagated null,
  * and a silent divergence from the documented oracle bucket contract
  * must surface, not score). */
case class Md5BucketsExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression with CodegenFallback {
  require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")

  override def prettyName: String = "md5_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_buckets needs array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = SpanGrams.digest.get()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalStateException(
        "md5_buckets: null feature slot — the DSIR feature arrays are " +
          "null-free by construction; a null here means the bucket " +
          "contract diverged from the oracle")
      val f = arr.getUTF8String(i)
      md.reset()
      val b = f.getBytes
      md.update(b, 0, b.length)
      val d = md.digest()
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(i) = u % numBuckets
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5BucketsExpr =
    copy(child = newChild)
}
