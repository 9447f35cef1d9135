package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-row gram posting expressions for the repeated-span
  * family ([[graft.operators.Dedup.removeRepeatedSpans]] /
  * [[graft.operators.Dedup.gramCensus]]) — round 14.
  *
  * The round-8 formulation derived per-character postings relationally:
  * `transform(sequence(1, m), p -> substr(text, p, L))` materialized a
  * fresh UTF8String copy per window and hashed each through
  * `unhex(md5(...))` — an MD5 digest plus a 32-char hex encode plus a
  * hex decode PER CORPUS CHARACTER, and the optimizer additionally
  * derived the whole posting subtree twice (the census branch and the
  * candidate-position branch never canonicalized equal once predicate
  * pushdown touched one of them — two full md5 passes in the committed
  * plan). These expressions walk the text's UTF-8 bytes once per ROW:
  * a code-point offset table (the same lead-byte stepping
  * UTF8String.substringSQL uses, so windows match `substr(text, p, L)`
  * byte-for-byte), then one hash per window over the byte range
  * in place — no substring copies, no hex round-trips.
  *
  * Two tiers, matching the two exactness contracts:
  *  - [[GramHashesExpr]]: xxhash64 (Spark's own XXH64 core, seed 42) of
  *    each window — the SYMMETRIC form's census key. 8 bytes, ~10×
  *    cheaper than md5, and NOT collision-free at 10¹⁴ grams — its
  *    caller must (and does) confirm candidates exactly, which
  *    removeRepeatedSpans performs on the candidate GRAM STRINGS
  *    themselves (string equality — no hash in the exactness argument
  *    at all, strictly stronger than the old 16-byte-md5-is-exact
  *    assumption). `prefixBytes` < 8 truncates the key to that many
  *    low-order bytes (the SubDocSpec pigeonhole-collision gate).
  *  - [[Md5GramPostingsExpr]]: the full 16-byte md5 digest of each
  *    window — value-identical to `unhex(md5(substr(text, p, L)))`, the
  *    INCREMENTAL form's standing-census key (Layout.spanGramCensus
  *    tables store these; a standing census cannot be re-confirmed
  *    against history text, so its key must stay collision-free). */
case class GramHashesExpr(child: Expression, gramLen: Int, prefixBytes: Int)
    extends UnaryExpression with CodegenFallback {
  require(gramLen >= 1, s"gramLen must be >= 1, got $gramLen")
  require(prefixBytes >= 1, s"prefixBytes must be >= 1, got $prefixBytes")

  override def prettyName: String = "gram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes needs string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val t = v.asInstanceOf[UTF8String]
    val bytes = t.getBytes
    val nChars = t.numChars()
    val m = nChars - gramLen + 1
    if (m < 1) return new GenericArrayData(Array.empty[Long])
    val off = SpanGrams.charOffsets(bytes, nChars)
    val mask = if (prefixBytes >= 8) -1L else (1L << (prefixBytes * 8)) - 1
    val out = new Array[Long](m)
    var p = 0
    while (p < m) {
      out(p) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + off(p),
        off(p + gramLen) - off(p), 42L) & mask
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

/** Full 16-byte md5 digests of every length-`gramLen` code-point window
  * — value-identical to `unhex(md5(substr(text, p, gramLen)))` for
  * p = 1..m, one pass per row. See the file scaladoc for the contract
  * split vs [[GramHashesExpr]]. */
case class Md5GramPostingsExpr(child: Expression, gramLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(gramLen >= 1, s"gramLen must be >= 1, got $gramLen")

  override def prettyName: String = "md5_gram_postings"
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_gram_postings needs string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val t = v.asInstanceOf[UTF8String]
    val bytes = t.getBytes
    val nChars = t.numChars()
    val m = nChars - gramLen + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val off = SpanGrams.charOffsets(bytes, nChars)
    val md = SpanGrams.digest.get()
    val out = new Array[Any](m)
    var p = 0
    while (p < m) {
      md.reset()
      md.update(bytes, off(p), off(p + gramLen) - off(p))
      out(p) = md.digest()
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5GramPostingsExpr =
    copy(child = newChild)
}

private[functions] object SpanGrams {
  /** Byte offset of each 1-based code point boundary: off(i) = start of
    * char i+1; off(nChars) = total bytes. The same lead-byte stepping
    * UTF8String navigates with. */
  def charOffsets(bytes: Array[Byte], nChars: Int): Array[Int] = {
    val off = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    val nBytes = bytes.length
    while (bi < nBytes) {
      off(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    off(nChars) = nBytes
    off
  }

  /** MessageDigest is stateful and not thread-safe; local-mode tasks
    * share expression instances across threads. */
  val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
