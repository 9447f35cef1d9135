package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row winnowing fingerprint selection (Schleimer, Wilkerson, Aiken
  * 2003) — the whole gram → window-min → distinct pipeline of
  * [[graft.operators.Winnow.winnowFingerprints]] computed in ONE pass
  * over the document, per row.
  *
  * Replaces the round-6 relational formulation (explode one row per
  * gram, corpus-wide Exchange + Sort, per-document sliding `min` Window
  * over a 28-char composite string key, then a distinct): selection is
  * per-document by construction, so no gram row ever needs to leave its
  * document's row. The relational form shuffled EVERY gram of the corpus
  * (~30 bytes a row) twice — once into the window partitioning, once
  * into the distinct — to compute a value this expression emits directly
  * at ~2/(w+1) density. (r14; guide §2.4 "remove shuffles outright".)
  *
  * Exact-equivalence contract with the relational form (WinnowSpec gates
  * it row-for-row, and the text_winnow* oracle rows re-derive it in
  * DuckDB):
  *  - gram p (1-based, code-point positions) is the k-code-point window
  *    starting at p of the NORMALIZED text this expression is applied
  *    to; its fingerprint is the first 16 hex chars of md5(gram) — here
  *    computed as the first 8 digest bytes, compared as an UNSIGNED
  *    long (hex is fixed-width and monotone in unsigned byte value, so
  *    the orders are identical);
  *  - window s selects min over grams [s, min(s+w-1, m)] of the
  *    composite (fp ASC, pos DESC) — rightmost tie, implemented in the
  *    monotone deque by popping back elements whose key is >= the
  *    incoming key (the newer gram has the larger pos and wins ties);
  *  - windows run s = 1 .. max(m - w + 1, 1): a document with fewer
  *    than w grams contributes its single global minimum;
  *  - the emitted (pos, fp) set is distinct: the selected front of the
  *    deque is non-decreasing in pos, so dropping consecutive repeats
  *    is a full per-document distinct, and document id lives on the
  *    row, so per-document distinct IS the relational form's global
  *    distinct.
  *
  * Once-per-row CodegenFallback (the [[WordShinglesExpr]] precedent):
  * the per-gram hot loop is inside `nullSafeEval`, not per-row codegen.
  * md5 per gram is pinned by the cross-engine fingerprint contract and
  * stays the dominant per-byte cost; everything around it (substring
  * materialization, hex encode, composite-string building, the two
  * corpus-wide exchanges and the window sort) is removed.
  *
  * `posMode = false` emits the DISTINCT fingerprint strings only (the
  * [[graft.operators.Winnow.fingerprintSets]] projection) — positions
  * are dropped BEFORE the distinct, so the same fp selected at two
  * positions emits once. */
case class WinnowSelectExpr(child: Expression, k: Int, w: Int, posMode: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1, got $k")
  require(w >= 1, s"w must be >= 1, got $w")

  override def prettyName: String = "winnow_select"

  override def dataType: DataType =
    if (posMode)
      ArrayType(StructType(Seq(
        StructField("pos", LongType, nullable = false),
        StructField("fp", StringType, nullable = false))), containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_select needs string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val t = v.asInstanceOf[UTF8String]
    val bytes = t.getBytes
    // code-point offsets: off(i) = byte offset of 1-based char i+1; the
    // same lead-byte stepping UTF8String.substringSQL navigates with, so
    // gram byte ranges match substr(__t, p, k) exactly
    val nChars = t.numChars()
    val m = nChars - k + 1
    if (m < 1) return emptyResult
    val off = SpanGrams.charOffsets(bytes, nChars)
    val md = SpanGrams.digest.get()
    // monotone deque over (pos, key): ring buffers sized w
    val dqPos = new Array[Int](w + 1)
    val dqKey = new Array[Long](w + 1)
    var head = 0
    var tail = 0 // exclusive; size = tail - head (never exceeds w)
    // selected (pos, key) pairs, positions strictly increasing
    val selPos = new Array[Int](math.max(m - w + 1, 1))
    val selKey = new Array[Long](selPos.length)
    var nSel = 0
    var lastPos = -1
    var p = 1
    while (p <= m) {
      // key(p): first 8 md5 digest bytes of gram p as an unsigned long
      md.reset()
      md.update(bytes, off(p - 1), off(p - 1 + k) - off(p - 1))
      val d = md.digest()
      var key = 0L
      var i = 0
      while (i < 8) { key = (key << 8) | (d(i) & 0xffL); i += 1 }
      // rightmost tie: pop back while its key is >= the incoming key
      while (tail > head &&
        java.lang.Long.compareUnsigned(dqKey((tail - 1) % (w + 1)), key) >= 0)
        tail -= 1
      dqPos(tail % (w + 1)) = p
      dqKey(tail % (w + 1)) = key
      tail += 1
      val s = p - w + 1
      while (dqPos(head % (w + 1)) < s) head += 1
      if (p >= w) {
        val fp = dqPos(head % (w + 1))
        if (fp != lastPos) {
          selPos(nSel) = fp; selKey(nSel) = dqKey(head % (w + 1)); nSel += 1
          lastPos = fp
        }
      }
      p += 1
    }
    if (m < w) { // single window [1, m]: the global minimum
      selPos(0) = dqPos(head % (w + 1)); selKey(0) = dqKey(head % (w + 1))
      nSel = 1
    }
    if (posMode) {
      val out = new Array[Any](nSel)
      var i = 0
      while (i < nSel) {
        out(i) = new GenericInternalRow(
          Array[Any](selPos(i).toLong, hex16(selKey(i))))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // distinct fps: same fp may be selected at several positions
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < nSel) { seen.add(selKey(i)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = hex16(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  private def emptyResult: Any = new GenericArrayData(Array.empty[Any])

  /** 16 lowercase hex chars of the unsigned long — identical bytes to
    * substring(md5(gram), 1, 16). */
  private def hex16(key: Long): UTF8String = {
    val cs = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      val nib = ((key >>> ((15 - i) << 2)) & 0xfL).toInt
      cs(i) = (if (nib < 10) '0' + nib else 'a' + nib - 10).toByte
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelectExpr =
    copy(child = newChild)
}
