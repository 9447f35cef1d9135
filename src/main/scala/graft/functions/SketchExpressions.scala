package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row sketch expressions for near-duplicate detection.
  *
  * Design: signature/sketch computation is embarrassingly per-row, so these
  * expressions remove the round-1 explode→groupBy shuffles entirely — a
  * document's MinHash signature, SimHash, or hyperplane sign bits are
  * computed in one pass over its token/shingle/embedding array. They run
  * once per *input row* (not per candidate pair), so `CodegenFallback` is
  * acceptable; the per-PAIR hot path ([[BitAndCountExpr]], and the vector
  * expressions in VectorExpressions.scala) is fully codegen'd.
  *
  * All hashing is the same xxhash64 core Spark's `xxhash64` uses
  * (org.apache.spark.sql.catalyst.expressions.XXH64), seeded per hash
  * function — deterministic across runs, JVMs and cluster layouts.
  */

/** Distinct word n-gram shingles of a string-array (token) column, joined
  * by a single space, first-occurrence order — one pass per row.
  *
  * Replaces the round-1 `transform(sequence(...), i -> concat_ws(" ",
  * element_at(toks, i+1), ...))` formulation: interpreted higher-order
  * functions re-evaluate non-lambda-variable subtrees per ELEMENT, so with
  * `toks = filter(split(text))` inlined, every shingle re-ran the regex
  * split of the whole document (~100× per row — measured 7.8 s just to
  * build shingle arrays for 5 000 docs at sf0.1). Callers pass the token
  * array; it is evaluated exactly once per row here. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](nTok)
    var i = 0
    // null tokens become empty strings: UTF8String.concat propagates null,
    // and a null shingle inside a containsNull=false output corrupts
    // downstream UnsafeRow writes
    while (i < nTok) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    i = 0
    while (i <= nTok - n) {
      var sh = toks(i)
      var k = 1
      while (k < n) { sh = UTF8String.concat(sh, space, toks(i + k)); k += 1 }
      seen.add(sh)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** MinHash signature of a string-array column: element i of the result is
  * min over the array of xxh64(value, seed=i). Empty/null arrays → null. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1, "numHashes must be >= 1 (0 would make every " +
    "band key identical, degrading LSH to the full O(n²) pair set)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // returns null for empty arrays regardless of child nullability — the
  // inherited child.nullable would let the optimizer drop isNotNull
  // filters (or codegen unbox a null) on non-nullable inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null elements hash as the empty string (consistent across the
      // interpreted and unsafe paths — getUTF8String on a null slot NPEs
      // on GenericArrayData but silently reads garbage on UnsafeArrayData)
      val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashUTF8String(s, k.toLong)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a string-array column (token multiset): per bit,
  * majority vote of the tokens' xxh64 bits; bit set iff vote > 0.
  * Empty/null arrays → null. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  // empty arrays → null regardless of child nullability (see MinHashSigExpr)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      val h = XXH64.hashUTF8String(s, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Sign bits of `numPlanes` random-hyperplane projections of a numeric
  * array, bit-packed little-endian into array<long> of ceil(numPlanes/64)
  * words. Hyperplanes are Gaussian, generated deterministically from
  * (seed, dim) — data-independent, identical on every executor. */
case class RandomHyperplaneBitsExpr(child: Expression, dim: Int, numPlanes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "random_hyperplane_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpr.checkArray(child, "input")
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  // flat [plane][component] matrix; lazy + transient so it regenerates
  // after serialization to executors instead of shipping ~dim*planes*8B
  @transient private lazy val planes: Array[Double] = {
    val rng = new java.util.Random(seed)
    Array.fill(numPlanes * dim)(rng.nextGaussian())
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = VectorExpr.elemType(child)
    val n = math.min(arr.numElements(), dim)
    val words = new Array[Long]((numPlanes + 63) / 64)
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      var i = 0
      val off = p * dim
      while (i < n) { acc += planes(off + i) * VectorExpr.get(arr, t, i); i += 1 }
      if (acc >= 0) words(p / 64) |= (1L << (p % 64))
      p += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(newChild: Expression): RandomHyperplaneBitsExpr =
    copy(child = newChild)
}

/** Bit-packed set bitmap: from an array of non-negative int ids (< nBits)
  * to array<long> of exactly ceil(nBits/64) words. Used with a dense
  * dictionary so set intersection becomes AND+popcount. */
case class BitmapFromIntsExpr(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_from_ints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitmap_from_ints needs array<int|long>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = VectorExpr.elemType(child)
    val words = new Array[Long]((nBits + 63) / 64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // range-check as LONG first: narrowing before the check would wrap
      // out-of-int-range ids into valid range and set a spurious bit
      val idL = t match {
        case LongType => arr.getLong(i)
        case IntegerType => arr.getInt(i).toLong
      }
      if (idL >= 0 && idL < nBits) {
        val id = idL.toInt
        words(id / 64) |= (1L << (id % 64))
      }
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(newChild: Expression): BitmapFromIntsExpr =
    copy(child = newChild)
}

/** popcount(a AND b) over two bit-packed array<long> columns — the
  * candidate-pair hot path of bitmap set intersection, fully codegen'd
  * (runs O(n²) times in an all-pairs join; a tight primitive loop with
  * Long.bitCount stays inside whole-stage codegen). */
case class BitAndCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_and_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bit_and_count needs two array<long>, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitAndCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED string arrays (two-pointer merge) —
  * the exact-verify hot path of the prefix-filtered Jaccard join
  * (graft.operators.Dedup.jaccardPrefixPairs). Unlike the bitmap
  * popcount ([[BitAndCountExpr]]) it needs no dense dictionary and no
  * V-sized structure, so it works at unbounded vocabulary; cost is
  * O(|A| + |B|) string compares per CANDIDATE pair (candidates are the
  * few prefix-sharing pairs, never n²). Inputs must be sorted ascending
  * (binary UTF8 order — `sort_array` produces exactly this) and
  * duplicate-free; both hold for the per-doc distinct-shingle arrays. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two array<string>, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { acc += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $na && $j < $nb) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $acc++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}
