package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level functions for the graft engine.
  *
  * No Scala UDFs anywhere: string/token helpers compose built-in Catalyst
  * expressions, and the vector-math hot path is backed by custom codegen'd
  * expressions ([[DotProductExpr]], [[L2NormSqExpr]]) so all-pairs similarity
  * joins stay inside whole-stage codegen (the built-in higher-order array
  * functions are CodegenFallback and were the round-1 bench bottleneck).
  *
  * Vector folds are sequential left-folds, which makes the floating point
  * summation order deterministic (and equal to a single-threaded engine's
  * evaluation order) — required for oracle comparisons.
  */
package object functions {

  import org.apache.spark.sql.graftglue.Glue.{toColumn, toExpr}

  /** Dot product of two numeric array columns, accumulated in Double. */
  def dotProduct(a: Column, b: Column): Column =
    toColumn(DotProductExpr(toExpr(a), toExpr(b)))

  /** Squared L2 norm of a numeric array column. */
  def l2NormSq(a: Column): Column =
    toColumn(L2NormSqExpr(toExpr(a)))

  /** Per-row MinHash signature (array<long> of length k) of a string-array
    * column — no shuffle; see SketchExpressions.scala. */
  def minhashSig(shingles: Column, k: Int): Column =
    toColumn(MinHashSigExpr(toExpr(shingles), k))

  /** Per-row 64-bit SimHash of a token-array column. */
  def simhash64(toks: Column): Column =
    toColumn(SimHash64Expr(toExpr(toks)))

  /** Bit-packed random-hyperplane sign bits of an embedding column. */
  def hyperplaneBits(emb: Column, dim: Int, numPlanes: Int, seed: Long): Column =
    toColumn(RandomHyperplaneBitsExpr(toExpr(emb), dim, numPlanes, seed))

  /** Top-`probes` centroid ids for an embedding column by dot-product rank
    * against a (small, unit-normalized) driver-side centroid matrix. */
  def ivfAssign(emb: Column, centroids: Seq[Seq[Double]], probes: Int): Column =
    toColumn(IvfAssignExpr(toExpr(emb), centroids, probes))

  /** Ordered BPE merge-list application over a symbol-array column —
    * one tight per-row loop, the merge list in the expression object
    * (see [[BpeApplyMergesExpr]] for the equivalence contract with a
    * chained [[graft.operators.Bpe.mergeAdjacent]] fold). */
  def bpeApplyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeApplyMergesExpr(toExpr(syms), merges))

  /** Max dot product of an embedding column against a driver-side
    * centroid matrix — the farthest-point init's step-shape-invariant
    * scan expression (see [[MaxDotExpr]] for the bit-equality contract
    * with `greatest` over per-centroid [[DotProductExpr]]s). */
  def maxCentroidDot(emb: Column, centroids: Seq[Seq[Double]]): Column =
    toColumn(MaxDotExpr(toExpr(emb), centroids))

  /** Dense-id set → bit-packed bitmap (array<long>, ceil(nBits/64) words). */
  def bitmapFromInts(ids: Column, nBits: Int): Column =
    toColumn(BitmapFromIntsExpr(toExpr(ids), nBits))

  /** AGGREGATE: elementwise sum of row-normalized numeric vectors
    * (emb / sqrt(nsq), first `dim` slots) — the Lloyd per-(cell, dim)
    * fold; see [[NormalizedVectorSumAgg]] for the summation-order
    * contract. */
  def normalizedVectorSum(emb: Column, nsq: Column, dim: Int): Column =
    toColumn(NormalizedVectorSumAgg(toExpr(emb), toExpr(nsq), dim)
      .toAggregateExpression())

  /** Unicode normalization of a string column (`java.text.Normalizer`):
    * form ∈ NFC|NFD|NFKC|NFKD. Codegen'd; already-normalized rows (all
    * of ASCII) allocate nothing. The opt-in behind the dedup canonical
    * forms' `unicodeForm` parameters. */
  def unicodeNormalize(c: Column, form: String): Column =
    toColumn(UnicodeNormalizeExpr(toExpr(c), form))

  /** Apply [[unicodeNormalize]] when a form is given; identity otherwise —
    * the shared shape of the operators' `unicodeForm` parameters. */
  def unicodeNormalizeOpt(c: Column, form: Option[String]): Column =
    form.fold(c)(unicodeNormalize(c, _))

  /** popcount(a AND b) of two bit-packed bitmaps (codegen'd pair hot path). */
  def bitAndCount(a: Column, b: Column): Column =
    toColumn(BitAndCountExpr(toExpr(a), toExpr(b)))

  /** Intersection size of two sorted, duplicate-free string-array columns
    * (codegen'd two-pointer merge — the prefix-join verify hot path). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    toColumn(SortedIntersectCountExpr(toExpr(a), toExpr(b)))

  /** Pushdown barrier: identity on the value, but a Filter containing it
    * is never pushed into a join condition or through a projection — pins
    * expensive predicates above cheap pair-join conditions (see
    * [[EvalBarrierExpr]]). */
  def evalBarrier(c: Column): Column =
    toColumn(EvalBarrierExpr(toExpr(c)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(l2NormSq(a))

  /** Cosine similarity between two numeric array columns.
    * Matches DuckDB's list_cosine_similarity: dot(a,b)/(|a|*|b|). */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Bloom-filter membership probe of a string column — `true` may be a
    * false positive (rate = the builder's fpp), `false` is definitive.
    * Prefilter only; compose with an exact confirm join (see
    * [[BloomMightContainExpr]]). */
  def bloomMightContain(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    toColumn(BloomMightContainExpr(toExpr(c), bos.toByteArray))
  }

  /** PQ codes (array<int> of length m) of a numeric-array column against
    * per-subspace codebooks `m × ksub × dsub` (see [[PqEncodeExpr]]). */
  def pqEncode(emb: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    toColumn(PqEncodeExpr(toExpr(emb),
      codebooks.flatten.flatten.toArray, m, ksub, dsub))
  }

  /** ADC score of a PQ code column against a query's flattened m×ksub
    * lookup table (see [[PqAdcExpr]]). */
  def pqAdc(codes: Column, lut: Array[Double], ksub: Int): Column =
    toColumn(PqAdcExpr(toExpr(codes), lut, ksub))

  /** Whitespace tokenization; trims empties produced by leading blanks. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles of a token array column (distinct set,
    * first-occurrence order). Native one-pass expression — see
    * [[WordShinglesExpr]] for why the higher-order-function formulation
    * was quadratic. */
  def wordShingles(toks: Column, n: Int): Column =
    toColumn(WordShinglesExpr(toExpr(toks), n))

  /** Winnowing fingerprint selection over a normalized text column, per
    * row: array<struct<pos,fp>> when `posMode`, else the distinct fp
    * strings. One-pass expression — see [[WinnowSelectExpr]] for the
    * exact-equivalence contract with the relational window formulation
    * it replaces (r14). */
  def winnowSelect(text: Column, k: Int, w: Int, posMode: Boolean): Column =
    toColumn(WinnowSelectExpr(toExpr(text), k, w, posMode))

  /** xxhash64 (seed 42) of every length-`gramLen` code-point window, one
    * pass per row — the repeated-span census key; callers must confirm
    * candidates exactly ([[GramHashesExpr]]). `prefixBytes` < 8
    * truncates the key. */
  def gramHashes(text: Column, gramLen: Int, prefixBytes: Int = 8): Column =
    toColumn(GramHashesExpr(toExpr(text), gramLen, prefixBytes))

  /** Full 16-byte md5 digest of every length-`gramLen` code-point window
    * — value-identical to unhex(md5(substr(text, p, gramLen))), one pass
    * per row ([[Md5GramPostingsExpr]]; the standing-census key). */
  def md5GramPostings(text: Column, gramLen: Int): Column =
    toColumn(Md5GramPostingsExpr(toExpr(text), gramLen))

  /** md5-prefix feature buckets of a string-array column, one pass per
    * row — value-identical to conv(substring(md5(f),1,8),16,10) % B per
    * element ([[Md5BucketsExpr]]; the DSIR bucket contract). */
  def md5Buckets(features: Column, numBuckets: Int): Column =
    toColumn(Md5BucketsExpr(toExpr(features), numBuckets))
}
