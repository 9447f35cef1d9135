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

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(l2NormSq(a))

  /** Cosine similarity between two numeric array columns.
    * Matches DuckDB's list_cosine_similarity: dot(a,b)/(|a|*|b|). */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Whitespace tokenization; trims empties produced by leading blanks. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles of a token array column (distinct set).
    * `transform(sequence(...))` stays inside codegen — no UDF. */
  def wordShingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(0), size(toks) - n)
    array_distinct(
      when(size(toks) >= n,
        transform(idx, i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
        .otherwise(typedLit(Seq.empty[String])))
  }
}
