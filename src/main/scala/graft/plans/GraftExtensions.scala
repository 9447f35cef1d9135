package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: makes the graft custom expressions
  * first-class SQL functions, so every operator is reachable from plain
  * `spark.sql` pipelines (the statement registry / GraftRunner path), not
  * only the DataFrame API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)` (GraftSession does the
  * former). Catalyst sees the same expression classes either way — SQL
  * use keeps codegen and oracle-exact semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "dot_product", "sequential-fold dot product of two numeric arrays",
      args => DotProductExpr(args(0), args(1)), arity = 2)
    register(ext, "l2_norm_sq", "sequential-fold squared L2 norm of a numeric array",
      args => L2NormSqExpr(args(0)), arity = 1)
    register(ext, "word_shingles", "distinct word n-gram shingles of a token array",
      args => WordShinglesExpr(args(0), intArg(args(1), "n")), arity = 2)
    register(ext, "minhash_sig", "MinHash signature (array<long> of k seeded minima)",
      args => MinHashSigExpr(args(0), intArg(args(1), "k")), arity = 2)
    register(ext, "simhash64", "64-bit SimHash of a token array",
      args => SimHash64Expr(args(0)), arity = 1)
    register(ext, "bitmap_from_ints", "dense-id set to bit-packed bitmap",
      args => BitmapFromIntsExpr(args(0), intArg(args(1), "nBits")), arity = 2)
    register(ext, "bit_and_count", "popcount(a AND b) over bit-packed bitmaps",
      args => BitAndCountExpr(args(0), args(1)), arity = 2)
    register(ext, "hyperplane_bits", "bit-packed random-hyperplane sign bits of an embedding",
      args => RandomHyperplaneBitsExpr(args(0), intArg(args(1), "dim"),
        intArg(args(2), "numPlanes"), longArg(args(3), "seed")), arity = 4)
    register(ext, "split_frames", "split binary payload into strided fixed-size frames",
      args => SplitFramesExpr(args(0), intArg(args(1), "frameBytes"), intArg(args(2), "stride")),
      arity = 3)
    register(ext, "confluent_decode", "decode Confluent-framed AVRO binary into a struct",
      args => graft.avro.ConfluentDecodeExpr(args(0), stringArg(args(1), "schemaJson")), arity = 2)
    register(ext, "confluent_encode", "encode a struct as Confluent-framed AVRO binary",
      args => graft.avro.ConfluentEncodeExpr(args(0), stringArg(args(1), "schemaJson"),
        intArg(args(2), "schemaId")), arity = 3)
  }

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
                       builder: Seq[Expression] => Expression, arity: Int): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
        builder(args)
      }))

  /** Scalar parameters arrive as literal expressions in SQL calls. */
  private def intArg(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Full-width long literal (intArg would silently truncate a BIGINT
    * seed and diverge from the DataFrame API). */
  private def longArg(e: Expression, name: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def stringArg(e: Expression, name: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }
}
