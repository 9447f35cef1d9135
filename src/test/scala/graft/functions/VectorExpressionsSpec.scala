package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen'd vector expressions must match a plain Scala sequential
  * fold bit-for-bit (that fold order is the oracle-parity contract). */
class VectorExpressionsSpec extends SparkSpec {

  private def refDot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def refNormSq(a: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * a(i); i += 1 }
    acc
  }

  test("dot product and norm match the scala sequential fold exactly (seeded cases)") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(7)
    val cases = (1 to 40).map { _ =>
      val n = 1 + rng.nextInt(64)
      (List.fill(n)(rng.nextDouble() * 20 - 10), List.fill(n)(rng.nextDouble() * 20 - 10))
    }
    val rows = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        dotProduct(col("a"), col("b")).as("dot"),
        l2NormSq(col("a")).as("nsq"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](0)
      val b = r.getSeq[Double](1)
      assert(r.getDouble(2) == refDot(a, b))
      assert(r.getDouble(3) == refNormSq(a))
    }
  }

  test("float arrays are widened per element before multiply") {
    val sp = spark
    import sp.implicits._
    val a = Seq(0.1f, 0.25f, -3.5f)
    val d = Seq((a, a)).toDF("a", "b")
      .select(dotProduct(col("a"), col("b"))).head().getDouble(0)
    val expect = refDot(a.map(_.toDouble), a.map(_.toDouble))
    assert(d == expect)
  }

  test("null input gives null, not a crash") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(dotProduct(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("cosineSim matches dot/(sqrt*sqrt) composition") {
    val sp = spark
    import sp.implicits._
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(-1.0, 0.5, 2.0)
    val got = Seq((a, b)).toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).head().getDouble(0)
    val expect = refDot(a, b) / (math.sqrt(refNormSq(a)) * math.sqrt(refNormSq(b)))
    assert(got == expect)
  }

  test("interpreted path (eval) agrees with the reference fold") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val arr = new GenericArrayData(Array(1.5, -2.0, 4.25))
    val lit = Literal(arr, ArrayType(DoubleType))
    val dot = DotProductExpr(lit, lit).eval(null).asInstanceOf[Double]
    assert(dot == refDot(Seq(1.5, -2.0, 4.25), Seq(1.5, -2.0, 4.25)))
    val nsq = L2NormSqExpr(lit).eval(null).asInstanceOf[Double]
    assert(nsq == refNormSq(Seq(1.5, -2.0, 4.25)))
  }
}
