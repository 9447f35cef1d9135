package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** BloomMightContainExpr: the decontamination prefilter sketch. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def strings(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"$tag-shingle-$i")

  test("no false negatives, and false positives stay near the configured fpp") {
    val members = strings(5000, "in")
    val bloom = members.toDF("s").stat.bloomFilter("s", 5000, 0.01)

    val probed = members.toDF("s")
      .filter(bloomMightContain(col("s"), bloom)).count()
    assert(probed == 5000, "a Bloom filter must never drop a member")

    val out = strings(20000, "out").toDF("s")
      .filter(bloomMightContain(col("s"), bloom)).count()
    // 1% nominal; allow generous slack — the property under test is
    // "a small trickle", not the exact rate
    assert(out < 20000 * 0.05, s"false-positive count $out way above fpp")
  }

  test("interpreted eval agrees with the codegen'd filter path") {
    val members = strings(100, "m")
    val bloom = members.toDF("s").stat.bloomFilter("s", 100, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val bytes = bos.toByteArray

    val probes = members ++ strings(200, "q")
    val interp = probes.map { s =>
      BloomMightContainExpr(Literal(UTF8String.fromString(s)), bytes)
        .eval(null).asInstanceOf[Boolean]
    }
    val codegen = probes.toDF("s")
      .select(bloomMightContain(col("s"), bloom).as("hit"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(interp == codegen)
  }

  test("null input probes to null, not false") {
    val bloom = strings(10, "x").toDF("s").stat.bloomFilter("s", 10, 0.01)
    val got = Seq(Some("x-shingle-1"), None).toDF("s")
      .select(bloomMightContain(col("s"), bloom).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got(0) == true && got(1) == null)
  }

  test("bloom prefilter + exact confirm equals the plain exact join") {
    // adversarial overlap: some members shared, decoys crafted to tempt
    // false positives into the answer (they must die in the confirm join)
    val corpus = (0L until 2000L).map(i => (i, s"tok-${i % 300}")).toDF("id", "s")
    val evalSet = (0 until 120).map(i => s"tok-$i").toDF("s").distinct()
    val bloom = evalSet.stat.bloomFilter("s", 120, 0.01)

    val exact = corpus.join(evalSet, Seq("s"), "left_semi")
      .select("id").distinct().collect().map(_.getLong(0)).sorted
    val prefiltered = corpus.filter(bloomMightContain(col("s"), bloom))
      .join(evalSet, Seq("s"), "left_semi")
      .select("id").distinct().collect().map(_.getLong(0)).sorted
    assert(prefiltered.sameElements(exact),
      "the sketch may only prune join input, never change the answer")
  }
}
