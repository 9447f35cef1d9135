package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {

  private lazy val vecs = {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(11)
    ((0 until 40).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian()))) :+
      (99L, Seq.fill(16)(0.0))) // zero vector must not NaN
      .toDF("id", "v")
  }

  test("int8 round trip: codes bounded, error bounded by scale/2") {
    val out = vecs
      .withColumn("scale", Quantize.int8Scale(col("v")))
      .withColumn("codes", Quantize.quantizeInt8(col("v"), col("scale")))
      .withColumn("deq", Quantize.dequantizeInt8(col("codes"), col("scale")))
      .select(col("id"), col("scale"),
        array_max(transform(col("codes"), c => abs(c))).as("max_code"),
        array_max(zip_with(col("v"), col("deq"), (a, b) => abs(a - b))).as("max_err"))
      .collect()
    assert(out.length == 41)
    out.foreach { r =>
      val scale = r.getDouble(1)
      assert(r.getByte(2) <= 127, s"code out of range for id ${r.getLong(0)}")
      assert(r.getDouble(3) <= scale / 2 + 1e-12,
        s"reconstruction error ${r.getDouble(3)} exceeds scale/2 ${scale / 2}")
    }
  }

  test("zero vector quantizes to all-zero codes with zero error") {
    val r = vecs.filter(col("id") === 99)
      .withColumn("scale", Quantize.int8Scale(col("v")))
      .withColumn("codes", Quantize.quantizeInt8(col("v"), col("scale")))
      .select(array_max(transform(col("codes"), c => abs(c))).as("mc"))
      .head()
    assert(r.getByte(0) == 0)
  }
}
