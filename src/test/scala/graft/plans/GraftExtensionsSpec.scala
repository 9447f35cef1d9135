package graft.plans

import graft.SparkSpec

/** The custom expressions must be reachable from plain SQL (statement
  * pipelines), with identical semantics to the DataFrame API path. */
class GraftExtensionsSpec extends SparkSpec {

  test("vector functions callable from SQL, bit-identical to DataFrame path") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "l2_norm_sq(array(3.0D, 4.0D)) AS n").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
  }

  test("sketch functions callable from SQL") {
    val r = spark.sql(
      "SELECT size(minhash_sig(array('a','b','c'), 16)) AS k, " +
        "simhash64(array('x','y')) AS sh, " +
        "bit_and_count(array(7L), array(5L)) AS pc, " +
        "size(word_shingles(array('a','b','c'), 2)) AS ns").head()
    assert(r.getInt(0) == 16)
    assert(r.getInt(3) == 2)
    assert(r.getLong(2) == 2) // popcount(7 & 5) = popcount(101) = 2
  }

  test("split_frames generator usable in a SQL lateral view") {
    val rows = spark.sql(
      "SELECT frame_idx, octet_length(frame) AS n FROM " +
        "(SELECT cast('abcdefghij' AS BINARY) AS p) " +
        "LATERAL VIEW split_frames(p, 4, 1) t AS frame_idx, frame")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toList
    assert(rows == List((0, 4), (1, 4), (2, 2)))
  }

  test("hyperplane_bits callable from SQL, matches the DataFrame path") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq.fill(8)(0.5))).toDF("id", "v")
    df.createOrReplaceTempView("hp_in")
    val sql = spark.sql(
      "SELECT hyperplane_bits(v, 8, 16, 42) AS bits FROM hp_in")
      .head().getSeq[Long](0)
    val api = df.select(graft.functions.hyperplaneBits(col("v"), 8, 16, 42L).as("bits"))
      .head().getSeq[Long](0)
    assert(sql == api && sql.nonEmpty)
  }

  test("confluent encode/decode round-trips from SQL") {
    val schema =
      """{"type":"record","name":"E","fields":[{"name":"id","type":"long"},{"name":"tag","type":"string"}]}"""
    val r = spark.sql(
      s"SELECT confluent_decode(confluent_encode(named_struct('id', 42L, 'tag', 'x'), '$schema', 7), '$schema') AS v")
      .select("v.id", "v.tag").head()
    assert(r.getLong(0) == 42L && r.getString(1) == "x")
  }
}
