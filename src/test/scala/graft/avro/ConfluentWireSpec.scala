package graft.avro

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wire-format round-trip + framing validation
  * (reference: producer.go:425-447, consumer.go:219-241). */
class ConfluentWireSpec extends SparkSpec {

  private val schema =
    """{"type":"record","name":"Event","namespace":"graft.test","fields":[
      |  {"name":"event_id","type":"string"},
      |  {"name":"user_id","type":"long"},
      |  {"name":"amount","type":"double"},
      |  {"name":"flag","type":"boolean"},
      |  {"name":"note","type":["null","string"]},
      |  {"name":"tags","type":{"type":"array","items":"string"}},
      |  {"name":"attrs","type":{"type":"map","values":"int"}},
      |  {"name":"when","type":{"type":"long","logicalType":"timestamp-micros"}},
      |  {"name":"day","type":{"type":"int","logicalType":"date"}},
      |  {"name":"nested","type":{"type":"record","name":"Inner","fields":[
      |    {"name":"a","type":"int"},{"name":"b","type":"string"}]}}
      |]}""".stripMargin

  test("decode(encode(x)) == x over the full type matrix (seeded rows)") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(23)
    val rows = (1 to 50).map { i =>
      (s"e$i", rng.nextLong(), rng.nextDouble() * 100, rng.nextBoolean(),
        if (rng.nextBoolean()) Some(s"note$i") else None,
        Seq.fill(rng.nextInt(4))(s"t${rng.nextInt(10)}"),
        Map(s"k${i % 3}" -> rng.nextInt(100)),
        new Timestamp(1700000000000L + rng.nextInt(1000000).toLong),
        Date.valueOf("2026-01-01"),
        (rng.nextInt(50), s"inner$i"))
    }
    val df = rows.toDF("event_id", "user_id", "amount", "flag", "note",
      "tags", "attrs", "when", "day", "nested")
      .withColumn("nested", struct(col("nested._1").as("a"), col("nested._2").as("b")))

    val encoded = df.select(ConfluentWire.encode(
      struct(df.columns.map(col): _*), schema, schemaId = 7).as("wire"))
    val decoded = encoded.select(ConfluentWire.decode(col("wire"), schema).as("v"))
      .select("v.*")

    val orig = df.collect().map(_.toSeq).toSet
    val back = decoded.collect().map(_.toSeq).toSet
    assert(back == orig)
  }

  test("time-millis (int wire type) and collection timestamps round-trip") {
    val sp = spark
    import sp.implicits._
    // time-millis maps to Spark LongType but its WIRE type is int; the
    // timestamps array exercises logical-type handling inside collections,
    // where Catalyst has no per-element metadata and the Avro schema is
    // the only source of truth
    val s =
      """{"type":"record","name":"T","namespace":"g","fields":[
        |  {"name":"id","type":"string"},
        |  {"name":"t_ms","type":{"type":"int","logicalType":"time-millis"}},
        |  {"name":"stamps","type":{"type":"array",
        |    "items":{"type":"long","logicalType":"timestamp-millis"}}}
        |]}""".stripMargin
    val rows = Seq(
      ("a", 13L * 3600 * 1000 + 123, Seq(new Timestamp(1700000000000L))),
      ("b", 0L, Seq(new Timestamp(1700000001000L), new Timestamp(1700000002000L))),
      ("c", 86399999L, Seq.empty[Timestamp]))
    val df = rows.toDF("id", "t_ms", "stamps")
    val back = df
      .select(ConfluentWire.encode(struct(col("id"), col("t_ms"), col("stamps")), s, 3).as("w"))
      .select(ConfluentWire.decode(col("w"), s).as("v")).select("v.*")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Timestamp](2))).toSet
    assert(back == rows.toSet)
  }

  test("frame layout: magic byte 0x00 + big-endian schema id") {
    val sp = spark
    import sp.implicits._
    val one = Seq(("e1", 1L, 1.0, true, Option.empty[String], Seq.empty[String],
      Map.empty[String, Int], new Timestamp(0L), Date.valueOf("1970-01-01"), (1, "x")))
      .toDF("event_id", "user_id", "amount", "flag", "note", "tags", "attrs", "when", "day", "nested")
      .withColumn("nested", struct(col("nested._1").as("a"), col("nested._2").as("b")))
    val bytes = one.select(ConfluentWire.encode(
      struct(one.columns.map(col): _*), schema, schemaId = 0x01020304).as("wire"))
      .head().getAs[Array[Byte]](0)
    assert(bytes(0) == 0x00)
    assert(ConfluentWire.isValidFrame(bytes))
    assert(ConfluentWire.schemaId(bytes) == 0x01020304)
  }

  test("malformed frames decode to null (short, bad magic, garbage body)") {
    val sp = spark
    import sp.implicits._
    val bad = Seq(
      Array[Byte](0x00, 0x00),                        // too short
      Array[Byte](0x01, 0, 0, 0, 1, 2, 3),            // wrong magic byte
      Array[Byte](0x00, 0, 0, 0, 1, 0x7f, 0x7f, 0x7f) // undecodable body
    ).toDF("wire")
    val out = bad.select(ConfluentWire.decode(col("wire"), schema).as("v")).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
