package graft.avro

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Type-matrix suite mirroring the reference's tested mapper
  * (reference: internal/generator/generator_types_test.go:6-46), with the
  * SURVEY.md §1.2 documented improvements (native nested types). */
class AvroSchemasSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def dt(json: String): (DataType, Boolean) = {
    val (d, n, _) = AvroSchemas.toDataType(mapper.readTree(json))
    (d, n)
  }

  test("primitive matrix matches the reference mapping (retargeted at Spark)") {
    assert(dt("\"string\"") == (StringType, false))
    assert(dt("\"int\"") == (IntegerType, false))
    assert(dt("\"long\"") == (LongType, false))
    assert(dt("\"float\"") == (FloatType, false))
    assert(dt("\"double\"") == (DoubleType, false))
    assert(dt("\"boolean\"") == (BooleanType, false))
    assert(dt("\"bytes\"") == (BinaryType, false))
    // unknown primitive degrades to string (reference default branch)
    assert(dt("\"foobar\"") == (StringType, false))
  }

  test("unions pick first non-null branch and become nullable") {
    assert(dt("""["null", "string"]""") == (StringType, true))
    assert(dt("""["null", "int"]""") == (IntegerType, true))
    assert(dt("""["null", {"type":"long","logicalType":"timestamp-millis"}]""")
      == (TimestampType, true))
  }

  test("logical types: date, timestamps, times") {
    assert(dt("""{"type":"int","logicalType":"date"}""") == (DateType, false))
    assert(dt("""{"type":"long","logicalType":"timestamp-millis"}""") == (TimestampType, false))
    assert(dt("""{"type":"long","logicalType":"timestamp-micros"}""") == (TimestampType, false))
    // no TIME type in Spark: long + metadata (SURVEY §1.2)
    assert(dt("""{"type":"long","logicalType":"time-micros"}""") == (LongType, false))
  }

  test("complex types: faithful instead of reference's STRING degradation") {
    assert(dt("""{"type":"array","items":"string"}""") == (ArrayType(StringType, false), false))
    assert(dt("""{"type":"map","values":"int"}""")
      == (MapType(StringType, IntegerType, false), false))
    assert(dt("""{"type":"enum","name":"E","symbols":["A","B"]}""") == (StringType, false))
    val (rec, _) = dt("""{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}""")
    assert(rec == StructType(Seq(StructField("x", IntegerType, nullable = false))))
  }

  test("validation mirrors the reference rules (schema.go:153-194)") {
    def err(json: String): String =
      intercept[IllegalArgumentException](AvroSchemas.parse(json)).getMessage
    assert(err("""{"type":"record","fields":[{"name":"a","type":"int"}]}""")
      .contains("must have a name"))
    assert(err("""{"name":"X"}""").contains("must have a type"))
    assert(err("""{"name":"X","type":"fixed"}""").contains("unsupported schema type"))
    assert(err("""{"name":"X","type":"record"}""").contains("must have fields"))
    assert(err("""{"name":"X","type":"record","fields":[
      {"name":"a","type":"int"},{"name":"a","type":"long"}]}""")
      .contains("duplicate field name: a"))
    assert(err("""not json at all""").contains("invalid JSON"))
  }

  test("schemaKey heuristic (schema.go:197-216)") {
    assert(AvroSchemas.schemaKey("input.avsc") == "input")
    assert(AvroSchemas.schemaKey("user_events.avsc") == "input")
    assert(AvroSchemas.schemaKey("Output_Result.json") == "output")
    assert(AvroSchemas.schemaKey("my-results.avsc") == "output")
    assert(AvroSchemas.schemaKey("dimension.avsc") == "dimension")
  }

  test("in-memory registry: get-or-create, versions, latest") {
    val reg = new InMemorySchemaRegistry
    val s1 = """{"type":"record","name":"A","fields":[{"name":"x","type":"int"}]}"""
    val s2 = """{"type":"record","name":"A","fields":[{"name":"x","type":"long"}]}"""
    val id1 = reg.register("t-value", s1)
    assert(reg.register("t-value", s1) == id1) // get-or-create reuses
    val id2 = reg.register("t-value", s2)
    assert(id2 != id1)
    assert(reg.latest("t-value").contains(id2 -> s2))
    assert(reg.getById(id1).contains(s1))
  }

  test("fromStructType -> parse round trip preserves the struct") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("scores", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("attrs", MapType(StringType, StringType, valueContainsNull = false), nullable = false)))
    val json = AvroSchemas.fromStructType("Rec", "graft.test", st)
    val back = AvroSchemas.parse(json).structType
    // compare names/types/nullability (metadata may differ)
    assert(back.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
      st.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
  }

  test("fromStructType names nested records by field path (Avro rejects duplicates)") {
    // two struct fields + a doubly-nested struct: a constant "_nested"
    // suffix emitted duplicate record names and Schema.Parser threw
    // "Can't redefine"
    val inner = StructType(Seq(StructField("x", IntegerType, nullable = false)))
    val deep = StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("more", inner, nullable = false)))
    val st = StructType(Seq(
      StructField("a", deep, nullable = false),
      StructField("b", inner, nullable = false),
      StructField("items", ArrayType(inner, containsNull = false), nullable = false)))
    val json = AvroSchemas.fromStructType("Rec", "graft.test", st)
    // the real Avro parser is the arbiter of name uniqueness
    new org.apache.avro.Schema.Parser().parse(json)
    val back = AvroSchemas.parse(json).structType
    assert(back.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
      st.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
  }
}
