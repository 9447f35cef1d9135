package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Ports the reference's analyzer fixtures
  * (reference: internal/generator/csv_analyzer_test.go:9-66 over
  * testdata/simple.csv and numeric_widen.csv — fixture contents
  * reproduced from the published test data) plus the lattice quirks. */
class CsvAnalyzerSpec extends SparkSpec {

  private def csvFile(content: String): java.nio.file.Path = {
    val f = Files.createTempFile("graft-csv", ".csv")
    Files.writeString(f, content)
    f
  }

  test("simple.csv fixture: id int, name string, active boolean, score double, created_at timestamp") {
    val f = csvFile(
      """id,name,active,score,created_at
        |1,Alice,true,10.5,2024-12-31
        |2,Bob,false,11.0,2025-01-01 12:30:00
        |3,Charlie,true,,2025-01-02T08:15:10
        |""".stripMargin)
    val res = CsvAnalyzer.analyze(f)
    val types = res.columns.map(c => c.name -> c.inferredType).toMap
    assert(types == Map(
      "id" -> "int", "name" -> "string", "active" -> "boolean",
      // date first, then timestamps -> date escalates to timestamp
      "score" -> "double", "created_at" -> "timestamp"))
    assert(res.columns.find(_.name == "score").get.nullable) // empty cell
    assert(res.toMarkdown.nonEmpty)
  }

  test("numeric_widen.csv fixture: int32 overflow widens to long") {
    val f = csvFile("val\n1\n2\n3000000000\n4\n")
    val res = CsvAnalyzer.analyze(f)
    assert(res.columns.map(_.inferredType) == Seq("long"))
  }

  test("quirk: long column seeing 'true' degrades to string, not boolean") {
    val f = csvFile("v\n3000000000\ntrue\n")
    assert(CsvAnalyzer.analyze(f).columns.head.inferredType == "string")
  }

  test("quirk: all-0/1 column stays int (int parse wins over boolean)") {
    val f = csvFile("flag\n0\n1\n0\n")
    assert(CsvAnalyzer.analyze(f).columns.head.inferredType == "int")
  }

  test("boolean column with numeric evidence becomes double") {
    val f = csvFile("v\nyes\nno\n3.5\n")
    assert(CsvAnalyzer.analyze(f).columns.head.inferredType == "double")
  }

  test("all-null column finalizes as nullable string") {
    val f = csvFile("a,b\n,1\n,2\n")
    val res = CsvAnalyzer.analyze(f)
    val a = res.columns.head
    assert(a.inferredType == "string" && a.nullable)
    assert(res.columns(1).inferredType == "int")
  }

  test("date stays date; date then timestamp escalates") {
    val onlyDates = csvFile("d\n2024-01-02\n31/12/2024\n")
    assert(CsvAnalyzer.analyze(onlyDates).columns.head.inferredType == "date")
    val mixed = csvFile("d\n2024-01-02\n2024-01-02 10:00:00\n")
    assert(CsvAnalyzer.analyze(mixed).columns.head.inferredType == "timestamp")
  }

  test("quoted fields: embedded delimiters and doubled quotes") {
    val f = csvFile("name,desc\n\"Smith, John\",\"said \"\"hi\"\"\"\n")
    val res = CsvAnalyzer.analyze(f)
    assert(res.columns.map(_.samples.head) == Seq("Smith, John", "said \"hi\""))
  }

  test("headerless mode names columns col_N") {
    val f = csvFile("1,x\n2,y\n")
    val res = CsvAnalyzer.analyze(f, hasHeader = false)
    assert(res.columns.map(_.name) == Seq("col_1", "col_2"))
    assert(res.columns.map(_.inferredType) == Seq("int", "string"))
  }

  test("structType maps natively; toAvroJson keeps the reference's string simplification") {
    val f = csvFile("id,when\n1,2024-01-02 10:00:00\n")
    val res = CsvAnalyzer.analyze(f)
    assert(res.structType == StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("when", TimestampType, nullable = false))))
    val avro = graft.avro.AvroSchemas.parse(res.toAvroJson("demo"))
    assert(avro.name == "demo_input")
    val whenField = avro.structType.fields.find(_.name == "when").get
    assert(whenField.dataType == StringType) // reference keep-it-simple emission
  }

  test("CsvSource DROPMALFORMED drops unparseable rows like ignore-parse-errors") {
    val f = csvFile("id,score\n1,2.5\nnot_an_int,3.5\n3,4.5\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("score", DoubleType)))
    val rows = CsvSource.read(spark, f.toString, schema).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }
}
