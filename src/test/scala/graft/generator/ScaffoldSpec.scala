package graft.generator

import java.nio.file.Files

import graft.SparkSpec
import graft.runner.GraftRunner

/** init → run: the scaffolded project must execute end-to-end through the
  * orchestrator (reference: cmd/init_e2e_test.go runs real runInit and
  * asserts generated schemas/DDL; here we go one further and run it). */
class ScaffoldSpec extends SparkSpec {

  test("init emits a complete project and GraftRunner executes it") {
    val dir = Files.createTempDirectory("graft-init")
    Scaffold.init(dir, "demo")
    // structure
    assert(Files.exists(dir.resolve("schemas/input.avsc")))
    assert(Files.exists(dir.resolve("schemas/output_result.avsc")))
    assert(Files.exists(dir.resolve("sql/01_create_source_table.sql")))
    assert(Files.exists(dir.resolve("sql/02_create_output_table.sql")))
    assert(Files.exists(dir.resolve("sql/03_create_processing.sql")))
    assert(Files.exists(dir.resolve("graft.yaml")))
    assert(Files.readString(dir.resolve("README.md")).contains("demo"))
    // the generated DDL round-trips through the schema subsystem
    val schema = graft.avro.AvroSchemas.parse(Files.readString(dir.resolve("schemas/input.avsc")))
    assert(schema.structType.fieldNames.toSeq ==
      Seq("event_id", "user_id", "event_type", "value", "ts"))
    // and the whole project runs
    val res = GraftRunner.run(spark, GraftRunner.Config(
      projectDir = dir,
      runDir = Files.createTempDirectory("graft-init-run"),
      messageRate = 25, durationMs = 2000, generateReport = false))
    assert(res.produced == 50)
    assert(res.outputRows == 50)
    assert(res.status == "SUCCESS")
  }

  test("initFromCsv profiles the data and emits a filesystem source") {
    val csv = Files.createTempFile("graft-in", ".csv")
    Files.writeString(csv,
      "id,name,active,score\n1,Alice,true,10.5\n2,Bob,false,11.0\n")
    val dir = Files.createTempDirectory("graft-init-csv")
    Scaffold.initFromCsv(dir, "csvdemo", csv)
    val ddl = Files.readString(dir.resolve("sql/01_create_source_table.sql"))
    assert(ddl.contains("'connector' = 'filesystem'"))
    assert(ddl.contains("'csv.ignore-parse-errors' = 'true'"))
    assert(Files.exists(dir.resolve("data").resolve(csv.getFileName)))
    assert(GraftRunner.isCsvMode(graft.statements.Statements.load(dir.resolve("sql"))))
    // inferred schema reached the avsc (lattice: int/string/boolean/double)
    val schema = graft.avro.AvroSchemas.parse(Files.readString(dir.resolve("schemas/input.avsc")))
    import org.apache.spark.sql.types._
    assert(schema.structType.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", IntegerType), ("name", StringType),
        ("active", BooleanType), ("score", DoubleType)))
    assert(Files.readString(dir.resolve("analysis.md")).contains("| id | int |"))
  }

  test("kafka DDL synthesis matches the reference template shape") {
    val schema = graft.avro.AvroSchemas.parse(
      """{"type":"record","name":"E","fields":[
        |{"name":"id","type":"string"},{"name":"v","type":"double"}]}""".stripMargin)
    val ddl = Ddl.kafkaSourceTable("input_events", schema)
    assert(ddl.contains("CREATE TABLE input_events"))
    assert(ddl.contains("id STRING"))
    assert(ddl.contains("v DOUBLE"))
    assert(ddl.contains("'topic' = '${INPUT_TOPIC}'"))
    assert(ddl.contains("'scan.startup.mode' = 'earliest-offset'"))
    assert(ddl.contains("'format' = 'avro-confluent'"))
  }

  test("field validator flags missing columns and nulls (consumer A18)") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("e1", Some("u1"), "click"), ("e2", None, "view"))
      .toDF("event_id", "user_id", "event_type")
    val violations = FieldValidator.validate(df)
    assert(violations.exists(v => v.column == "ts" && v.problem == "missing column"))
    assert(violations.exists(v => v.column == "user_id" && v.problem == "null values" && v.rows == 1))
    val clean = Seq(("e1", "u1", "click", new java.sql.Timestamp(0L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(FieldValidator.validate(clean).isEmpty)
  }
}
