package graft.generator

import java.nio.file.{Files, Path}

import graft.avro.AvroSchemas
import graft.sources.CsvAnalyzer

/** Project scaffolding — the `init` analog (reference:
  * internal/generator/generator.go:83-151, templates
  * internal/templates/manager.go:36-182): emits a runnable project with
  * the reference's 3-statement local shape (source table / output table /
  * continuous INSERT-SELECT), AVRO schemas, config and README. The
  * emitted project runs end-to-end through graft.runner.GraftRunner.
  *
  * `initFromCsv` is the `--input-csv` path (generator.go:154-248): profile
  * the CSV with the inference lattice, emit its AVRO schema and a
  * filesystem/CSV source table, and copy the data into `data/`.
  */
object Scaffold {

  private val defaultInputSchema =
    """{
      |  "type": "record",
      |  "name": "InputEvent",
      |  "namespace": "graft.generated",
      |  "fields": [
      |    {"name": "event_id", "type": "string"},
      |    {"name": "user_id", "type": "string"},
      |    {"name": "event_type", "type": "string"},
      |    {"name": "value", "type": "double"},
      |    {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}}
      |  ]
      |}""".stripMargin

  private val defaultOutputSchema =
    """{
      |  "type": "record",
      |  "name": "OutputResult",
      |  "namespace": "graft.generated",
      |  "fields": [
      |    {"name": "event_id", "type": "string"},
      |    {"name": "event_type", "type": "string"},
      |    {"name": "total", "type": "double"}
      |  ]
      |}""".stripMargin

  /** Default project: Kafka-shaped topics in and out. */
  def init(dir: Path, projectName: String): Unit = {
    val input = AvroSchemas.parse(defaultInputSchema)
    val output = AvroSchemas.parse(defaultOutputSchema)
    writeCommon(dir, projectName, defaultInputSchema, defaultOutputSchema)
    write(dir, "sql/01_create_source_table.sql",
      comment("Source: unbounded stream over the input topic") +
        Ddl.kafkaSourceTable("input_events", input))
    write(dir, "sql/02_create_output_table.sql",
      comment("Sink: results topic") + Ddl.kafkaSinkTable("output_results", output))
    write(dir, "sql/03_create_processing.sql",
      comment("Continuous INSERT-SELECT: the standing processing job") +
        "INSERT INTO output_results SELECT event_id, event_type, value AS total FROM input_events")
  }

  /** CSV project: filesystem source profiled by the inference lattice. */
  def initFromCsv(dir: Path, projectName: String, csv: Path): Unit = {
    val analysis = CsvAnalyzer.analyze(csv)
    val inputJson = analysis.toAvroJson(projectName)
    val input = AvroSchemas.parse(inputJson)
    writeCommon(dir, projectName, inputJson, defaultOutputSchema)
    Files.createDirectories(dir.resolve("data"))
    Files.copy(csv, dir.resolve("data").resolve(csv.getFileName),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    write(dir, "sql/01_create_source_table.sql",
      comment("Source: CSV files profiled by the inference lattice") +
        Ddl.csvSourceTable("input_events", input, dir.resolve("data").toString))
    write(dir, "analysis.md", analysis.toMarkdown)
  }

  private def writeCommon(dir: Path, projectName: String,
                          inputSchema: String, outputSchema: String): Unit = {
    Files.createDirectories(dir.resolve("sql"))
    Files.createDirectories(dir.resolve("schemas"))
    write(dir, "schemas/input.avsc", inputSchema)
    write(dir, "schemas/output_result.avsc", outputSchema)
    write(dir, "graft.yaml",
      s"""# graft pipeline configuration
         |project: $projectName
         |message_rate: 100        # messages per second (producer default)
         |duration: 30s            # producer run length
         |pipeline_timeout: 5m
         |""".stripMargin)
    write(dir, "README.md",
      s"""# $projectName
         |
         |Generated graft pipeline project.
         |
         |Layout:
         |- `schemas/` — AVRO record schemas (input/output)
         |- `sql/` — ordered pipeline statements (source, sink, processing)
         |- `graft.yaml` — run configuration
         |
         |Run with `graft.runner.GraftRunner.run(spark, Config(projectDir, runDir))`.
         |""".stripMargin)
  }

  private def comment(text: String): String = s"-- $text\n"

  private def write(dir: Path, rel: String, content: String): Unit =
    Files.writeString(dir.resolve(rel), content)
}

/** Field-presence/type validator — the consumer's record validation
  * (reference: internal/pipeline/consumer.go:361-388 DefaultValidator:
  * required event_id/user_id/event_type/timestamp fields), as a
  * DataFrame-level check usable on batch or per-microbatch output. */
object FieldValidator {

  final case class Violation(column: String, problem: String, rows: Long)

  def validate(df: org.apache.spark.sql.DataFrame,
               required: Seq[String] = Seq("event_id", "user_id", "event_type", "ts"))
      : Seq[Violation] = {
    val missing = required.filterNot(df.columns.contains)
      .map(c => Violation(c, "missing column", df.count()))
    val present = required.filter(df.columns.contains)
    val nullCounts =
      if (present.isEmpty) Seq.empty
      else {
        import org.apache.spark.sql.functions._
        val row = df.select(present.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*).head()
        present.zipWithIndex.collect {
          case (c, i) if row.getLong(i) > 0 => Violation(c, "null values", row.getLong(i))
        }
      }
    missing ++ nullCounts
  }
}
