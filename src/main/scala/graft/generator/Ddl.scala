package graft.generator

import graft.avro.AvroSchemas
import org.apache.spark.sql.types.StructType

/** AVRO schema → source/sink DDL synthesis (reference:
  * internal/generator/generator.go:464-524 Kafka DDL,
  * generator.go:154-248 filesystem/CSV DDL), emitted in the WITH-options
  * dialect the graft statement layer understands (topic-backed tables
  * become streaming views; see graft.runner.GraftRunner step 6). */
object Ddl {

  private def columnList(st: StructType): String =
    st.fields.map(f => s"  ${f.name} ${f.dataType.sql}").mkString(",\n")

  /** Kafka-shaped source table over `${INPUT_TOPIC}` (reference
    * 01_create_source_table.sql shape: earliest offsets, avro-confluent). */
  def kafkaSourceTable(tableName: String, schema: AvroSchemas.AvroSchema,
                       topicVar: String = "${INPUT_TOPIC}"): String =
    s"""CREATE TABLE $tableName (
       |${columnList(schema.structType)}
       |) WITH (
       |  'connector' = 'kafka',
       |  'topic' = '$topicVar',
       |  'properties.bootstrap.servers' = '$${BOOTSTRAP_SERVERS}',
       |  'scan.startup.mode' = 'earliest-offset',
       |  'format' = 'avro-confluent',
       |  'avro-confluent.url' = '$${SCHEMA_REGISTRY_URL}'
       |)""".stripMargin

  /** Kafka-shaped sink table over `${OUTPUT_TOPIC}` (reference
    * 02_create_output_table.sql shape). */
  def kafkaSinkTable(tableName: String, schema: AvroSchemas.AvroSchema,
                     topicVar: String = "${OUTPUT_TOPIC}"): String =
    kafkaSourceTable(tableName, schema, topicVar)

  /** Filesystem/CSV source with ignore-parse-errors (reference
    * generator.go:184-196; ≡ Spark DROPMALFORMED — graft.sources.CsvSource). */
  def csvSourceTable(tableName: String, schema: AvroSchemas.AvroSchema,
                     dataDir: String): String =
    s"""CREATE TABLE $tableName (
       |${columnList(schema.structType)}
       |) WITH (
       |  'connector' = 'filesystem',
       |  'path' = '$dataDir',
       |  'format' = 'csv',
       |  'csv.ignore-parse-errors' = 'true'
       |)""".stripMargin
}
