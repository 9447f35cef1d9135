package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV filesystem source with the reference's ignore-parse-errors
  * semantics (reference: internal/generator/generator.go:184-196 emits
  * `'connector'='filesystem', 'format'='csv',
  * 'csv.ignore-parse-errors'='true'` ≡ Spark mode=DROPMALFORMED), batch
  * and streaming, with schema either declared or inferred by the
  * reference-parity profiler ([[CsvAnalyzer]]). */
object CsvSource {

  /** Batch read with an explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType,
           hasHeader: Boolean = true, dropMalformed: Boolean = true): DataFrame =
    reader(spark, schema, hasHeader, dropMalformed).csv(path)

  /** Batch read, schema inferred via the reference lattice over the first
    * file's 5000-row prefix (NOT Spark's inferSchema — the lattice
    * semantics differ and are the tested contract; SURVEY.md §1.1). */
  def readInferred(spark: SparkSession, file: Path,
                   hasHeader: Boolean = true): DataFrame = {
    val schema = CsvAnalyzer.analyze(file, hasHeader = hasHeader).structType
    read(spark, file.toString, schema, hasHeader)
  }

  /** Streaming read of a CSV directory (bounded sources use
    * Trigger.AvailableNow via graft.streaming.BoundedRun). */
  def readStream(spark: SparkSession, dir: String, schema: StructType,
                 hasHeader: Boolean = true, dropMalformed: Boolean = true): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("header", hasHeader.toString)
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
    r.csv(dir)
  }

  private def reader(spark: SparkSession, schema: StructType,
                     hasHeader: Boolean, dropMalformed: Boolean) =
    spark.read
      .schema(schema)
      .option("header", hasHeader.toString)
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
}
