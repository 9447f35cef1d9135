package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.format.{DateTimeFormatter, ResolverStyle}

import scala.collection.mutable

import org.apache.spark.sql.types._

/** Streaming CSV profiler with the reference's exact type-inference
  * lattice (reference: internal/generator/csv_analyzer.go:74-282, fixtures
  * csv_analyzer_test.go:9-66).
  *
  * Escalation model per column, starting at `int`:
  *   int → long → double → string; int also branches to boolean / date /
  *   timestamp on first non-numeric evidence. Quirks preserved on purpose
  *   (they are the reference's tested behavior):
  *    - a `long`/`double` column that later sees `true` degrades to
  *      STRING, not boolean (csv_analyzer.go:190-192);
  *    - `date` can still escalate to `timestamp`, but not vice versa;
  *    - `boolean` + numeric evidence → double; boolean + date evidence →
  *      string;
  *    - `0`/`1` match the boolean pattern but parse as int first, so an
  *      all-0/1 column stays int;
  *    - nullability comes only from empty cells; an all-null column
  *      finalizes as nullable string.
  *
  * Caps mirror the reference: 5000 rows scanned (header included in the
  * count), 5 samples, 100 distinct values per column. This runs on the
  * driver — it is schema inference over a bounded prefix, not data
  * processing.
  */
object CsvAnalyzer {

  final class ColumnProfile(var name: String) {
    var inferredType: String = "int"
    var nullable: Boolean = false
    var rowCount: Long = 0
    var nonNullCount: Long = 0
    val samples = mutable.ArrayBuffer.empty[String]
    val distinct = mutable.LinkedHashMap.empty[String, Int]
  }

  final case class Analysis(columns: Seq[ColumnProfile], totalRows: Int, headerPresent: Boolean) {

    /** Inferred Spark schema — maps date/timestamp to native types
      * (SURVEY.md §1.2 improvement over the reference's keep-it-simple
      * string emission). */
    def structType: StructType = StructType(columns.map { c =>
      val dt = c.inferredType match {
        case "int"       => IntegerType
        case "long"      => LongType
        case "double"    => DoubleType
        case "boolean"   => BooleanType
        case "date"      => DateType
        case "timestamp" => TimestampType
        case _           => StringType
      }
      StructField(c.name, dt, nullable = c.nullable)
    })

    /** AVRO schema JSON with the reference's exact emission, including the
      * date/timestamp → string simplification
      * (reference csv_analyzer.go:334-376). */
    def toAvroJson(projectName: String): String = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      import scala.jdk.CollectionConverters._
      def avroType(t: String): String = t match {
        case "int" | "long" | "double" | "boolean" => t
        case _ => "string" // date/timestamp kept simple, like the reference
      }
      val fields = columns.map { c =>
        val t: Any =
          if (c.nullable) List("null", avroType(c.inferredType)).asJava
          else avroType(c.inferredType)
        Map("name" -> c.name, "type" -> t).asJava
      }
      mapper.writeValueAsString(Map(
        "type" -> "record",
        "name" -> (sanitizeIdentifier(projectName) + "_input"),
        "namespace" -> "graft.generated",
        "fields" -> fields.asJava).asJava)
    }

    /** Markdown profiling table (reference csv_analyzer.go:285-305). */
    def toMarkdown: String = {
      val b = new StringBuilder
      b ++= "| Column | Type | Nullable | Non-Null | Distinct (<=10) | Samples |\n"
      b ++= "|--------|------|----------|----------|-----------------|---------|\n"
      columns.foreach { c =>
        b ++= s"| ${c.name} | ${c.inferredType} | ${c.nullable} | ${c.nonNullCount} " +
          s"| ${c.distinct.keys.take(10).mkString(",")} | ${c.samples.mkString(",")} |\n"
      }
      b.toString
    }

    /** Compact prompt export (reference csv_analyzer.go:307-331). */
    def toPrompt(maxCols: Int): String = {
      val n = if (maxCols <= 0 || maxCols > columns.size) columns.size else maxCols
      val b = new StringBuilder
      b ++= s"Columns (up to $n):\nname,type,nullable,sample_values\n"
      columns.take(n).foreach { c =>
        val s = c.samples.take(3).mkString("|").replace(",", " ").replace("\n", " ")
        b ++= s"${c.name},${c.inferredType},${c.nullable},$s\n"
      }
      if (n < columns.size) b ++= s"... ${columns.size - n} more columns omitted for brevity\n"
      b.toString
    }
  }

  private val boolPattern = "(?i:true|false|0|1|yes|no)".r
  private val numberPattern = """[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?""".r

  private val dateFormats = Seq("uuuu-MM-dd", "dd/MM/uuuu", "MM/dd/uuuu")
    .map(DateTimeFormatter.ofPattern(_).withResolverStyle(ResolverStyle.STRICT))
  private val tsFormats = Seq(
    "uuuu-MM-dd HH:mm:ss", "uuuu-MM-dd HH:mm:ss.SSS", "uuuu-MM-dd'T'HH:mm:ss")
    .map(DateTimeFormatter.ofPattern(_).withResolverStyle(ResolverStyle.STRICT))

  private def isInt32(v: String): Boolean =
    try { java.lang.Integer.parseInt(v); true } catch { case _: Exception => false }
  private def isInt64(v: String): Boolean =
    try { java.lang.Long.parseLong(v); true } catch { case _: Exception => false }
  private def isFloat(v: String): Boolean =
    numberPattern.matches(v)
  private def isBool(v: String): Boolean = boolPattern.matches(v)
  private def isDate(v: String): Boolean =
    dateFormats.exists { f =>
      try { java.time.LocalDate.parse(v, f); true } catch { case _: Exception => false }
    }
  private def isTimestamp(v: String): Boolean =
    (try { java.time.OffsetDateTime.parse(v); true } catch { case _: Exception => false }) ||
      tsFormats.exists { f =>
        try { java.time.LocalDateTime.parse(v, f); true } catch { case _: Exception => false }
      }

  def sanitizeIdentifier(s: String): String = {
    var out = s.replaceAll("[^A-Za-z0-9_]", "_")
    if (out.nonEmpty && !out.head.isLetter && out.head != '_') out = "_" + out
    if (out.isEmpty || out == "_") out = "pipeline"
    out
  }

  /** The per-value escalation step (reference inferColumnType,
    * csv_analyzer.go:154-250). */
  private[sources] def infer(c: ColumnProfile, v: String): Unit = c.inferredType match {
    case "int" =>
      if (isInt32(v)) ()
      else if (isInt64(v)) c.inferredType = "long"
      else if (isFloat(v)) c.inferredType = "double"
      else if (isBool(v)) c.inferredType = "boolean"
      else if (isDate(v)) c.inferredType = "date"
      else if (isTimestamp(v)) c.inferredType = "timestamp"
      else c.inferredType = "string"
    case "long" =>
      if (isInt64(v)) ()
      else if (isFloat(v)) c.inferredType = "double"
      else c.inferredType = "string" // bool/date/timestamp evidence all degrade
    case "double" =>
      if (isFloat(v)) ()
      else c.inferredType = "string"
    case "boolean" =>
      if (isBool(v)) ()
      else if (isDate(v) || isTimestamp(v)) c.inferredType = "string"
      else if (isFloat(v)) c.inferredType = "double"
      else c.inferredType = "string"
    case "date" =>
      if (isDate(v)) ()
      else if (isTimestamp(v)) c.inferredType = "timestamp"
      else c.inferredType = "string"
    case "timestamp" =>
      if (isTimestamp(v)) ()
      else c.inferredType = "string"
    case _ => () // string is terminal
  }

  /** Profile a CSV file (reference Analyze, csv_analyzer.go:74-152). */
  def analyze(path: Path, maxRows: Int = 5000, maxSamples: Int = 5,
              delimiter: Char = ',', hasHeader: Boolean = true,
              distinctCap: Int = 100): Analysis = {
    val reader = new BufferedReader(new InputStreamReader(
      Files.newInputStream(path), StandardCharsets.UTF_8))
    try {
      var cols: Array[ColumnProfile] = null
      var rowIndex = 0
      var headerPresent = false
      var rec = readRecord(reader, delimiter)
      while (rec != null && rowIndex < maxRows) {
        if (rowIndex == 0 && hasHeader) {
          headerPresent = rec.nonEmpty
          cols = rec.zipWithIndex.map { case (h, i) =>
            val name = h.trim
            new ColumnProfile(sanitizeIdentifier(
              (if (name.isEmpty) s"col_${i + 1}" else name).toLowerCase))
          }.toArray
        } else {
          if (cols == null)
            cols = rec.indices.map(i => new ColumnProfile(s"col_${i + 1}")).toArray
          rec.take(cols.length).zipWithIndex.foreach { case (cell, i) =>
            val c = cols(i)
            c.rowCount += 1
            val v = cell.trim
            if (v.isEmpty) c.nullable = true
            else {
              c.nonNullCount += 1
              if (c.samples.size < maxSamples) c.samples += v
              if (c.distinct.size < distinctCap)
                c.distinct(v) = c.distinct.getOrElse(v, 0) + 1
              infer(c, v)
            }
          }
        }
        rowIndex += 1
        if (rowIndex < maxRows) rec = readRecord(reader, delimiter) else rec = null
      }
      val columns = Option(cols).map(_.toSeq).getOrElse(Seq.empty)
      // all-null columns finalize as nullable string (csv_analyzer.go:274-282)
      columns.foreach { c =>
        if (c.nonNullCount == 0) { c.inferredType = "string"; c.nullable = true }
      }
      Analysis(columns, rowIndex, hasHeader && headerPresent)
    } finally reader.close()
  }

  /** Minimal RFC-4180 record reader: quoted fields, doubled quotes,
    * embedded delimiters/newlines. Returns null at EOF. */
  private def readRecord(r: BufferedReader, delim: Char): Seq[String] = {
    var ci = r.read()
    if (ci < 0) return null
    val fields = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var done = false
    while (!done && ci >= 0) {
      val c = ci.toChar
      if (inQuotes) {
        if (c == '"') {
          r.mark(1)
          val nxt = r.read()
          if (nxt == '"') cur += '"' // doubled quote = literal quote
          else { inQuotes = false; if (nxt >= 0) r.reset() } // close quote, put char back
        } else cur += c
      } else {
        if (c == '"' && cur.isEmpty) inQuotes = true
        else if (c == delim) { fields += cur.toString; cur.clear() }
        else if (c == '\n') done = true
        else if (c == '\r') {
          r.mark(1)
          val n2 = r.read()
          if (n2 >= 0 && n2.toChar != '\n') r.reset()
          done = true
        } else cur += c
      }
      if (!done) ci = r.read()
    }
    fields += cur.toString
    fields.toSeq
  }
}
