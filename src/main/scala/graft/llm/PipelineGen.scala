package graft.llm

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** LLM pipeline generation (reference: internal/llm/service.go:109-286
  * prompt builders, 485-888 response parsing + JSON repair).
  *
  * This environment has no network, so the transport is pluggable
  * ([[LlmClient]]) and ships with the deterministic [[MockClient]] — the
  * analog of the reference's PIPEGEN_MOCK_OPENAI mode
  * (service.go:124-129). The durable, tested value is the same as in the
  * reference: the prompt contracts and the JSON repair pipeline that
  * turns messy LLM output (markdown fences, template literals, triple
  * quotes, trailing commas, object-valued schema fields) into a parsed
  * pipeline.
  *
  * Prompts are re-targeted at Spark SQL / Structured Streaming — this
  * engine executes the statements natively, where the reference delegated
  * to FlinkSQL.
  */
final case class GeneratedPipeline(
    inputSchema: String,
    outputSchema: String,
    sqlStatements: Map[String, String],
    description: String,
    optimizations: Seq[String])

trait LlmClient {
  def complete(prompt: String): String
}

object PipelineGen {

  private val mapper = new ObjectMapper()

  // ---- prompt builders (service.go:209-286, Spark-dialect) ----

  def buildPrompt(description: String, domain: String): String =
    s"""You are an expert in Apache Kafka and Spark Structured Streaming SQL. Generate a complete streaming pipeline based on this description:
       |
       |Description: $description
       |Domain: $domain
       |
       |Generate a JSON response with exactly these fields:
       |1. input_schema: AVRO schema as a JSON string (not an object)
       |2. output_schema: AVRO schema as a JSON string (not an object)
       |3. sql_statements: Object with filename keys and Spark SQL statement values
       |4. description: Technical summary of the pipeline as a string
       |5. optimizations: Array of performance optimization suggestions as strings
       |
       |Requirements:
       |- Both schemas must be valid AVRO JSON strings
       |- SQL statements should use realistic field names for the $domain domain
       |- Include proper event-time windowing and aggregations (window/session_window with watermarks)
       |- Use the engine's topic-backed CREATE TABLE syntax for sources and sinks
       |- Optimize for performance and maintainability
       |
       |Return ONLY valid JSON with no markdown formatting or code blocks.""".stripMargin

  def buildPromptWithSchema(schemaJson: String, description: String, domain: String): String =
    buildPrompt(description, domain).replace(
      "Generate a JSON response",
      s"Input schema (AVRO JSON):\n$schemaJson\n\nUse the provided input schema as canonical; do not change field names or types unless well-justified.\n\nGenerate a JSON response")

  def buildPromptWithCsvAnalysis(description: String, domain: String,
                                 analysisSummary: String, inferredSchema: String): String =
    buildPrompt(description, domain).replace(
      "Generate a JSON response",
      s"CSV Column Analysis (compact):\n$analysisSummary\n\nInferred Input AVRO Schema (from CSV):\n$inferredSchema\n\nPreserve column names from the input schema; suggest at least one aggregation or windowed query if a timestamp column is detected.\n\nGenerate a JSON response")

  // ---- JSON repair pipeline (service.go:485-620) ----

  /** Extract the JSON body from markdown fences / surrounding prose. */
  private[llm] def extractJsonFromMarkdown(response: String): String = {
    val fence: Regex = "(?s)```(?:json)?\\s*(\\{.*?\\})\\s*```".r
    fence.findFirstMatchIn(response).map(_.group(1)).getOrElse {
      val start = response.indexOf('{')
      val end = response.lastIndexOf('}')
      if (start >= 0 && end > start) response.substring(start, end + 1) else response
    }
  }

  /** The reference's fixCommonJSONIssues: template literals, triple
    * quotes, brace/bracket-leading commas, trailing commas, doubled
    * opening quotes. */
  private[llm] def fixCommonJsonIssues(in: String): String = {
    var s = in
    // backtick template literals -> JSON strings (escape inner quotes/
    // newlines). Only spans in a VALUE position (after : , or [) are
    // rewritten: the prompt demands Spark SQL, whose identifier quote IS
    // the backtick, so an unanchored rewrite would corrupt valid
    // responses containing `quoted identifiers` inside proper strings
    // (and one backtick in each of two values would swallow the JSON
    // structure between them).
    s = "(?s)([:,\\[]\\s*)`([^`]*)`".r.replaceAllIn(s, m =>
      Regex.quoteReplacement(
        m.group(1) + "\"" + m.group(2).replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "").replace("\t", "\\t") + "\""))
    // triple-quoted strings -> plain strings
    s = "(?s)\"\"\"(.*?)\"\"\"".r.replaceAllIn(s, m =>
      Regex.quoteReplacement(
        "\"" + m.group(1).replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n") + "\""))
    s = s.replaceAll("\\{\\s*,", "{")
    s = s.replaceAll("\\[\\s*,", "[")
    s = s.replaceAll(",(\\s*[}\\]])", "$1")
    s = s.replaceAll("\":\\s*\"\"(?!\\s*[,}\\]])", "\": \"")
    s
  }

  /** Parse a (possibly messy) LLM response into a pipeline. Schema fields
    * may be strings or inline JSON objects; description may be a string
    * or an object; optimizations may be strings or objects. */
  def parse(response: String): GeneratedPipeline = {
    val cleaned = fixCommonJsonIssues(extractJsonFromMarkdown(response))
    val node = mapper.readTree(cleaned)
    require(node != null && node.isObject, "LLM response is not a JSON object")
    GeneratedPipeline(
      inputSchema = schemaField(node.get("input_schema")),
      outputSchema = schemaField(node.get("output_schema")),
      sqlStatements = Option(node.get("sql_statements")).filter(_.isObject)
        .map(o => o.properties().asScala.map(e => e.getKey -> text(e.getValue)).toMap)
        .getOrElse(Map.empty),
      description = text(node.get("description")),
      optimizations = Option(node.get("optimizations")).filter(_.isArray)
        .map(_.elements().asScala.map(text).toSeq).getOrElse(Seq.empty))
  }

  /** string → as-is; object → re-serialized JSON (flexible field). */
  private def schemaField(n: JsonNode): String = n match {
    case null => ""
    case s if s.isTextual => s.asText()
    case o => mapper.writeValueAsString(o)
  }

  private def text(n: JsonNode): String = n match {
    case null => ""
    case s if s.isTextual => s.asText()
    case o if o.isObject => // description-as-object: join its string values
      o.properties().asScala.map(e => text(e.getValue)).filter(_.nonEmpty).mkString(" ")
    case other => other.toString
  }

  /** Generate + parse + validate through the engine's schema subsystem. */
  def generate(client: LlmClient, description: String, domain: String): GeneratedPipeline = {
    val pipeline = parse(client.complete(buildPrompt(description, domain)))
    graft.avro.AvroSchemas.parse(pipeline.inputSchema)  // throws on invalid
    graft.avro.AvroSchemas.parse(pipeline.outputSchema)
    require(pipeline.sqlStatements.nonEmpty, "generated pipeline has no SQL statements")
    pipeline
  }
}

/** Deterministic offline generator exercising the messy-output repair
  * path on purpose: responds with markdown fences, a backtick literal and
  * a trailing comma, like real LLM output does. */
final class MockClient extends LlmClient {
  override def complete(prompt: String): String = {
    val domain = "Domain: (\\S+)".r.findFirstMatchIn(prompt).map(_.group(1)).getOrElse("events")
    s"""Here is your pipeline:
       |```json
       |{
       |  "input_schema": {"type": "record", "name": "${domain.capitalize}Event", "fields": [
       |      {"name": "event_id", "type": "string"},
       |      {"name": "event_type", "type": "string"},
       |      {"name": "value", "type": "double"},
       |      {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}}]},
       |  "output_schema": "{\\"type\\": \\"record\\", \\"name\\": \\"${domain.capitalize}Agg\\", \\"fields\\": [{\\"name\\": \\"event_type\\", \\"type\\": \\"string\\"}, {\\"name\\": \\"total\\", \\"type\\": \\"double\\"}]}",
       |  "sql_statements": {
       |    "01_create_source_table.sql": `CREATE TABLE input_events (event_id STRING, event_type STRING, value DOUBLE, ts TIMESTAMP) WITH ('connector' = 'kafka', 'topic' = '$${INPUT_TOPIC}')`,
       |    "02_create_output_table.sql": "CREATE TABLE output_results (event_type STRING, total DOUBLE) WITH ('connector' = 'kafka', 'topic' = '$${OUTPUT_TOPIC}')",
       |    "03_create_processing.sql": "INSERT INTO output_results SELECT event_type, value AS total FROM input_events"
       |  },
       |  "description": "Aggregates $domain events into per-type totals.",
       |  "optimizations": ["Use event-time windows with watermarks", "Broadcast small dimension tables",],
       |}
       |```""".stripMargin
  }
}
