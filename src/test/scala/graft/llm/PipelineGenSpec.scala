package graft.llm

import graft.SparkSpec
import graft.statements.Statements

/** JSON repair + prompt contract + mock end-to-end (reference:
  * internal/llm/service_test.go table cases; PIPEGEN_MOCK_OPENAI-style
  * offline mode). */
class PipelineGenSpec extends SparkSpec {

  test("repair: markdown fences are stripped") {
    val p = PipelineGen.parse(
      "Sure! Here you go:\n```json\n{\"input_schema\": \"{}\", \"output_schema\": \"{}\", " +
        "\"sql_statements\": {\"a.sql\": \"SELECT 1\"}, \"description\": \"d\", \"optimizations\": []}\n```\nEnjoy!")
    assert(p.sqlStatements == Map("a.sql" -> "SELECT 1"))
  }

  test("repair: backtick template literals with newlines become JSON strings") {
    val p = PipelineGen.parse(
      "{\"input_schema\": \"{}\", \"output_schema\": \"{}\", " +
        "\"sql_statements\": {\"a.sql\": `SELECT 1\nFROM \"t\"`}, \"description\": \"d\", \"optimizations\": []}")
    assert(p.sqlStatements("a.sql") == "SELECT 1\nFROM \"t\"")
  }

  test("repair leaves valid JSON with backtick-quoted Spark identifiers untouched") {
    // backtick is Spark SQL's identifier quote — a well-formed response
    // whose SQL strings contain `order id` must not be rewritten (the old
    // unanchored rewrite corrupted it, and one backtick in each of two
    // values swallowed the JSON structure between them)
    val p = PipelineGen.parse(
      "{\"input_schema\": \"{}\", \"output_schema\": \"{}\", " +
        "\"sql_statements\": {\"a.sql\": \"SELECT `order id` FROM t\", " +
        "\"b.sql\": \"SELECT `user id` FROM u\"}, " +
        "\"description\": \"d\", \"optimizations\": []}")
    assert(p.sqlStatements("a.sql") == "SELECT `order id` FROM t")
    assert(p.sqlStatements("b.sql") == "SELECT `user id` FROM u")
  }

  test("repair: triple quotes and trailing commas") {
    val p = PipelineGen.parse(
      "{\"input_schema\": \"{}\", \"output_schema\": \"{}\", " +
        "\"sql_statements\": {\"a.sql\": \"\"\"SELECT 2\"\"\",}, \"description\": \"d\", \"optimizations\": [\"x\",],}")
    assert(p.sqlStatements("a.sql") == "SELECT 2")
    assert(p.optimizations == Seq("x"))
  }

  test("flexible fields: object-valued schema is re-serialized, object description joined") {
    val p = PipelineGen.parse(
      """{"input_schema": {"type": "record", "name": "E", "fields": []},
        |"output_schema": "{}",
        |"sql_statements": {"a.sql": "SELECT 1"},
        |"description": {"summary": "part one", "details": "part two"},
        |"optimizations": [{"tip": "obj form"}, "plain"]}""".stripMargin)
    assert(p.inputSchema.contains("\"name\":\"E\""))
    assert(p.description == "part one part two")
    assert(p.optimizations.size == 2)
  }

  test("prompt contract: domain substitution and windowing requirement") {
    val prompt = PipelineGen.buildPrompt("track clicks", "ecommerce")
    assert(prompt.contains("Domain: ecommerce"))
    assert(prompt.contains("windowing and aggregations"))
    assert(prompt.contains("Return ONLY valid JSON"))
    val withSchema = PipelineGen.buildPromptWithSchema("{\"x\":1}", "d", "iot")
    assert(withSchema.contains("canonical"))
    val withCsv = PipelineGen.buildPromptWithCsvAnalysis("d", "iot", "cols...", "{}")
    assert(withCsv.contains("CSV Column Analysis"))
  }

  test("mock end-to-end: generated pipeline validates through the engine") {
    val p = PipelineGen.generate(new MockClient, "aggregate clicks", "retail")
    val in = graft.avro.AvroSchemas.parse(p.inputSchema)
    assert(in.structType.fieldNames.contains("event_id"))
    assert(p.sqlStatements.size == 3)
    // every generated statement passes the engine's validation gate
    p.sqlStatements.values.foreach(sql =>
      assert(Statements.validate(spark, sql).isEmpty, sql))
    // and the statement set is a deployable project shape
    val byType = p.sqlStatements.values.map(Statements.classify).toSeq
    assert(byType.count(_ == Statements.CreateTable) == 2)
    assert(byType.count(_ == Statements.Insert) == 1)
    assert(p.optimizations.nonEmpty)
  }
}
