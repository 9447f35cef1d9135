package graft.statements

import java.nio.file.Files

import graft.SparkSpec

class StatementsSpec extends SparkSpec {

  private def writeSqlDir(files: (String, String)*): java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft-sql")
    files.foreach { case (name, content) =>
      Files.writeString(dir.resolve(name), content)
    }
    dir
  }

  test("load: ordered by filename, comments stripped, order assigned") {
    val dir = writeSqlDir(
      "02_second.sql" -> "SELECT 2 -- inline comment\n",
      "01_first.sql" -> "-- header comment\nSELECT 1\n\n-- trailing\n",
      "readme.txt" -> "not sql")
    val loaded = Statements.load(dir)
    assert(loaded.map(_.name) == Seq("01_first", "02_second"))
    assert(loaded.map(_.order) == Seq(1, 2))
    assert(loaded.head.content == "SELECT 1")
    assert(loaded(1).content == "SELECT 2")
  }

  test("clean: blank lines, full-line and inline comments") {
    val cleaned = Statements.clean(
      """CREATE TABLE x ( -- make the table
        |  id INT -- the id
        |)
        |
        |-- done
        |""".stripMargin)
    assert(cleaned == "CREATE TABLE x (\nid INT\n)")
  }

  test("substitute replaces ${VAR} placeholders") {
    val out = Statements.substitute(
      "CREATE TABLE t OPTIONS('topic'='${INPUT_TOPIC}', 'servers'='${BOOTSTRAP_SERVERS}')",
      Map("INPUT_TOPIC" -> "events-in", "BOOTSTRAP_SERVERS" -> "broker:9092"))
    assert(out == "CREATE TABLE t OPTIONS('topic'='events-in', 'servers'='broker:9092')")
  }

  test("validator rejects the reference's destructive operations via plan walk") {
    def err(sql: String) = Statements.validate(spark, sql)
    assert(err("DROP DATABASE prod").exists(_.contains("DROP DATABASE")))
    assert(err("DROP SCHEMA prod").exists(_.contains("DROP DATABASE/SCHEMA")))
    assert(err("TRUNCATE TABLE events").exists(_.contains("TRUNCATE")))
    assert(err("DELETE FROM events WHERE 1=1").exists(_.contains("DELETE FROM")))
    assert(err("SELECT * FROM t").isEmpty)
    assert(err("INSERT INTO t SELECT * FROM s").isEmpty)
    assert(err("CREATE TABLE t (id INT) USING parquet").isEmpty)
    // DROP TABLE is admissible, as in the reference
    assert(err("DROP TABLE t").isEmpty ||
      err("DROP TABLE t").exists(_.contains("must contain")))
  }

  test("plan walk beats substrings: identifiers containing keywords do not false-positive") {
    // a table named delete_from_log would trip a naive substring check
    assert(Statements.validate(spark, "SELECT * FROM delete_from_log").isEmpty)
  }

  test("statements lacking the required verbs are rejected") {
    assert(Statements.validate(spark, "SHOW TABLES")
      .exists(_.contains("must contain")))
  }

  test("classifier matches the reference semantics") {
    import Statements._
    assert(classify("CREATE TABLE x (id INT)") == CreateTable)
    assert(classify("INSERT INTO t SELECT 1") == Insert)
    assert(classify("CREATE VIEW v AS SELECT 1") == CreateView)
    assert(classify("SELECT * FROM t") == Query)
    assert(classify("SHOW TABLES") == Other)
  }

  test("topic extraction from both option syntaxes, deduplicated") {
    val stmts = Seq(
      SqlStatement("01", "CREATE TABLE src (id INT) WITH ('connector' = 'kafka', 'topic' = 'input-events')", "", 1),
      SqlStatement("02", "CREATE TABLE dst (id INT) USING json OPTIONS (topic 'output-results')", "", 2),
      SqlStatement("03", "CREATE TABLE dup (id INT) WITH ('topic' = 'input-events')", "", 3),
      SqlStatement("04", "SELECT 'topic' = 'not-a-create'", "", 4))
    assert(Statements.extractTopics(stmts) == Seq("input-events", "output-results"))
  }

  test("ordered 3-file pipeline executes end-to-end through spark.sql") {
    val sp = spark
    import sp.implicits._
    val data = Files.createTempDirectory("graft-pipe")
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)).toDF("id", "grp", "v")
      .write.mode("overwrite").parquet(s"$data/events")
    val dir = writeSqlDir(
      "01_create_source.sql" ->
        s"CREATE OR REPLACE TEMPORARY VIEW pipe_src AS SELECT * FROM parquet.`$data/events` -- source",
      "02_create_agg.sql" ->
        "-- aggregate by group\nCREATE OR REPLACE TEMPORARY VIEW pipe_agg AS SELECT grp, SUM(v) AS total FROM pipe_src GROUP BY grp",
      "03_query.sql" ->
        "SELECT grp, total FROM pipe_agg ORDER BY grp")
    val stmts = Statements.load(dir)
    stmts.foreach(s => assert(Statements.validate(spark, s.content).isEmpty, s.name))
    val results = stmts.map(s => spark.sql(s.content))
    val rows = results.last.collect().map(r => (r.getString(0), r.getDouble(1))).toList
    assert(rows == List(("a", 40.0), ("b", 20.0)))
  }
}
