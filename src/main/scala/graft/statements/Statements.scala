package graft.statements

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL statement management — the reference's statement layer re-expressed
  * for Spark (reference: internal/pipeline/sql.go:27-266,
  * internal/pipeline/flink.go:513-527).
  *
  * Loading, comment-stripping, filename ordering, classification and the
  * `${VAR}` substitution follow the reference's tested behavior exactly.
  * The destructive-operation gate is upgraded from substring matching to a
  * LogicalPlan walk (SURVEY.md §2.A A2): `spark.sessionState.sqlParser`
  * parses the statement and the plan tree is scanned for the forbidden
  * node types, so `DELETE FROM` hidden by formatting/comments cannot slip
  * through and a table named "TRUNCATED_EVENTS" does not false-positive.
  * Statements Spark cannot parse (foreign DDL) fall back to the
  * reference's substring rules.
  */
final case class SqlStatement(name: String, content: String, filePath: String, order: Int)

object Statements {

  /** Load the `.sql` files in `dir`, strip comments, normalize, sort by
    * filename, assign 1-based order (reference sql.go:27-130). */
  def load(dir: Path): Seq[SqlStatement] = {
    val sqlDir = dir
    require(Files.isDirectory(sqlDir), s"sql directory not found: $sqlDir")
    val listing = Files.list(sqlDir) // must be closed, not just drained
    val files =
      try listing.iterator().asScala
        .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
    require(files.nonEmpty, s"no SQL files found in $sqlDir")
    files.zipWithIndex.map { case (p, i) =>
      val raw = new String(Files.readAllBytes(p), "UTF-8").trim
      require(raw.nonEmpty, s"SQL file is empty: $p")
      SqlStatement(
        name = p.getFileName.toString.stripSuffix(".sql"),
        content = clean(raw),
        filePath = p.toString,
        order = i + 1)
    }
  }

  /** Comment strip + whitespace normalization (reference sql.go:107-130):
    * drop blank/`--` lines, truncate at inline `--`, re-join. */
  def clean(sql: String): String =
    sql.split("\n").iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("--"))
      .map { l =>
        val i = l.indexOf("--")
        if (i >= 0) l.substring(0, i).trim else l
      }
      .filter(_.nonEmpty)
      .mkString("\n")

  /** `${VAR}` substitution (reference flink.go:513-527). */
  def substitute(sql: String, vars: Map[String, String]): String =
    vars.foldLeft(sql) { case (s, (k, v)) => s.replace("${" + k + "}", v) }

  sealed trait StatementType
  case object CreateTable extends StatementType
  case object Insert extends StatementType
  case object CreateView extends StatementType
  case object Query extends StatementType
  case object Other extends StatementType

  /** Classify (reference sql.go:182-196 substring semantics — its tested
    * contract, kept bug-for-bug: CREATE TABLE anywhere wins, then INSERT
    * INTO, then CREATE VIEW, then SELECT-without-CREATE). */
  def classify(content: String): StatementType = {
    val u = content.toUpperCase
    if (u.contains("CREATE TABLE")) CreateTable
    else if (u.contains("INSERT INTO")) Insert
    else if (u.contains("CREATE VIEW") || u.contains("CREATE TEMPORARY VIEW")) CreateView
    else if (u.contains("SELECT") && !u.contains("CREATE")) Query
    else Other
  }

  /** Destructive-operation gate (reference sql.go:133-167, upgraded to a
    * plan walk). Returns an error message, or None if the statement is
    * admissible. */
  def validate(spark: SparkSession, content: String): Option[String] = {
    val planBased: Option[Option[String]] =
      try {
        val plan = spark.sessionState.sqlParser.parsePlan(content)
        Some(findForbidden(plan).map(op => s"potentially dangerous operation detected: $op"))
      } catch { case _: Exception => None } // unparseable → substring fallback
    val dangerous = planBased.getOrElse {
      val u = content.toUpperCase
      Seq("DROP DATABASE", "DROP SCHEMA", "TRUNCATE", "DELETE FROM")
        .find(u.contains)
        .map(op => s"potentially dangerous operation detected: $op")
    }
    dangerous.orElse {
      val u = content.toUpperCase
      if (!u.contains("CREATE TABLE") && !u.contains("INSERT INTO") && !u.contains("SELECT")
          && !u.contains("CREATE VIEW") && !u.contains("CREATE TEMPORARY VIEW"))
        Some("statement must contain CREATE TABLE, INSERT INTO, or SELECT")
      else None
    }
  }

  /** Walk the parsed plan for the reference's forbidden node classes
    * (DROP DATABASE/SCHEMA → DropNamespace, TRUNCATE → TruncateTable,
    * DELETE FROM → DeleteFromTable). DROP TABLE is admissible, exactly as
    * in the reference. */
  private def findForbidden(plan: LogicalPlan): Option[String] = {
    val hits = plan.collect {
      case p if p.nodeName == "DropNamespace" => "DROP DATABASE/SCHEMA"
      case p if p.nodeName == "TruncateTable" || p.nodeName == "TruncatePartition" => "TRUNCATE"
      case p if p.nodeName == "DeleteFromTable" => "DELETE FROM"
    }
    hits.headOption
  }

  private val topicRegexes: Seq[Regex] = Seq(
    """'topic'\s*=\s*'([^']+)'""".r, // Flink WITH / Spark OPTIONS('topic'='x')
    """\btopic\s+'([^']+)'""".r)     // Spark OPTIONS (topic 'x')

  /** Topic names referenced by CREATE TABLE statements, deduplicated in
    * first-appearance order (reference sql.go:209-266). */
  def extractTopics(statements: Seq[SqlStatement]): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    statements.foreach { s =>
      if (s.content.toUpperCase.contains("CREATE TABLE"))
        topicRegexes.foreach(_.findAllMatchIn(s.content).foreach(m => out += m.group(1)))
    }
    out.toSeq
  }

  /** Group statements by classified type (reference sql.go:170-180). */
  def byType(statements: Seq[SqlStatement]): Map[StatementType, Seq[SqlStatement]] =
    statements.groupBy(s => classify(s.content))
}
