package graft.cli

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.generator.Scaffold

/** Flag→Config mapping (pure, no Spark) — mirrors the reference's
  * cmd/run.go defaults and cmd/validate_test.go's validate-on-temp-dir
  * shape. */
class CliSpec extends AnyFunSuite {

  test("run defaults mirror the reference: rate 100/s, 30s duration, 5m timeout") {
    val cfg = Cli.parse(Seq("run")).toOption.get
    assert(cfg.verb == "run")
    assert(cfg.messageRate == 100)
    assert(cfg.durationMs == 30000L)
    assert(cfg.pipelineTimeoutMs == 300000L)
    assert(cfg.cleanup && cfg.generateReport)
    assert(!cfg.dryRun && !cfg.dashboard)
    assert(cfg.dashboardPort == 3000)
    assert(cfg.expectedMessages.isEmpty)
  }

  test("run flags map onto CliConfig and the runner Config") {
    val cfg = Cli.parse(Seq("run",
      "--project-dir", "/tmp/proj", "--run-dir", "/tmp/rd",
      "--message-rate", "250", "--duration", "90s",
      "--pipeline-timeout", "2m", "--expected-messages", "1234",
      "--traffic-pattern", "10s-20s:200%", "--dry-run",
      "--dashboard", "--dashboard-port", "3210",
      "--generate-report", "false", "--cleanup", "false")).toOption.get
    assert(cfg.projectDir == Paths.get("/tmp/proj"))
    assert(cfg.messageRate == 250)
    assert(cfg.durationMs == 90000L)
    assert(cfg.pipelineTimeoutMs == 120000L)
    assert(cfg.expectedMessages.contains(1234L))
    assert(cfg.trafficPattern == "10s-20s:200%")
    assert(cfg.dryRun && cfg.dashboard && cfg.dashboardPort == 3210)
    assert(!cfg.generateReport && !cfg.cleanup)

    val rc = cfg.toRunnerConfig
    assert(rc.projectDir == Paths.get("/tmp/proj"))
    assert(rc.runDir == Paths.get("/tmp/rd"))
    assert(rc.messageRate == 250)
    assert(rc.durationMs == 90000L)
    assert(rc.expectedOutputRows.contains(1234L))
    assert(rc.trafficPattern == "10s-20s:200%")
    assert(!rc.generateReport)
  }

  test("runDir defaults to projectDir/run") {
    val cfg = Cli.parse(Seq("run", "--project-dir", "/tmp/p")).toOption.get
    assert(cfg.toRunnerConfig.runDir == Paths.get("/tmp/p").resolve("run"))
  }

  test("duration literals parse like Go durations; bare numbers are rejected") {
    assert(Cli.parseDuration("30s") == Right(30000L))
    assert(Cli.parseDuration("5m") == Right(300000L))
    assert(Cli.parseDuration("1500ms") == Right(1500L))
    assert(Cli.parseDuration("2h") == Right(7200000L))
    assert(Cli.parseDuration("30").isLeft)
    assert(Cli.parseDuration("abc").isLeft)
  }

  test("config file fills unset values; explicit flags win (viper precedence)") {
    val dir = Files.createTempDirectory("graft-cli")
    Files.writeString(dir.resolve("graft.yaml"),
      """# comment
        |project: from-yaml
        |message_rate: 42     # inline comment
        |duration: 7s
        |""".stripMargin)
    val fromYaml = Cli.parse(Seq("run", "--project-dir", dir.toString)).toOption.get
    assert(fromYaml.messageRate == 42)
    assert(fromYaml.durationMs == 7000L)
    assert(fromYaml.projectName == "from-yaml")
    val overridden = Cli.parse(Seq("run", "--project-dir", dir.toString,
      "--message-rate", "9")).toOption.get
    assert(overridden.messageRate == 9)
    assert(overridden.durationMs == 7000L)
  }

  test("config file also feeds booleans and expected_messages; flags still win") {
    val dir = Files.createTempDirectory("graft-cli-bool")
    Files.writeString(dir.resolve("graft.yaml"),
      """cleanup: false
        |generate_report: false
        |expected_messages: 5000
        |""".stripMargin)
    val fromYaml = Cli.parse(Seq("run", "--project-dir", dir.toString)).toOption.get
    assert(!fromYaml.cleanup && !fromYaml.generateReport)
    assert(fromYaml.expectedMessages.contains(5000L))
    val overridden = Cli.parse(Seq("run", "--project-dir", dir.toString,
      "--cleanup", "true", "--expected-messages", "7")).toOption.get
    assert(overridden.cleanup && overridden.expectedMessages.contains(7L))
    assert(!overridden.generateReport)
  }

  test("unknown verb, bad integers, bad booleans and missing init dir are errors") {
    assert(Cli.parse(Seq("frobnicate")).isLeft)
    assert(Cli.parse(Seq.empty).isLeft)
    assert(Cli.parse(Seq("run", "--message-rate", "fast")).isLeft)
    assert(Cli.parse(Seq("run", "--cleanup", "maybe")).isLeft)
    assert(Cli.parse(Seq("run", "--duration", "30")).isLeft)
    assert(Cli.parse(Seq("init")).isLeft)
  }

  test("init parses target dir and scaffold options") {
    val cfg = Cli.parse(Seq("init", "/tmp/newproj", "--force",
      "--input-csv", "/tmp/data.csv")).toOption.get
    assert(cfg.initDir.contains(Paths.get("/tmp/newproj")))
    assert(cfg.force)
    assert(cfg.inputCsv.contains(Paths.get("/tmp/data.csv")))
    // project name defaults to the directory basename
    assert(cfg.projectName == "newproj")
  }

  test("version verb parses and reports engine + runtime versions") {
    assert(Cli.parse(Seq("version")).exists(_.verb == "version"))
    assert(Cli.versionLines.exists(_.startsWith("graft ")))
    assert(Cli.versionLines.exists(_.contains("Spark")))
    assert(Cli.versionLines.exists(_.contains("Scala")))
  }

  test("yaml '#' only opens a comment at line start or after whitespace") {
    val dir = Files.createTempDirectory("graft-cli-yamlhash")
    Files.writeString(dir.resolve("graft.yaml"),
      """schema_registry_url: http://host:8081/path#frag
        |bootstrap_servers: kafka://h:9092   # trailing comment
        |# full-line comment
        |""".stripMargin)
    val cfg = Cli.parse(Seq("deploy", "--project-dir", dir.toString)).toOption.get
    assert(cfg.schemaRegistryUrl.contains("http://host:8081/path#frag"))
    assert(cfg.bootstrapServers.contains("kafka://h:9092"))
  }

  test("a stray `port:` yaml key must not override --dashboard-port for run") {
    val dir = Files.createTempDirectory("graft-cli-port")
    Files.writeString(dir.resolve("graft.yaml"), "port: 9999\n")
    val run = Cli.parse(Seq("run", "--project-dir", dir.toString,
      "--dashboard-port", "3210")).toOption.get
    assert(run.dashboardPort == 3210)
    val runDefault = Cli.parse(Seq("run", "--project-dir", dir.toString)).toOption.get
    assert(runDefault.dashboardPort == 3000)
    // the dashboard verb DOES honor --port / port: (cmd/dashboard.go)
    val dash = Cli.parse(Seq("dashboard", "--project-dir", dir.toString)).toOption.get
    assert(dash.dashboardPort == 9999)
    val dashFlag = Cli.parse(Seq("dashboard", "--project-dir", dir.toString,
      "--port", "4100")).toOption.get
    assert(dashFlag.dashboardPort == 4100)
  }

  test("deploy flags parse with reference defaults (cmd/deploy.go:30-37)") {
    val dflt = Cli.parse(Seq("deploy")).toOption.get
    assert(dflt.verb == "deploy")
    assert(!dflt.clean && dflt.withSchemaRegistry)
    assert(dflt.startupTimeoutMs == 120000L)
    val cfg = Cli.parse(Seq("deploy", "--project-dir", "/tmp/p",
      "--clean", "--startup-timeout", "30s",
      "--with-schema-registry", "false",
      "--schema-registry-url", "http://127.0.0.1:8081",
      "--bootstrap-servers", "kafka://b:9092", "--dry-run")).toOption.get
    assert(cfg.clean && cfg.dryRun && !cfg.withSchemaRegistry)
    assert(cfg.startupTimeoutMs == 30000L)
    assert(cfg.schemaRegistryUrl.contains("http://127.0.0.1:8081"))
    assert(cfg.bootstrapServers.contains("kafka://b:9092"))
  }

  test("deploy --dry-run on a scaffolded project lists topics/checkpoints/subjects") {
    val dir = Files.createTempDirectory("graft-cli-deploy-dry")
    Scaffold.init(dir, "deploy-dry")
    val cfg = Cli.parse(Seq("deploy", "--project-dir", dir.toString, "--dry-run")).toOption.get
    val plan = Cli.deployPlan(cfg)
    assert(plan.head.contains(dir.toString))
    assert(plan.exists(l => l.trim.startsWith("topic: ")))
    assert(plan.exists(_.contains("checkpoint: 03_create_processing")))
    assert(plan.exists(l => l.trim.startsWith("subject: ") && l.endsWith("-value")))
    assert(plan.exists(l => l.trim.startsWith("subject: ") && l.endsWith("-key")))
    // --with-schema-registry false drops the registry subjects from the plan
    val noReg = Cli.deployPlan(cfg.copy(withSchemaRegistry = false))
    assert(!noReg.exists(_.trim.startsWith("subject: ")))
  }

  test("check: no provider configured reports setup guidance, not ready") {
    val (lines, ready) = Cli.checkProvider(Map.empty, _ => Left("unused"))
    assert(!ready)
    assert(lines.exists(_.contains("no AI provider configured")))
    assert(lines.exists(l => l.contains("PIPEGEN_OLLAMA_MODEL") &&
      l.contains("PIPEGEN_OPENAI_API_KEY")))
  }

  test("check: Ollama ready iff /api/tags lists the model (utils.go:22-63)") {
    val env = Map("PIPEGEN_OLLAMA_MODEL" -> "llama3.1",
      "PIPEGEN_OLLAMA_URL" -> "http://127.0.0.1:11434")
    // server down → "not running" guidance
    val (downLines, downReady) = Cli.checkProvider(env, _ => Left("connection refused"))
    assert(!downReady)
    assert(downLines.exists(_.contains("ollama is not running")))
    // model present (as model:latest) → ready
    val tags = """{"models":[{"name":"llama3.1:latest","size":1}]}"""
    val (okLines, okReady) = Cli.checkProvider(env, url => {
      assert(url == "http://127.0.0.1:11434/api/tags"); Right(tags)
    })
    assert(okReady)
    assert(okLines.exists(_.contains("Ollama (local) - Model: llama3.1")))
    // model absent → pull guidance
    val (missLines, missReady) =
      Cli.checkProvider(env, _ => Right("""{"models":[{"name":"other:latest"}]}"""))
    assert(!missReady)
    assert(missLines.exists(_.contains("ollama pull llama3.1")))
  }

  test("check: OpenAI needs no probe (utils.go:24-26) and reports the model") {
    val (lines, ready) = Cli.checkProvider(
      Map("PIPEGEN_OPENAI_API_KEY" -> "sk-x", "PIPEGEN_LLM_MODEL" -> "gpt-4.1"),
      _ => Left("probe must not be called for OpenAI"))
    assert(ready)
    assert(lines.exists(_.contains("OpenAI (cloud) - Model: gpt-4.1")))
  }
}

/** validate / dry-run against a scaffolded temp project (needs Spark for
  * the plan-walk destructive-op gate) — cmd/validate_test.go's shape. */
class CliValidateSpec extends SparkSpec {

  test("validate passes on a scaffolded project and flags a destructive statement") {
    val dir = Files.createTempDirectory("graft-cli-validate")
    Scaffold.init(dir, "cli-test")
    assert(Cli.validateProject(spark, dir).isEmpty)

    // plant a destructive statement like validate_test.go's invalid case
    Files.writeString(dir.resolve("sql").resolve("99_bad.sql"),
      "DROP DATABASE important;\n")
    val errors = Cli.validateProject(spark, dir)
    assert(errors.nonEmpty)
    assert(errors.exists(e => e.contains("99_bad") && e.toLowerCase.contains("dangerous")))
  }

  test("validate reports a missing sql dir") {
    val dir = Files.createTempDirectory("graft-cli-empty")
    val errors = Cli.validateProject(spark, dir)
    assert(errors.nonEmpty && errors.head.contains("no sql/"))
  }

  test("dry-run lists the statements with their classification, in order") {
    val dir = Files.createTempDirectory("graft-cli-dry")
    Scaffold.init(dir, "dry-test")
    val cfg = Cli.parse(Seq("run", "--project-dir", dir.toString, "--dry-run")).toOption.get
    val plan = Cli.dryRunPlan(cfg)
    assert(plan.exists(_.contains("message-rate: 100/s")))
    val stmts = plan.filter(_.trim.matches("\\d+\\..*"))
    assert(stmts.size == 3)
    assert(stmts(0).contains("01_create_source_table") && stmts(0).contains("CreateTable"))
    assert(stmts(2).contains("03_create_processing") && stmts(2).contains("Insert"))
  }
}
