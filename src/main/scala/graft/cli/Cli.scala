package graft.cli

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.GraftSession
import graft.generator.Scaffold
import graft.runner.{Clean, Dashboard, GraftRunner, MetricsCollector}
import graft.statements.Statements

/** Unified command-line front-end — the `pipegen` verb surface
  * (reference: cmd/root.go:37-53 persistent flags + `.pipegen.yaml` via
  * viper, cmd/run.go:44-58 run flags and their defaults, cmd/init.go:38-42,
  * cmd/validate.go:25-26, cmd/clean.go:44-47, cmd/dashboard.go:61-67)
  * mapped onto the engine's existing components:
  *
  *   graft init <dir> [--project-name N] [--input-csv F] [--force]
  *   graft run [--project-dir D] [--message-rate 100] [--duration 30s]
  *             [--pipeline-timeout 5m] [--expected-messages N]
  *             [--traffic-pattern P] [--dry-run] [--dashboard]
  *             [--dashboard-port 3000] [--generate-report true]
  *             [--cleanup true] [--run-dir D]
  *   graft validate [--project-dir D]
  *   graft clean [--run-dir D]
  *   graft dashboard [--port 3000]
  *
  * Config file: `graft.yaml` in the project dir (what [[Scaffold.init]]
  * emits), or an explicit `--config F`. Precedence mirrors viper:
  * defaults < config file < explicit flags.
  *
  * Parsing is pure ([[Cli.parse]] returns Either) so CliSpec can cover the
  * flag→Config mapping without a Spark session; `main` is the thin shell
  * that builds the session and dispatches.
  */
object Cli {

  /** Parsed CLI invocation. Defaults mirror cmd/run.go:46-48: rate 100/s,
    * duration 30 s, pipeline timeout 5 min. */
  final case class CliConfig(
      verb: String,
      projectDir: Path = Paths.get("."),
      runDir: Option[Path] = None,
      messageRate: Int = 100,
      durationMs: Long = 30000L,
      pipelineTimeoutMs: Long = 300000L,
      expectedMessages: Option[Long] = None,
      cleanup: Boolean = true,
      dryRun: Boolean = false,
      dashboard: Boolean = false,
      dashboardPort: Int = 3000,
      generateReport: Boolean = true,
      trafficPattern: String = "",
      force: Boolean = false,
      inputCsv: Option[Path] = None,
      projectName: String = "graft-pipeline",
      initDir: Option[Path] = None) {

    /** The run-verb mapping onto the orchestrator's config. */
    def toRunnerConfig: GraftRunner.Config = GraftRunner.Config(
      projectDir = projectDir,
      runDir = runDir.getOrElse(projectDir.resolve("run")),
      messageRate = messageRate,
      durationMs = durationMs,
      trafficPattern = trafficPattern,
      expectedOutputRows = expectedMessages,
      generateReport = generateReport)
  }

  val usage: String =
    """usage: graft <init|run|validate|clean|dashboard> [flags]
      |  init <dir>     --project-name N --input-csv F --force
      |  run            --project-dir D --run-dir D --config F
      |                 --message-rate 100 --duration 30s --pipeline-timeout 5m
      |                 --expected-messages N --traffic-pattern P --dry-run
      |                 --dashboard --dashboard-port 3000
      |                 --generate-report true|false --cleanup true|false
      |  validate       --project-dir D
      |  clean          --run-dir D
      |  dashboard      --port 3000""".stripMargin

  private val verbs = Set("init", "run", "validate", "clean", "dashboard")

  /** `30s` / `5m` / `1500ms` / `1h` → milliseconds. Go-style duration
    * literals (cmd/run.go uses time.Duration flags); a bare number is an
    * error, matching Go's flag parsing. */
  def parseDuration(s: String): Either[String, Long] = s.trim match {
    case d if d.endsWith("ms") && d.dropRight(2).forall(_.isDigit) && d.length > 2 =>
      Right(d.dropRight(2).toLong)
    case d if d.endsWith("s") && d.dropRight(1).forall(_.isDigit) && d.length > 1 =>
      Right(d.dropRight(1).toLong * 1000L)
    case d if d.endsWith("m") && d.dropRight(1).forall(_.isDigit) && d.length > 1 =>
      Right(d.dropRight(1).toLong * 60000L)
    case d if d.endsWith("h") && d.dropRight(1).forall(_.isDigit) && d.length > 1 =>
      Right(d.dropRight(1).toLong * 3600000L)
    case other => Left(s"invalid duration '$other' (want e.g. 30s, 5m, 1500ms)")
  }

  /** Minimal `key: value` YAML subset — exactly the shape Scaffold emits
    * (and the reference's flat `.pipegen.yaml` keys). Comments (#) and
    * blank lines ignored; nested keys are out of scope for this config. */
  def loadYaml(path: Path): Map[String, String] =
    if (!Files.isRegularFile(path)) Map.empty
    else Files.readAllLines(path).asScala.iterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.take(i).trim -> l.drop(i + 1).trim
      }
      .toMap

  /** Pure flag parser: (argv) → CliConfig or an error message. Config-file
    * values (graft.yaml / --config) fill anything not set explicitly. */
  def parse(args: Seq[String]): Either[String, CliConfig] = {
    if (args.isEmpty) return Left(usage)
    val verb = args.head
    if (!verbs(verb)) return Left(s"unknown verb '$verb'\n$usage")

    // split "--k v" pairs (and bare --flags) into a map + positionals
    var flags = Map.empty[String, String]
    var positional = List.empty[String]
    val boolFlags = Set("force", "dry-run", "dashboard")
    var rest = args.tail.toList
    while (rest.nonEmpty) rest match {
      case f :: tl if f.startsWith("--") =>
        val key = f.stripPrefix("--")
        if (boolFlags(key) || tl.isEmpty || tl.head.startsWith("--")) {
          flags += key -> "true"; rest = tl
        } else { flags += key -> tl.head; rest = tl.tail }
      case p :: tl => positional :+= p; rest = tl
    }

    val projectDir = Paths.get(flags.getOrElse("project-dir", "."))
    val cfgPath = flags.get("config").map(Paths.get(_))
      .getOrElse(projectDir.resolve("graft.yaml"))
    val yaml = loadYaml(cfgPath)

    // precedence: default < yaml < flag
    def pick(flag: String, yamlKey: String): Option[String] =
      flags.get(flag).orElse(yaml.get(yamlKey))
    def pickDuration(flag: String, yamlKey: String, dflt: Long): Either[String, Long] =
      pick(flag, yamlKey).map(parseDuration).getOrElse(Right(dflt))
    def pickInt(flag: String, yamlKey: String, dflt: Int): Either[String, Int] =
      pick(flag, yamlKey) match {
        case Some(v) if v.forall(_.isDigit) && v.nonEmpty => Right(v.toInt)
        case Some(v) => Left(s"invalid integer for --$flag: '$v'")
        case None => Right(dflt)
      }
    def pickBool(flag: String, yamlKey: String, dflt: Boolean): Either[String, Boolean] =
      pick(flag, yamlKey) match {
        case Some("true") => Right(true)
        case Some("false") => Right(false)
        case Some(v) => Left(s"invalid boolean for --$flag: '$v'")
        case None => Right(dflt)
      }

    for {
      rate <- pickInt("message-rate", "message_rate", 100)
      duration <- pickDuration("duration", "duration", 30000L)
      timeout <- pickDuration("pipeline-timeout", "pipeline_timeout", 300000L)
      port <- pickInt("dashboard-port", "dashboard_port", 3000)
      plainPort <- pickInt("port", "port", port)
      cleanup <- pickBool("cleanup", "cleanup", dflt = true)
      report <- pickBool("generate-report", "generate_report", dflt = true)
      expected <- pick("expected-messages", "expected_messages") match {
        case Some(v) if v.forall(_.isDigit) && v.nonEmpty => Right(Some(v.toLong))
        case Some(v) => Left(s"invalid integer for --expected-messages: '$v'")
        case None => Right(None)
      }
      _ <- verb match {
        case "init" if positional.isEmpty && !flags.contains("project-dir") =>
          Left("init needs a target directory: graft init <dir>")
        case _ => Right(())
      }
    } yield CliConfig(
      verb = verb,
      projectDir = projectDir,
      runDir = flags.get("run-dir").map(Paths.get(_)),
      messageRate = rate,
      durationMs = duration,
      pipelineTimeoutMs = timeout,
      expectedMessages = expected,
      cleanup = cleanup,
      dryRun = flags.get("dry-run").contains("true"),
      dashboard = flags.get("dashboard").contains("true"),
      dashboardPort = plainPort,
      generateReport = report,
      trafficPattern = flags.getOrElse("traffic-pattern", yaml.getOrElse("traffic_pattern", "")),
      force = flags.get("force").contains("true"),
      inputCsv = flags.get("input-csv").map(Paths.get(_)),
      projectName = flags.get("project-name")
        .orElse(yaml.get("project"))
        .orElse(positional.headOption.map(d => Paths.get(d).getFileName.toString))
        .getOrElse("graft-pipeline"),
      initDir = positional.headOption.map(Paths.get(_)))
  }

  /** `validate` verb (reference cmd/validate.go + cmd/validate_test.go):
    * load the project's ordered statements and run each through the
    * destructive-op gate. Returns per-statement errors (empty = valid). */
  def validateProject(spark: org.apache.spark.sql.SparkSession,
                      projectDir: Path): Seq[String] = {
    val sqlDir = projectDir.resolve("sql")
    if (!Files.isDirectory(sqlDir)) Seq(s"no sql/ directory under $projectDir")
    else {
      val statements = Statements.load(sqlDir)
      if (statements.isEmpty) Seq(s"no .sql statements in $sqlDir")
      else statements.flatMap(s =>
        Statements.validate(spark, s.content).map(err => s"${s.name}: $err"))
    }
  }

  /** `run --dry-run` (reference cmd/run.go dry-run): the would-be plan as
    * printable lines, no Spark work. */
  def dryRunPlan(cfg: CliConfig): Seq[String] = {
    val statements = Statements.load(cfg.projectDir.resolve("sql"))
    Seq(
      s"project-dir: ${cfg.projectDir}",
      s"message-rate: ${cfg.messageRate}/s, duration: ${cfg.durationMs} ms, " +
        s"timeout: ${cfg.pipelineTimeoutMs} ms") ++
      statements.map(s => s"  ${s.order}. ${s.name} [${Statements.classify(s.content)}]")
  }

  def main(args: Array[String]): Unit = {
    parse(args.toIndexedSeq) match {
      case Left(err) =>
        Console.err.println(err)
        sys.exit(2)
      case Right(cfg) => dispatch(cfg)
    }
  }

  private def dispatch(cfg: CliConfig): Unit = cfg.verb match {
    case "init" =>
      val dir = cfg.initDir.getOrElse(cfg.projectDir)
      if (Files.exists(dir) && !Files.isDirectory(dir)) {
        Console.err.println(s"$dir exists and is not a directory")
        sys.exit(1)
      }
      if (Files.isDirectory(dir) && !cfg.force) {
        val listing = Files.list(dir)
        val nonEmpty = try listing.iterator().hasNext finally listing.close()
        if (nonEmpty) {
          Console.err.println(s"$dir is not empty (use --force to overwrite)")
          sys.exit(1)
        }
      }
      Files.createDirectories(dir)
      cfg.inputCsv match {
        case Some(csv) => Scaffold.initFromCsv(dir, cfg.projectName, csv)
        case None => Scaffold.init(dir, cfg.projectName)
      }
      println(s"initialized ${cfg.projectName} in $dir")

    case "validate" =>
      val spark = GraftSession.local("graft-validate")
      try {
        val errors = validateProject(spark, cfg.projectDir)
        if (errors.isEmpty) println("all statements valid")
        else { errors.foreach(Console.err.println); sys.exit(1) }
      } finally spark.stop()

    case "clean" =>
      val runDir = cfg.runDir.getOrElse(cfg.projectDir.resolve("run"))
      Clean.removeRunDir(runDir)
      println(s"removed $runDir")

    case "dashboard" =>
      // standalone mode (cmd/dashboard.go --standalone): serve the empty
      // collector until interrupted
      val dash = new Dashboard(new MetricsCollector, cfg.dashboardPort).start()
      println(s"dashboard on http://127.0.0.1:${dash.boundPort}/ (ctrl-c to stop)")
      Thread.currentThread().join()

    case "run" =>
      if (cfg.dryRun) { dryRunPlan(cfg).foreach(println); return }
      val spark = GraftSession.local("graft-run")
      try {
        val rcfg = cfg.toRunnerConfig
        // overall pipeline timeout (cmd/run.go --pipeline-timeout):
        // watchdog stops streaming queries when the cap expires, which
        // unblocks the bounded run loop
        val watchdog = new Thread(() => {
          try {
            Thread.sleep(cfg.pipelineTimeoutMs)
            Console.err.println(s"pipeline timeout after ${cfg.pipelineTimeoutMs} ms")
            Clean.stopQueries(spark)
          } catch { case _: InterruptedException => () }
        }, "graft-pipeline-timeout")
        watchdog.setDaemon(true)
        watchdog.start()
        val dash = if (cfg.dashboard) {
          val metrics = new MetricsCollector().register(spark)
          Some(new Dashboard(metrics, cfg.dashboardPort).start())
        } else None
        try {
          val result = GraftRunner.run(spark, rcfg)
          watchdog.interrupt()
          println(s"execution ${result.executionId}: ${result.status}, " +
            s"produced=${result.produced}, output=${result.outputRows}, " +
            s"took ${result.durationMs} ms" +
            result.reportPath.map(p => s", report $p").getOrElse(""))
          if (cfg.cleanup) Clean.removeRunDir(rcfg.runDir)
        } finally dash.foreach(_.stop())
      } finally spark.stop()
  }
}
