package graft.cli

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.GraftSession
import graft.avro.InMemorySchemaRegistry
import graft.generator.Scaffold
import graft.llm.LlmHttpClients
import graft.runner.{Clean, Dashboard, Deploy, GraftRunner, MetricsCollector, Resources}
import graft.statements.Statements
import graft.streaming.Topics

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
      initDir: Option[Path] = None,
      // deploy-verb knobs (cmd/deploy.go:30-37): --clean recreates topics,
      // --startup-timeout caps the service waiter, --with-schema-registry
      // gates registration; URLs come from flags or graft.yaml
      clean: Boolean = false,
      startupTimeoutMs: Long = 120000L,
      withSchemaRegistry: Boolean = true,
      schemaRegistryUrl: Option[String] = None,
      bootstrapServers: Option[String] = None) {

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
    """usage: graft <init|run|validate|deploy|check|clean|dashboard|version> [flags]
      |  init <dir>     --project-name N --input-csv F --force
      |  run            --project-dir D --run-dir D --config F
      |                 --message-rate 100 --duration 30s --pipeline-timeout 5m
      |                 --expected-messages N --traffic-pattern P --dry-run
      |                 --dashboard --dashboard-port 3000
      |                 --generate-report true|false --cleanup true|false
      |  validate       --project-dir D
      |  deploy         --project-dir D --run-dir D --clean --dry-run
      |                 --startup-timeout 2m --with-schema-registry true|false
      |                 --schema-registry-url U --bootstrap-servers H:P
      |  check          (AI provider configuration + connectivity)
      |  clean          --run-dir D
      |  dashboard      --port 3000
      |  version""".stripMargin

  private val verbs =
    Set("init", "run", "validate", "deploy", "check", "clean", "dashboard", "version")

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
    * blank lines ignored; nested keys are out of scope for this config.
    * A `#` only opens a comment at line start or after whitespace — YAML
    * semantics — so values like `http://host/path#frag` survive intact. */
  def loadYaml(path: Path): Map[String, String] =
    if (!Files.isRegularFile(path)) Map.empty
    else Files.readAllLines(path).asScala.iterator
      .map(stripYamlComment(_).trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.take(i).trim -> l.drop(i + 1).trim
      }
      .toMap

  private def stripYamlComment(line: String): String = {
    val i = line.indices.find(i =>
      line(i) == '#' && (i == 0 || line(i - 1).isWhitespace))
    i.map(line.take).getOrElse(line)
  }

  /** Pure flag parser: (argv) → CliConfig or an error message. Config-file
    * values (graft.yaml / --config) fill anything not set explicitly. */
  def parse(args: Seq[String]): Either[String, CliConfig] = {
    if (args.isEmpty) return Left(usage)
    val verb = args.head
    if (!verbs(verb)) return Left(s"unknown verb '$verb'\n$usage")

    // split "--k v" pairs (and bare --flags) into a map + positionals
    var flags = Map.empty[String, String]
    var positional = List.empty[String]
    val boolFlags = Set("force", "dry-run", "dashboard", "clean")
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
      // `--port`/`port:` belong to the dashboard verb only — a stray
      // `port:` yaml key must not override --dashboard-port for `run`
      plainPort <- if (verb == "dashboard") pickInt("port", "port", port)
                   else Right(port)
      startupTimeout <- pickDuration("startup-timeout", "startup_timeout", 120000L)
      withRegistry <- pickBool("with-schema-registry", "with_schema_registry", dflt = true)
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
      initDir = positional.headOption.map(Paths.get(_)),
      clean = flags.get("clean").contains("true"),
      startupTimeoutMs = startupTimeout,
      withSchemaRegistry = withRegistry,
      schemaRegistryUrl = pick("schema-registry-url", "schema_registry_url"),
      bootstrapServers = pick("bootstrap-servers", "bootstrap_servers"))
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

  /** Version info (reference cmd/version.go:28-38: name + build metadata).
    * The Spark-native analog reports the engine plus its runtime versions
    * — the facts a bug report needs. */
  val Version: String = "0.5.0"
  def versionLines: Seq[String] = Seq(
    s"graft $Version",
    s"Spark: ${org.apache.spark.SPARK_VERSION}",
    s"Scala: ${scala.util.Properties.versionNumberString}")

  /** `deploy --dry-run`: the resources `deploy` WOULD provision (topics,
    * checkpoint dirs, registry subjects), derived purely from the project
    * layout — no Spark session, no side effects. */
  def deployPlan(cfg: CliConfig): Seq[String] = {
    val statements = Statements.load(cfg.projectDir.resolve("sql"))
    val resources = Resources.generate(statements)
    val schemasDir = cfg.projectDir.resolve("schemas")
    val schemaNames =
      if (Files.isDirectory(schemasDir))
        graft.avro.AvroSchemas.loadDirectory(schemasDir).keys.toSeq.sorted
      else Seq.empty
    val subjects = schemaNames.flatMap { name =>
      val topic = if (name == "output") resources.outputTopic else resources.inputTopic
      if (name == "output") Seq(s"$topic-value", s"$topic-key") else Seq(s"$topic-value")
    }
    Seq(s"project-dir: ${cfg.projectDir}") ++
      resources.topics.map(t => s"  topic: $t") ++
      statements.filter(s => Statements.classify(s.content) == Statements.Insert)
        .map(s => s"  checkpoint: ${s.name}") ++
      (if (cfg.withSchemaRegistry) subjects.sorted.map(s => s"  subject: $s") else Seq.empty)
  }

  /** `check` verb logic (reference cmd/check.go:29-66 +
    * internal/llm/utils.go:22-80): detect the provider from env, then
    * probe connectivity — Ollama's `/api/tags` must answer 200 and list
    * the model (or `model:latest`); non-Ollama providers need no probe
    * (utils.go:24-26). Pure over (env, httpGet) so CliSpec can drive it
    * against an in-process endpoint. Returns (report lines, ready). */
  def checkProvider(env: Map[String, String],
                    httpGet: String => Either[String, String]): (Seq[String], Boolean) =
    LlmHttpClients.fromEnv(env) match {
      case Left(_) =>
        (Seq(
          "no AI provider configured",
          "to enable AI features, set PIPEGEN_OLLAMA_MODEL (local) or " +
            "PIPEGEN_OPENAI_API_KEY (cloud)"), false)
      case Right(client: graft.llm.OllamaClient) =>
        val baseUrl = env.getOrElse("PIPEGEN_OLLAMA_URL", "http://localhost:11434")
        val info = s"provider: Ollama (local) - Model: ${client.model}, URL: $baseUrl"
        httpGet(s"${baseUrl.stripSuffix("/")}/api/tags") match {
          case Left(_) =>
            (Seq(info,
              s"ollama is not running at $baseUrl. Start it with: ollama serve"), false)
          case Right(body) =>
            val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
            val models = Option(mapper.readTree(body).get("models"))
              .map(arr => (0 until arr.size()).map(i => arr.get(i).get("name").asText()))
              .getOrElse(Seq.empty)
            if (models.contains(client.model) || models.contains(s"${client.model}:latest"))
              (Seq(info, "AI provider is ready"), true)
            else
              (Seq(info, s"model '${client.model}' is not installed. " +
                s"Install it with: ollama pull ${client.model}"), false)
        }
      case Right(client: graft.llm.OpenAiClient) =>
        (Seq(s"provider: OpenAI (cloud) - Model: ${client.model}",
          "AI provider is ready"), true)
      case Right(_) =>
        (Seq("provider: mock", "AI provider is ready"), true)
    }

  private def defaultHttpGet(url: String): Either[String, String] =
    try {
      val http = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET()
          .timeout(java.time.Duration.ofSeconds(5)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 200) Right(resp.body())
      else Left(s"status ${resp.statusCode()}")
    } catch { case e: Exception => Left(e.toString) }

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

    case "version" =>
      versionLines.foreach(println)

    case "check" =>
      val (lines, _) = checkProvider(sys.env, defaultHttpGet)
      lines.foreach(println)

    case "deploy" =>
      // cmd/deploy.go:39-213 minus the compose lifecycle (in-process
      // engine): validate layout, optionally wait for external services,
      // create topics/checkpoints, register schemas
      if (cfg.dryRun) { deployPlan(cfg).foreach(println); return }
      val spark = GraftSession.local("graft-deploy")
      try {
        val runDir = cfg.runDir.getOrElse(cfg.projectDir.resolve("run"))
        val topics = Topics.forSession(spark, runDir.toString)
        val registry: graft.avro.SchemaRegistry = cfg.schemaRegistryUrl match {
          case Some(url) if cfg.withSchemaRegistry =>
            new graft.avro.HttpSchemaRegistry(url)
          case _ => new InMemorySchemaRegistry
        }
        val services =
          cfg.bootstrapServers.map(b =>
            Deploy.ServiceCheck("kafka", b, "tcp")).toSeq ++
          (if (cfg.withSchemaRegistry)
            cfg.schemaRegistryUrl.map(u =>
              Deploy.ServiceCheck("schema-registry", s"${u.stripSuffix("/")}/subjects", "http"))
          else None)
        val waiter =
          if (services.isEmpty) None
          else Some(new Deploy.ServiceWaiter(services, timeoutMs = cfg.startupTimeoutMs))
        if (cfg.clean) { // deploy.go --clean: recreate from scratch
          val resources = Resources.generate(Statements.load(cfg.projectDir.resolve("sql")))
          resources.topics.filter(topics.topicExists).foreach(topics.deleteTopic)
        }
        val result = Deploy.run(spark, cfg.projectDir, topics, registry, waiter)
        result.topics.foreach(t => println(s"topic: $t"))
        result.checkpoints.foreach(c => println(s"checkpoint: $c"))
        result.registeredSubjects.foreach(s => println(s"subject: $s"))
        println("deployed")
      } finally spark.stop()

    case "dashboard" =>
      // standalone mode (cmd/dashboard.go --standalone): serve the empty
      // collector until interrupted
      val dash = new Dashboard(new MetricsCollector, cfg.dashboardPort).start()
      println(s"dashboard on http://127.0.0.1:${dash.boundPort}/ (ctrl-c to stop)")
      Thread.currentThread().join()

    case "run" =>
      if (cfg.dryRun) { dryRunPlan(cfg).foreach(println); return }
      val spark = GraftSession.local("graft-run")
      // a timed-out run must FAIL the command (cmd/run.go fails on
      // --pipeline-timeout expiry), not just print to stderr — the
      // watchdog records the expiry and the exit code reflects it
      val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
      try {
        val rcfg = cfg.toRunnerConfig
        // overall pipeline timeout (cmd/run.go --pipeline-timeout):
        // watchdog stops streaming queries when the cap expires, which
        // unblocks the bounded run loop
        val watchdog = new Thread(() => {
          try {
            Thread.sleep(cfg.pipelineTimeoutMs)
            timedOut.set(true)
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
          val status = if (timedOut.get) "TIMEOUT" else result.status
          println(s"execution ${result.executionId}: $status, " +
            s"produced=${result.produced}, output=${result.outputRows}, " +
            s"took ${result.durationMs} ms" +
            result.reportPath.map(p => s", report $p").getOrElse(""))
          if (cfg.cleanup) Clean.removeRunDir(rcfg.runDir)
        } finally dash.foreach(_.stop())
      } finally spark.stop()
      if (timedOut.get) sys.exit(1)
  }
}
