package graft.runner

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec
import graft.avro.InMemorySchemaRegistry
import graft.streaming.FileTopics

class DeploySpec extends SparkSpec {

  private def scaffold(): java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft-deploy")
    Files.createDirectories(dir.resolve("sql"))
    Files.createDirectories(dir.resolve("schemas"))
    Files.writeString(dir.resolve("schemas/input.avsc"),
      """{"type":"record","name":"InputEvent","namespace":"g","fields":[
        |  {"name":"event_id","type":"string"},{"name":"v","type":"double"}]}""".stripMargin)
    Files.writeString(dir.resolve("schemas/output_result.avsc"),
      """{"type":"record","name":"OutputResult","namespace":"g","fields":[
        |  {"name":"event_id","type":"string"},{"name":"total","type":"double"}]}""".stripMargin)
    Files.writeString(dir.resolve("sql/01_create_source_table.sql"),
      "CREATE TABLE input_events (event_id STRING, v DOUBLE) WITH ('connector' = 'kafka', 'topic' = '${INPUT_TOPIC}')")
    Files.writeString(dir.resolve("sql/02_create_output_table.sql"),
      "CREATE TABLE output_results (event_id STRING, total DOUBLE) WITH ('connector' = 'kafka', 'topic' = '${OUTPUT_TOPIC}')")
    Files.writeString(dir.resolve("sql/03_create_processing.sql"),
      "INSERT INTO output_results SELECT event_id, v AS total FROM input_events")
    dir
  }

  test("deploy creates topics, checkpoint dirs, and registers value + key schemas") {
    val project = scaffold()
    val runDir = Files.createTempDirectory("graft-deploy-run")
    val topics = FileTopics(runDir.toString)
    val registry = new InMemorySchemaRegistry
    val res = Deploy.run(spark, project, topics, registry)

    assert(res.topics.nonEmpty)
    res.topics.foreach(t => assert(topics.topicExists(t), t))
    assert(res.checkpoints.exists(_.contains("03_create_processing")))
    res.checkpoints.foreach(c => assert(Files.isDirectory(java.nio.file.Paths.get(c))))
    // value schema per topic + the output KEY schema (deployer.go:254-266)
    assert(res.registeredSubjects.exists(_.endsWith("-value")))
    assert(res.registeredSubjects.exists(_.endsWith("-key")))
    assert(registry.latest("output-results-key").exists(_._2.contains("OutputResultKey")))
  }

  test("deploy fails fast on a missing project directory (deploy.go:50-52)") {
    val e = intercept[IllegalArgumentException] {
      Deploy.run(spark, java.nio.file.Paths.get("/nonexistent-graft"),
        FileTopics("/tmp/x"), new InMemorySchemaRegistry)
    }
    assert(e.getMessage.contains("project directory"))
  }

  test("ServiceWaiter: http 2xx is up, connection-refused polls until timeout") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    val up = Deploy.ServiceCheck("sr", s"http://127.0.0.1:${server.getAddress.getPort}/", "http")
    try {
      new Deploy.ServiceWaiter(Seq(up), pollMs = 50, timeoutMs = 2000).waitForAll()
      val down = Deploy.ServiceCheck("kafka", "http://127.0.0.1:1/", "http")
      val e = intercept[IllegalStateException] {
        new Deploy.ServiceWaiter(Seq(down), pollMs = 20, timeoutMs = 150).waitForAll()
      }
      assert(e.getMessage.contains("kafka"))
    } finally server.stop(0)
  }

  test("ServiceWaiter: tcp probe accepts kafka://host:port form (deploy.go:189-196)") {
    val sock = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    try {
      val w = new Deploy.ServiceWaiter(Nil)
      assert(w.check(Deploy.ServiceCheck("broker",
        s"kafka://127.0.0.1:${sock.getLocalPort}", "tcp")))
      assert(!w.check(Deploy.ServiceCheck("broker", "kafka://127.0.0.1:1", "tcp")))
    } finally sock.close()
  }
}
