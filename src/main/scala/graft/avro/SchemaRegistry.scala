package graft.avro

import java.net.InetSocketAddress
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Schema Registry surface (SURVEY.md A22).
  *
  * The reference talks to a Confluent Schema Registry over HTTP REST:
  * producer get-or-create (internal/pipeline/producer.go:49-82), consumer
  * fetch-latest (consumer.go:302-321), deployer registration incl. key
  * schemas (internal/docker/deployer.go:239-342). This file carries the
  * full offline-testable analog:
  *
  *  - [[SchemaRegistry]] — the client interface;
  *  - [[InMemorySchemaRegistry]] (AvroSchemas.scala) — semantic backend;
  *  - [[HttpSchemaRegistry]] — a real `java.net.http` REST client speaking
  *    the Confluent wire shapes;
  *  - [[SchemaRegistryServer]] — an in-process REST facade over the
  *    in-memory backend (the `httptest` pattern the reference's own tests
  *    use, e.g. internal/docker/flink_test.go:14-60), so the HTTP client is
  *    wire-tested with zero external services.
  */
trait SchemaRegistry {
  /** Get-or-create: identical schema under the same subject reuses its id
    * (producer.go:58-66 fetch-then-register flow). */
  def register(subject: String, schemaJson: String): Int
  def getById(id: Int): Option[String]
  /** Latest (id, schema) for a subject — the consumer's fetch
    * (consumer.go:302-321). */
  def latest(subject: String): Option[(Int, String)]
  def subjectsList: Seq[String]
}

object SchemaRegistry {
  /** Key-schema derivation for upsert sinks (deployer.go:296-318): the
    * reference registers a single-field record under `<name>-key`. */
  def keySchema(namespace: String, recordName: String, keyField: String): String =
    s"""{
       |  "type": "record",
       |  "name": "$recordName",
       |  "namespace": "$namespace",
       |  "fields": [
       |    {
       |      "name": "$keyField",
       |      "type": "string"
       |    }
       |  ]
       |}""".stripMargin
}

/** Confluent-wire REST client over `java.net.http` (blocking; the
  * reference uses a 10 s timeout client, deployer.go:240). */
final class HttpSchemaRegistry(baseUrl: String, timeoutMs: Long = 10000L)
    extends SchemaRegistry {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  private val root = baseUrl.stripSuffix("/")

  def register(subject: String, schemaJson: String): Int =
    // producer.go:58-66: try the existing latest first, register on miss
    latest(subject) match {
      case Some((id, existing)) if existing == schemaJson => id
      case _ =>
        val payload = mapper.createObjectNode()
        payload.put("schema", schemaJson)
        val resp = send(HttpRequest.newBuilder(uri(s"/subjects/$subject/versions"))
          .header("Content-Type", "application/vnd.schemaregistry.v1+json")
          .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(payload)))
          // per-request timeout like the GET path — without it only the
          // connect timeout applies and a hung registry blocks forever
          // (the reference client is hard-capped at 10 s)
          .timeout(Duration.ofMillis(timeoutMs))
          .build())
        if (resp.statusCode() >= 400)
          throw new RuntimeException(
            s"schema registration failed with status ${resp.statusCode()}") // deployer.go:338
        mapper.readTree(resp.body()).get("id").asInt()
    }

  def getById(id: Int): Option[String] =
    ok(send(getReq(s"/schemas/ids/$id")))
      .map(b => mapper.readTree(b).get("schema").asText())

  def latest(subject: String): Option[(Int, String)] =
    ok(send(getReq(s"/subjects/$subject/versions/latest"))).map { b =>
      val n = mapper.readTree(b)
      n.get("id").asInt() -> n.get("schema").asText()
    }

  def subjectsList: Seq[String] = {
    val resp = send(getReq("/subjects"))
    if (resp.statusCode() >= 400) Seq.empty
    else {
      val arr = mapper.readTree(resp.body())
      (0 until arr.size()).map(arr.get(_).asText())
    }
  }

  private def uri(path: String): URI = URI.create(root + path)
  private def getReq(path: String): HttpRequest =
    HttpRequest.newBuilder(uri(path)).GET()
      .timeout(Duration.ofMillis(timeoutMs)).build()
  private def send(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString())
  private def ok(resp: HttpResponse[String]): Option[String] =
    if (resp.statusCode() == 200) Some(resp.body()) else None
}

/** Confluent-shaped REST facade over an [[InMemorySchemaRegistry]]:
  * `POST /subjects/{s}/versions`, `GET /subjects/{s}/versions/latest`,
  * `GET /schemas/ids/{n}`, `GET /subjects`. Error bodies follow the
  * registry convention (`error_code` 40401 subject not found / 40403
  * schema not found). In-process only — the offline analog of the real
  * registry container the reference deploys. */
final class SchemaRegistryServer(backend: InMemorySchemaRegistry, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$boundPort"

  def start(): this.type = {
    server.createContext("/subjects", handle { ex =>
      val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
      (ex.getRequestMethod, parts.toList) match {
        case ("GET", "subjects" :: Nil) =>
          val arr = mapper.createArrayNode()
          backend.subjectsList.foreach(arr.add)
          200 -> mapper.writeValueAsString(arr)
        case ("POST", "subjects" :: subject :: "versions" :: Nil) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val schema = mapper.readTree(body).get("schema").asText()
          val id = backend.register(subject, schema)
          200 -> s"""{"id": $id}"""
        case ("GET", "subjects" :: subject :: "versions" :: "latest" :: Nil) =>
          backend.latest(subject) match {
            case Some((id, schema)) =>
              val node = mapper.createObjectNode()
              node.put("subject", subject)
              node.put("id", id)
              node.put("version", backend.versionCount(subject))
              node.put("schema", schema)
              200 -> mapper.writeValueAsString(node)
            case None =>
              404 -> s"""{"error_code": 40401, "message": "Subject '$subject' not found."}"""
          }
        case _ => 404 -> """{"error_code": 40401, "message": "not found"}"""
      }
    })
    server.createContext("/schemas", handle { ex =>
      val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
      (ex.getRequestMethod, parts.toList) match {
        case ("GET", "schemas" :: "ids" :: id :: Nil) if id.forall(_.isDigit) =>
          backend.getById(id.toInt) match {
            case Some(schema) =>
              val node = mapper.createObjectNode()
              node.put("schema", schema)
              200 -> mapper.writeValueAsString(node)
            case None =>
              404 -> """{"error_code": 40403, "message": "Schema not found"}"""
          }
        case _ => 404 -> """{"error_code": 40403, "message": "not found"}"""
      }
    })
    server.setExecutor(null)
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  private def handle(f: HttpExchange => (Int, String)): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => {
      val (status, body) =
        try f(ex)
        catch { case e: Exception => 500 -> s"""{"error_code": 500, "message": "${e.getMessage}"}""" }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
}
