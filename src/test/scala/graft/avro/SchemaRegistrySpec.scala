package graft.avro

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Wire test of the HTTP Schema Registry client against the in-process
  * Confluent-shaped REST facade — the reference's own `httptest` pattern
  * (internal/docker/flink_test.go:14-60). The in-memory backend is the
  * semantic source of truth, so client-vs-backend equality IS the
  * correctness statement. */
class SchemaRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val backend = new InMemorySchemaRegistry
  private val server = new SchemaRegistryServer(backend).start()
  private lazy val client = new HttpSchemaRegistry(server.url)

  private val schemaA = """{"type":"record","name":"A","fields":[{"name":"x","type":"long"}]}"""
  private val schemaB = """{"type":"record","name":"B","fields":[{"name":"y","type":"string"}]}"""

  override def afterAll(): Unit = server.stop()

  test("register over HTTP assigns an id; identical schema is get-or-create") {
    val id1 = client.register("orders-value", schemaA)
    val id2 = client.register("orders-value", schemaA) // producer.go:58-61 reuse
    assert(id1 == id2)
    assert(backend.latest("orders-value").map(_._1).contains(id1))
  }

  test("a changed schema under the same subject gets a new version/id") {
    val id1 = client.register("orders-value", schemaA)
    val id3 = client.register("orders-value", schemaB)
    assert(id3 != id1)
    assert(client.latest("orders-value").map(_._1).contains(id3))
  }

  test("fetch-latest returns the registered schema text (consumer.go:302-321)") {
    client.register("events-value", schemaA)
    val Some((id, schema)) = client.latest("events-value"): @unchecked
    assert(schema == schemaA)
    assert(client.getById(id).contains(schemaA))
  }

  test("latest on an unknown subject is None (40401), getById on unknown id is None") {
    assert(client.latest("nope-value").isEmpty)
    assert(client.getById(999999).isEmpty)
  }

  test("subjects listing goes over the wire") {
    client.register("k1-value", schemaA)
    assert(client.subjectsList.contains("k1-value"))
    assert(client.subjectsList == backend.subjectsList)
  }

  test("key-schema derivation matches the deployer's single-field record (deployer.go:296-318)") {
    val ks = SchemaRegistry.keySchema("test_pipeline.results", "OutputResultKey", "name")
    val id = client.register("output-results-key", ks)
    assert(client.getById(id).contains(ks))
    assert(ks.contains("\"name\": \"OutputResultKey\""))
    assert(ks.contains("\"namespace\": \"test_pipeline.results\""))
  }
}
