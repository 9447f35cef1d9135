package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** The Kafka transport cannot execute in this offline sandbox (no broker,
  * no connector jars) — these tests pin down everything that CAN be
  * checked: option synthesis against the generated-DDL semantics
  * (reference internal/generator/generator.go:503-509: earliest offsets,
  * broker address, topic), the config-flag transport swap, the shared
  * lifecycle trait on the file transport, and the clear failure mode when
  * kafka-clients is absent. */
class KafkaTopicsSpec extends SparkSpec {

  private val kt = KafkaTopics("broker:29092", "/tmp/ck", Some("pipegen-consumer-x"))

  test("readOptions mirror the generated source DDL: earliest offsets, subscribe, group") {
    val o = kt.readOptions("input-topic")
    assert(o("kafka.bootstrap.servers") == "broker:29092")
    assert(o("subscribe") == "input-topic")
    assert(o("startingOffsets") == "earliest") // scan.startup.mode=earliest-offset
    assert(o("kafka.group.id") == "pipegen-consumer-x")
    assert(o("failOnDataLoss") == "false")
  }

  test("readOptions: no group option when no consumer group is configured") {
    val o = KafkaTopics("b:9092", "/tmp/ck").readOptions("t")
    assert(!o.contains("kafka.group.id"))
  }

  test("writeOptions carry broker + target topic only") {
    assert(kt.writeOptions("out") ==
      Map("kafka.bootstrap.servers" -> "broker:29092", "topic" -> "out"))
  }

  test("Topics.forSession picks the transport from spark.graft.transport") {
    val root = Files.createTempDirectory("graft-swap").toString
    assert(Topics.forSession(spark, root).isInstanceOf[FileTopics])
    spark.conf.set("spark.graft.transport", "kafka")
    spark.conf.set("spark.graft.kafka.bootstrap", "broker:29092")
    try {
      val t = Topics.forSession(spark, root)
      assert(t.isInstanceOf[KafkaTopics])
      assert(t.asInstanceOf[KafkaTopics].bootstrapServers == "broker:29092")
    } finally {
      spark.conf.unset("spark.graft.transport")
      spark.conf.unset("spark.graft.kafka.bootstrap")
    }
  }

  test("lifecycle without kafka-clients on the classpath fails with a clear message") {
    val e = intercept[IllegalStateException](kt.createTopic("t"))
    assert(e.getMessage.contains("kafka-clients"))
    assert(e.getMessage.contains("FileTopics"))
  }

  test("FileTopics implements the shared lifecycle: create/exists/delete") {
    val ft = FileTopics(Files.createTempDirectory("graft-lc").toString)
    assert(!ft.topicExists("t1"))
    ft.createTopic("t1")
    assert(ft.topicExists("t1"))
    // delete must remove produced content too
    val sp = spark
    import sp.implicits._
    ft.produce(Seq((1L, "a")).toDF("id", "s"), "t1", keyCol = Some("id"))
    ft.deleteTopic("t1")
    assert(!ft.topicExists("t1"))
  }

  // -- reflective AdminClient wiring against the mock admin (the real
  //    class is absent here; FakeAdmin mirrors its method names and erased
  //    signatures, so these tests pin the reflection itself)

  test("createTopics resolves by name+signature and drains the all() future") {
    val admin = new FakeAdmin(java.util.Collections.emptySet())
    KafkaAdminOps.createTopics(admin,
      java.util.Collections.singletonList("stand-in-newtopic"))
    assert(admin.createdTopics.size() == 1)
    assert(admin.createdTopics.get(0) == "stand-in-newtopic")
  }

  test("deleteTopic tolerates UnknownTopicOrPartition anywhere on the cause chain") {
    val admin = new FakeAdmin(java.util.Collections.emptySet(),
      deleteFailure = new FakeUnknownTopicOrPartitionException)
    KafkaAdminOps.deleteTopic(admin, "absent-topic") // must not throw
    assert(admin.deletedTopics.size() == 1 && admin.deletedTopics.get(0) == "absent-topic")
  }

  test("deleteTopic propagates every other broker failure") {
    val admin = new FakeAdmin(java.util.Collections.emptySet(),
      deleteFailure = new FakeBrokerException)
    val e = intercept[java.lang.reflect.InvocationTargetException](
      KafkaAdminOps.deleteTopic(admin, "t"))
    assert(Iterator.iterate(e.getCause.asInstanceOf[Throwable])(_.getCause)
      .takeWhile(_ != null).exists(_.isInstanceOf[FakeBrokerException]))
  }

  test("topicExists unwraps the names() future into the membership check") {
    val topics = new java.util.HashSet[String]()
    topics.add("present")
    val admin = new FakeAdmin(topics)
    assert(KafkaAdminOps.topicExists(admin, "present"))
    assert(!KafkaAdminOps.topicExists(admin, "absent"))
  }

  test("await returns the future's VALUE (not BoxedUnit) for downstream casts") {
    val payload = new java.util.HashSet[String]()
    assert(KafkaAdminOps.await(new FakeKafkaFuture(payload)) eq payload)
  }

  test("newTopic without kafka-clients fails with ClassNotFound (the documented boundary)") {
    intercept[ClassNotFoundException](KafkaAdminOps.newTopic("t", 1, 1))
  }

  test("kafka streaming read plan resolves the envelope contract (no broker contact)") {
    // format("kafka") is absent from this classpath; the CONTRACT we can
    // still pin is that decode maps (key,value,timestamp) → (key, kafka_ts,
    // payload fields) — exercised via FileTopics, which shares the trait
    // contract the Kafka decode mirrors column-for-column.
    val ft = FileTopics(Files.createTempDirectory("graft-env").toString)
    val sp = spark
    import sp.implicits._
    ft.produce(Seq((7L, "x")).toDF("id", "s"), "t", keyCol = Some("id"))
    val got = ft.readAll(spark, "t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, s STRING"))
    assert(got.columns.toSeq == Seq("id", "s"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "x")))
  }
}
