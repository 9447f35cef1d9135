package graft.streaming

/** Mock of the `org.apache.kafka.clients.admin.AdminClient` surface that
  * [[KafkaAdminOps]] drives reflectively — same method names and erased
  * signatures, so the reflective lookups resolve against it exactly as
  * they would against the real client. Lets KafkaTopicsSpec exercise the
  * lifecycle wiring (method resolution, KafkaFuture unwrapping, the
  * delete-absent-topic tolerance walk) without a broker or the
  * kafka-clients jar. */
class FakeKafkaFuture(value: AnyRef, failure: Throwable = null) {
  def get(): AnyRef = {
    if (failure != null) throw new java.util.concurrent.ExecutionException(failure)
    value
  }
}

/** Stands in for CreateTopicsResult / DeleteTopicsResult / ListTopicsResult
  * (each exposes the one accessor KafkaAdminOps calls). */
class FakeTopicsResult(future: FakeKafkaFuture) {
  def all(): FakeKafkaFuture = future
  def names(): FakeKafkaFuture = future
}

/** Class NAME is the contract: the tolerance walk in
  * KafkaAdminOps.deleteTopic matches on `UnknownTopicOrPartition` anywhere
  * in the cause chain's class names. */
class FakeUnknownTopicOrPartitionException extends RuntimeException("no such topic")

class FakeBrokerException extends RuntimeException("broker unavailable")

class FakeAdmin(existing: java.util.Set[String],
                deleteFailure: Throwable = null) {
  val createdTopics = new java.util.ArrayList[AnyRef]()
  val deletedTopics = new java.util.ArrayList[AnyRef]()
  var closed = false

  def createTopics(ts: java.util.Collection[_]): FakeTopicsResult = {
    val it = ts.iterator()
    while (it.hasNext) createdTopics.add(it.next().asInstanceOf[AnyRef])
    new FakeTopicsResult(new FakeKafkaFuture(null))
  }

  def deleteTopics(ts: java.util.Collection[_]): FakeTopicsResult = {
    val it = ts.iterator()
    while (it.hasNext) deletedTopics.add(it.next().asInstanceOf[AnyRef])
    new FakeTopicsResult(new FakeKafkaFuture(null, deleteFailure))
  }

  def listTopics(): FakeTopicsResult =
    new FakeTopicsResult(new FakeKafkaFuture(existing))

  def close(): Unit = closed = true
}
