package graft.runner

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.streaming.FileTopics

class AlternativeMonitorSpec extends SparkSpec {

  private val payload = StructType.fromDDL("event_id STRING, v DOUBLE")

  test("byte-growth observation and size/100 record estimate") {
    val sp = spark
    import sp.implicits._
    val t = FileTopics(Files.createTempDirectory("graft-alt").toString)
    assert(AlternativeMonitor.outputTopicGrowth(t, "out") == AlternativeMonitor.TopicGrowth(0, 0, 0))
    t.produce(Seq(("e1", 1.0), ("e2", 2.0)).toDF("event_id", "v"), "out")
    val g = AlternativeMonitor.outputTopicGrowth(t, "out")
    assert(g.files > 0 && g.bytes > 0)
    assert(g.estimatedRecords == g.bytes / 100)
  }

  test("lag reaches zero once output matches input; waitForCaughtUp observes it") {
    val sp = spark
    import sp.implicits._
    val t = FileTopics(Files.createTempDirectory("graft-alt2").toString)
    val rows = Seq(("e1", 1.0), ("e2", 2.0), ("e3", 3.0)).toDF("event_id", "v")
    t.produce(rows, "in")
    assert(AlternativeMonitor.lag(sp, t, "in", "out", payload) == 3)
    assert(!AlternativeMonitor.waitForCaughtUp(sp, t, "in", "out", payload,
      attempts = 2, intervalMs = 10))
    t.produce(rows, "out")
    assert(AlternativeMonitor.lag(sp, t, "in", "out", payload) == 0)
    assert(AlternativeMonitor.waitForCaughtUp(sp, t, "in", "out", payload,
      attempts = 1, intervalMs = 1))
  }

  test("clean removes the run directory and stops active queries") {
    val dir = Files.createTempDirectory("graft-clean")
    Files.createDirectories(dir.resolve("topics/t1"))
    Files.writeString(dir.resolve("topics/t1/part-0.json"), "{}")
    Clean.removeRunDir(dir)
    assert(!Files.exists(dir))
    assert(Clean.stopQueries(spark) >= 0) // no active queries -> 0, no throw
  }
}
