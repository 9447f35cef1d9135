package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal

class GeneratorExpressionsSpec extends SparkSpec {

  test("split_frames generator: frame geometry, stride, ragged tail, empty/null") {
    val sp = spark
    import sp.implicits._
    val payload = Array.tabulate[Byte](25)(_.toByte) // 25 bytes, frame 10 -> 3 frames
    val df = Seq((1L, payload), (2L, Array.empty[Byte]))
      .toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, "media_id", "payload", frameBytes = 10, stride = 2)
      .select(col("media_id"), col("frame_idx"), octet_length(col("frame")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // stride 2 keeps frames 0 and 2; frame 2 is the 5-byte ragged tail
    assert(frames == Set((1L, 0, 10), (1L, 2, 5)))
  }

  test("split_frames streams rows (one row fans out without array materialization)") {
    val sp = spark
    import sp.implicits._
    val big = Array.fill[Byte](1 << 16)(7)
    val n = Seq((1L, big)).toDF("id", "payload")
      .select(org.apache.spark.sql.graftglue.Glue.toColumn(
        SplitFramesExpr(org.apache.spark.sql.graftglue.Glue.toExpr(col("payload")), 64, 1)))
      .count()
    assert(n == 1024)
  }

  test("dynamic session gap: per-row gap column drives the window") {
    val sp = spark
    import sp.implicits._
    import graft.streaming.Windows
    val df = Seq(
      ("u1", java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "short"),
      ("u1", java.sql.Timestamp.valueOf("2026-01-01 10:00:40"), "short"),
      ("u2", java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "long"),
      ("u2", java.sql.Timestamp.valueOf("2026-01-01 10:00:40"), "long")
    ).toDF("user", "ts", "kind")
    val gap = when(col("kind") === "short", lit("30 seconds")).otherwise(lit("2 minutes"))
    val sessions = Windows.flatten(
      Windows.sessionDynamic(df, "ts", gap, col("user"))
        .agg(count(lit(1)).as("cnt")))
      .select(col("user"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList.sorted
    // u1: 40s apart with 30s gap -> 2 sessions; u2: same spacing, 2m gap -> 1 session
    assert(sessions == List(("u1", 1L), ("u1", 1L), ("u2", 2L)))
  }
}
