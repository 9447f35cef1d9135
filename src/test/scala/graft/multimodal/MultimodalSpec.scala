package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Top-level (not method-local) so the mapPartitions closure ships only
  * the codec, not the enclosing suite. */
private object FixedCodec extends MediaCodec {
  override def decode(payload: Array[Byte]): MediaCodec.Decoded =
    MediaCodec.Decoded(7, 9, 4242L)
  override def resize(payload: Array[Byte], tw: Int, th: Int): Array[Byte] =
    Array.fill(tw * th)(1.toByte)
}

class MultimodalSpec extends SparkSpec {

  private lazy val bin = {
    val sp = spark
    import sp.implicits._
    Seq((1L, "abcdefghijklmnop"), // 16 bytes -> stub geometry 4x4
      (2L, "zz"),                 // 2 bytes  -> geometry 1x2
      (3L, ""))                   // empty payload must not crash
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("payload"))
  }

  test("resize produces the exact nearest-neighbor bytes of the stub geometry") {
    val out = Multimodal.resize(bin, "id", "payload", tw = 2, th = 2)
      .collect().map(r => r.media_id -> r).toMap
    // payload 1: n=16, w=4, h=4; sy,sx for (y,x) in 2x2 = (y*4/2, x*4/2) =
    // (0,0),(0,2),(2,0),(2,2) -> bytes 'a','c','i','k'
    assert(out(1L).resized.toSeq == "acik".getBytes("UTF-8").toSeq)
    assert(out(1L).byte_sum == "acik".getBytes.map(_ & 0xFF).sum.toLong)
    // payload 2: n=2, w=1, h=2; indices (y*2/2)*1 + (x*1/2) = y -> 'z','z','z'... 2x2 of 'z'
    assert(out(2L).resized.toSeq == "zzzz".getBytes("UTF-8").toSeq)
    // empty payload -> empty resized, zero sum
    assert(out(3L).resized.isEmpty && out(3L).byte_sum == 0L)
  }

  test("resize is deterministic and keeps one row per input") {
    def run() = Multimodal.resize(bin, "id", "payload", 3, 3)
      .collect().map(r => (r.media_id, r.resized.toSeq, r.byte_sum)).toSet
    assert(run() == run())
    assert(run().size == 3)
  }

  test("a custom MediaCodec drops in without changing the Spark plumbing") {
    // the swap-point proof (VERDICT_r05 next-round #8): a fixed-output
    // codec stands in for an FFmpeg/JNI tier — extractFeatures/resize must
    // route every row through it while schema and row count stay the same
    val feats = Multimodal.extractFeatures(bin, "id", "payload", FixedCodec)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 3)
    assert(feats.values.forall(f => f.width == 7 && f.height == 9 &&
      f.mean_intensity_e4 == 4242L))
    // n_bytes still comes from the payload, not the codec
    assert(feats(1L).n_bytes == 16L && feats(3L).n_bytes == 0L)
    val resized = Multimodal.resize(bin, "id", "payload", 2, 2, FixedCodec)
      .collect().map(r => r.media_id -> r).toMap
    assert(resized.values.forall(r => r.resized.toSeq == Seq.fill(4)(1.toByte) &&
      r.byte_sum == 4L))
  }

  test("documents corpus is pure ASCII — the mm_* oracle contract") {
    // The mm_decode_features / mm_resize oracles index CHARACTERS
    // (substr/ord) while the Spark side reads UTF-8 BYTES — equivalent
    // only while every document is single-byte ASCII (MultimodalPack
    // oracle notes). Enforce the precondition so a test-data refresh with
    // non-ASCII text fails HERE with a clear message instead of as an
    // opaque hash mismatch in the driver's oracle compare.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val nonAscii = graft.Tables(spark, dir, "documents")
        .filter(length(col("text")) =!= octet_length(col("text")) ||
          col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(nonAscii == 0L,
        s"$dir/documents has $nonAscii non-ASCII rows — the mm_* " +
          "character-indexed oracles no longer match byte-indexed Spark results")
    }
  }
}
