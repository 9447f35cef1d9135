package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The REAL JDK codec tier: grayscale-PNG and WAV/PCM roundtrips must be
  * lossless (that losslessness is what makes the `mm_img_*` and
  * `mm_audio_*` oracle queries cross-engine exact), decode failures must
  * be data not exceptions, and the Spark-side mapPartitions plumbing must
  * preserve rows. */
class CodecsSpec extends SparkSpec {

  test("packedGeometry: ceil(sqrt) width, ceil-div height, floor 1x1") {
    assert(Codecs.packedGeometry(0) == (1, 1))
    assert(Codecs.packedGeometry(1) == (1, 1))
    assert(Codecs.packedGeometry(2) == (2, 1))
    assert(Codecs.packedGeometry(16) == (4, 4))
    assert(Codecs.packedGeometry(17) == (5, 4))
    assert(Codecs.packedGeometry(553) == (24, 24)) // corpus max length
  }

  test("gray PNG roundtrip is bit-exact, padding included") {
    val payload = "abcdefghijklmnopq".getBytes("UTF-8") // 17 -> 5x4, 3 pad
    val png = Codecs.encodeGrayPng(payload)
    // a real PNG container, not a stub: magic bytes
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = Codecs.decodeImage(png).get
    assert(img.format == "png" && img.width == 5 && img.height == 4)
    assert(img.pixels.take(17).toSeq == payload.toSeq)
    assert(img.pixels.drop(17).forall(_ == 0))
  }

  test("decodeImage returns None on garbage and empty input") {
    assert(Codecs.decodeImage(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Codecs.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("decodeImage reads other JDK formats (BMP) — not PNG-only") {
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 3, 2, Array[Byte](10, 20, 30, 40, 50, 60))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val back = Codecs.decodeImage(bos.toByteArray).get
    assert(back.format == "bmp" && back.width == 3 && back.height == 2)
    assert(back.pixels.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60))
  }

  test("resizeNearest: exact integer-index sampling") {
    val img = Codecs.DecodedImage(4, 4, "png",
      "abcdefghijklmnop".getBytes("UTF-8"))
    // 2x2 target: (y*4/2, x*4/2) -> indices 0,2,8,10 -> a,c,i,k
    assert(Codecs.resizeNearest(img, 2, 2).toSeq == "acik".getBytes.toSeq)
    // upscale 4x4 -> identity at same size
    assert(Codecs.resizeNearest(img, 4, 4).toSeq == img.pixels.toSeq)
  }

  test("WAV 8-bit PCM roundtrip is bit-exact with correct header fields") {
    val samples = Array[Byte](0, 10, 127, -56, -1, 64)
    val wav = Codecs.encodeWavPcm8(samples, 8000f)
    assert(wav.take(4).toSeq == "RIFF".getBytes.toSeq) // real container
    val au = Codecs.decodeWav(wav).get
    assert(au.sampleRate == 8000 && au.channels == 1 && au.bitsPerSample == 8)
    assert(au.frames == 6L && au.samples.toSeq == samples.toSeq)
  }

  test("decodeWav returns None on garbage") {
    assert(Codecs.decodeWav("not a wav".getBytes).isEmpty)
  }

  private lazy val bin = {
    val sp = spark
    import sp.implicits._
    Seq((1L, "abcdefghijklmnop"), (2L, "zz"), (3L, "x"))
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("payload"))
  }

  test("packGrayPng -> decodeImageFeatures roundtrip through Spark") {
    val png = Multimodal.packGrayPng(bin, "id", "payload")
    val feats = Multimodal.decodeImageFeatures(png, "media_id", "png")
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 3 && feats.values.forall(_.decode_ok))
    assert(feats(1L).width == 4 && feats(1L).height == 4 && feats(1L).n_pixels == 16L)
    assert(feats(1L).pixel_sum == "abcdefghijklmnop".getBytes.map(_ & 0xFF).sum.toLong)
    assert(feats(2L).width == 2 && feats(2L).height == 1)
    assert(feats(3L).width == 1 && feats(3L).height == 1 && feats(3L).pixel_sum == 'x'.toLong)
  }

  test("undecodable payloads mark the row, not the stage") {
    val sp = spark
    import sp.implicits._
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val f = Multimodal.decodeImageFeatures(junk, "id", "payload").collect().head
    assert(!f.decode_ok && f.width == 0 && f.pixel_sum == 0L)
    val a = Multimodal.decodeAudioFeatures(junk, "id", "payload").collect().head
    assert(!a.decode_ok && a.n_frames == 0L)
  }

  test("resizePng performs a real decode->resample->re-encode roundtrip") {
    val png = Multimodal.packGrayPng(bin, "id", "payload")
    val resized = Multimodal.resizePng(png, "media_id", "png", tw = 2, th = 2)
    val feats = Multimodal.decodeImageFeatures(resized, "media_id", "png")
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.values.forall(f => f.decode_ok && f.width == 2 && f.height == 2))
    // id 1: 4x4 'a'..'p' -> NN 2x2 picks a,c,i,k (same math as the stub spec)
    assert(feats(1L).pixel_sum == "acik".getBytes.map(_ & 0xFF).sum.toLong)
    // id 3: 1x1 'x' -> all four NN samples read the single pixel
    assert(feats(3L).pixel_sum == 4L * 'x'.toLong)
  }

  test("packWavPcm8 -> decodeAudioFeatures roundtrip through Spark") {
    val wav = Multimodal.packWavPcm8(bin, "id", "payload", sampleRate = 8000f)
    val feats = Multimodal.decodeAudioFeatures(wav, "media_id", "wav")
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.values.forall(f => f.decode_ok && f.sample_rate == 8000 && f.channels == 1))
    assert(feats(1L).n_frames == 16L)
    assert(feats(1L).sample_sum == "abcdefghijklmnop".getBytes.map(_ & 0xFF).sum.toLong)
    assert(feats(2L).n_frames == 2L && feats(2L).sample_sum == 2L * 'z'.toLong)
  }
}
