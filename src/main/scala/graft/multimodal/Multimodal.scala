package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.B north-star extensions).
  *
  * Media payloads are opaque `binary` columns traveling next to typed
  * metadata; Spark treats them as ordinary columns (parquet binary, column
  * pruning applies, payload bytes only read when referenced).
  *
  * Two decode tiers:
  *  - REAL JDK codecs ([[Codecs]]): grayscale-PNG encode + any-format
  *    image decode (PNG/JPEG/BMP/GIF/TIFF via `javax.imageio`),
  *    nearest-neighbor resize, and RIFF/WAV 8-bit PCM encode/decode
  *    (`javax.sound.sampled`) — see [[packGrayPng]],
  *    [[decodeImageFeatures]], [[resizePng]], [[packWavPcm8]],
  *    [[decodeAudioFeatures]]. Lossless formats make these
  *    oracle-checkable end to end (the `mm_img_*`/`mm_audio_*` queries).
  *  - The [[MediaCodec]] tier ([[extractFeatures]]/[[resize]]) for media
  *    the JDK has no codec for (video containers, compressed audio) — the
  *    Spark-side contract (schema, partition-parallel execution, batch
  *    shape) is real and tested; the codec is an injected trait whose
  *    default is the deterministic [[StubMediaCodec]], so a JNI/FFmpeg
  *    implementation is a drop-in parameter, not an edit.
  */
object Multimodal {

  /** Decoded-media feature record produced by the (stub) decoder.
    * mean_intensity_e4 = mean byte value × 10⁴ as truncated integer —
    * integer math end-to-end so the value is bit-identical in any engine
    * (a double mean invited cross-engine rounding drift). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, width: Int,
                           height: Int, mean_intensity_e4: Long)

  /** Raw (id, payload) row — public: Spark's generated deserializer code
    * must be able to reference the class. */
  case class MediaRow(media_id: Long, payload: Array[Byte])

  /** Decode + feature-extract over a (id, binary) DataFrame. Runs
    * partition-parallel via mapPartitions — per-partition imperative logic
    * is the legitimate use-case for dropping below the DataFrame API
    * (decoders are black-box byte crunchers, not expressible as Catalyst
    * expressions). Input partitioning is preserved; no shuffle.
    *
    * `codec` is the [[MediaCodec]] swap point: the default
    * [[StubMediaCodec]] is the deterministic oracle-mirrored stand-in;
    * an FFmpeg/JNI implementation drops in without touching the Spark
    * plumbing. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      codec: MediaCodec = StubMediaCodec): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // a NULL payload column deserializes to null — treat as an
          // empty media object rather than NPE-failing the whole stage
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          val d = codec.decode(payload)
          MediaFeatures(r.media_id, payload.length.toLong, d.width, d.height,
            d.meanIntensityE4)
        }
      }
  }

  /** Resized-media record: new geometry + resized payload + its byte sum
    * (integer, so the resize is oracle-checkable without shipping the
    * blob through a cross-engine binary compare). */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          resized: Array[Byte], byte_sum: Long)

  /** Resize every payload to `tw`×`th` via the [[MediaCodec]] scaler
    * (default: the oracle-mirrored [[StubMediaCodec]]) —
    * partition-parallel mapPartitions, same rationale as
    * [[extractFeatures]]. */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
             tw: Int, th: Int,
             codec: MediaCodec = StubMediaCodec): Dataset[ResizedMedia] = {
    require(tw >= 1 && th >= 1, "target dims must be >= 1")
    require(tw.toLong * th.toLong <= Int.MaxValue,
      s"target ${tw}x$th overflows a byte array")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          val out = codec.resize(payload, tw, th)
          var s = 0L
          var i = 0
          while (i < out.length) { s += (out(i) & 0xFF); i += 1 }
          ResizedMedia(r.media_id, tw, th, out, s)
        }
      }
  }

  /** Features of a REAL image decode ([[Codecs.decodeImage]]): geometry,
    * container format, and the integer pixel sum of the grayscale raster.
    * Undecodable payloads mark the row (`decode_ok = false`, zeroed
    * stats) instead of failing the stage — at 100 TB some blobs WILL be
    * corrupt. */
  case class ImageFeatures(media_id: Long, decode_ok: Boolean, format: String,
                           width: Int, height: Int, n_pixels: Long,
                           pixel_sum: Long)

  /** Pack each binary payload into a real grayscale PNG (one byte = one
    * pixel, zero-padded to the [[Codecs.packedGeometry]] rectangle).
    * mapPartitions, partitioning preserved, no shuffle — the codec is a
    * black-box byte cruncher, the legitimate case for dropping below the
    * DataFrame API. Output columns: (media_id, png). */
  def packGrayPng(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          (r.media_id, Codecs.encodeGrayPng(payload))
        }
      }
      .toDF("media_id", "png")
  }

  /** REAL image decode + feature extraction over a (id, binary) DataFrame —
    * any JDK-readable format (PNG/JPEG/BMP/GIF/TIFF). Partition-parallel,
    * no shuffle; per-row decode failures are data, not exceptions. */
  def decodeImageFeatures(df: DataFrame, idCol: String,
                          payloadCol: String): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          Codecs.decodeImage(payload) match {
            case Some(img) =>
              var s = 0L
              var i = 0
              while (i < img.pixels.length) { s += (img.pixels(i) & 0xFF); i += 1 }
              ImageFeatures(r.media_id, decode_ok = true, img.format,
                img.width, img.height, img.pixels.length.toLong, s)
            case None =>
              ImageFeatures(r.media_id, decode_ok = false, "", 0, 0, 0L, 0L)
          }
        }
      }
  }

  /** REAL resize: decode each image, nearest-neighbor resample the
    * grayscale raster to tw×th ([[Codecs.resizeNearest]] — pure integer
    * index math), and re-encode as PNG. Undecodable rows are dropped
    * (flatMap semantics; the decode-features pass is the place to audit
    * them). Output columns: (media_id, png). */
  def resizePng(df: DataFrame, idCol: String, payloadCol: String,
                tw: Int, th: Int): DataFrame = {
    require(tw >= 1 && th >= 1, "target dims must be >= 1")
    require(tw.toLong * th.toLong <= Int.MaxValue,
      s"target ${tw}x$th overflows a byte array")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          Codecs.decodeImage(payload).map { img =>
            val resized = Codecs.resizeNearest(img, tw, th)
            val out = new BufferedGray(tw, th, resized)
            (r.media_id, out.toPng)
          }
        }
      }
      .toDF("media_id", "png")
  }

  /** Minimal gray-image holder so resizePng can re-encode without going
    * back through packedGeometry (the resized raster is already exactly
    * tw×th). */
  private[multimodal] final class BufferedGray(w: Int, h: Int, px: Array[Byte]) {
    def toPng: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, px)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Audio features of a REAL WAV parse ([[Codecs.decodeWav]]): header
    * fields + integer sample sum. Same per-row failure posture as
    * [[decodeImageFeatures]]. */
  case class AudioFeatures(media_id: Long, decode_ok: Boolean,
                           sample_rate: Int, channels: Int, n_frames: Long,
                           sample_sum: Long)

  /** Pack each binary payload as a real RIFF/WAV file (8-bit unsigned PCM
    * mono, one byte = one sample). Output columns: (media_id, wav). */
  def packWavPcm8(df: DataFrame, idCol: String, payloadCol: String,
                  sampleRate: Float = 8000f): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          (r.media_id, Codecs.encodeWavPcm8(payload, sampleRate))
        }
      }
      .toDF("media_id", "wav")
  }

  /** REAL WAV decode + feature extraction (sample sum is over the raw
    * sample bytes — exact for 8-bit PCM). */
  def decodeAudioFeatures(df: DataFrame, idCol: String,
                          payloadCol: String): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.payload == null) Array.emptyByteArray else r.payload
          Codecs.decodeWav(payload) match {
            case Some(au) =>
              var s = 0L
              var i = 0
              while (i < au.samples.length) { s += (au.samples(i) & 0xFF); i += 1 }
              AudioFeatures(r.media_id, decode_ok = true, au.sampleRate,
                au.channels, au.frames, s)
            case None =>
              AudioFeatures(r.media_id, decode_ok = false, 0, 0, 0L, 0L)
          }
        }
      }
  }

  /** Frame sampling: split a binary payload into fixed-size "frames" and
    * keep every `stride`-th — a custom Generator (UDTF) expression that
    * streams frames instead of materializing the full slice array before
    * a posexplode (graft.functions.SplitFramesExpr); the chunking
    * plumbing for video-like payloads. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.graftglue.Glue
    df.select(col(idCol),
      Glue.toColumn(graft.functions.SplitFramesExpr(
        Glue.toExpr(col(payloadCol)), frameBytes, stride)))
  }
}
