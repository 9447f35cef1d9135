package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL media codecs over the JDK's built-in decoders — no external
  * libraries. `javax.imageio` ships PNG/JPEG/BMP/GIF/TIFF/WBMP readers and
  * a PNG/BMP writer; `javax.sound.sampled` ships a WAV (RIFF PCM)
  * reader/writer. Everything here is pure-JVM, headless-safe, and runs
  * inside executor tasks (each method is called from `mapPartitions`
  * closures in [[Multimodal]] — per-row byte crunching, no driver state,
  * no shuffle).
  *
  * Exactness contract (what makes these oracle-checkable): grayscale PNG
  * and 8-bit PCM WAV are LOSSLESS — a payload packed through
  * [[encodeGrayPng]]/[[encodeWavPcm8]] and read back through
  * [[decodeImage]]/[[decodeWav]] yields the original bytes bit-for-bit
  * (verified in MultimodalCodecsSpec). So integer statistics of the
  * decoded media (pixel/sample sums, geometry) can be recomputed by an
  * independent engine straight from the source bytes, while the Spark
  * side proves them through an actual encode→decode roundtrip.
  *
  * The deterministic stubs in [[Multimodal]] remain for formats the JDK
  * has no codec for (video containers, modern audio codecs); these JDK
  * paths replace the stubs for images and PCM audio.
  */
object Codecs {

  // ImageIO's default stream cache is a temp FILE per encode/decode —
  // for small per-row images that disk round trip dominates the codec
  // itself. Memory-cached streams are safe here (payloads are already
  // byte arrays) and ~an order of magnitude faster. JVM-wide, set once
  // per executor when the class loads.
  ImageIO.setUseCache(false)

  /** Geometry used to pack an n-byte payload into a grayscale image:
    * width = max(1, ceil(sqrt(n))), height = max(1, ceil(n / width)), and
    * the final w*h - n pixels are zero padding. Mirrored exactly by the
    * DuckDB oracles (`greatest(1, ceil(sqrt(n)))` + integer ceil-div —
    * IEEE sqrt is correctly rounded in both engines, and for n < 2^52 a
    * non-square n can never round to an exact integer, so ceil agrees). */
  def packedGeometry(n: Int): (Int, Int) = {
    val w = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    val h = math.max(1L, (n.toLong + w - 1) / w).toInt
    (w, h)
  }

  /** Pack raw bytes into a real grayscale PNG (one byte = one pixel,
    * row-major, zero-padded to the packed geometry). Lossless. */
  def encodeGrayPng(payload: Array[Byte]): Array[Byte] = {
    val (w, h) = packedGeometry(payload.length)
    // the packed raster is square-ish, so w*h can exceed payload.length by
    // up to w-1 — for payloads near 2^31 the Int product overflows negative
    // and Arrays.copyOf would throw an opaque NegativeArraySizeException
    require(w.toLong * h <= Int.MaxValue,
      s"payload of ${payload.length} bytes packs to $w x $h pixels, " +
        "which overflows a JVM array")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val px = java.util.Arrays.copyOf(payload, w * h) // zero padding
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A decoded image normalized to an 8-bit grayscale raster. For images
    * that are already single-channel 8-bit (our packed PNGs) the pixels
    * are the exact stored bytes; multi-channel sources go through AWT's
    * gray conversion (deterministic within a JVM, not oracle-exact). */
  final case class DecodedImage(width: Int, height: Int, format: String,
                                pixels: Array[Byte])

  /** Decode any JDK-readable image format (PNG/JPEG/BMP/GIF/TIFF/WBMP),
    * returning None for undecodable bytes instead of throwing — a corrupt
    * blob in a 100 TB corpus must mark one row, not fail the stage. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          val gray =
            if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
            else {
              val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
              val g2 = g.createGraphics()
              try g2.drawImage(img, 0, 0, null) finally g2.dispose()
              g
            }
          val px = new Array[Byte](w * h)
          gray.getRaster.getDataElements(0, 0, w, h, px)
          Some(DecodedImage(w, h, fmt, px))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Nearest-neighbor resample of a grayscale raster to tw×th: pixel
    * (y, x) reads source index (y*h/th)*w + (x*w/tw) — pure integer index
    * math, so an oracle engine reproduces the resized pixel values from
    * the source bytes without any codec. */
  def resizeNearest(img: DecodedImage, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    var y = 0
    var i = 0
    while (y < th) {
      val sy = y.toLong * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x.toLong * img.width / tw
        out(i) = img.pixels((sy * img.width + sx).toInt)
        i += 1; x += 1
      }
      y += 1
    }
    out
  }

  /** Pack raw bytes as a real RIFF/WAV file: 8-bit unsigned PCM, mono,
    * one byte = one sample frame. Lossless. */
  def encodeWavPcm8(samples: Array[Byte], sampleRate: Float): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, sampleRate,
      8, 1, 1, sampleRate, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos) finally ais.close()
    bos.toByteArray
  }

  /** Decoded audio: format header fields + the raw sample bytes. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                bitsPerSample: Int, frames: Long,
                                samples: Array[Byte])

  /** Parse a WAV container via the JDK sound stack; None for bytes that
    * are not a supported audio file (same per-row error posture as
    * [[decodeImage]]). */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        Some(DecodedAudio(f.getSampleRate.toInt, f.getChannels,
          f.getSampleSizeInBits, ais.getFrameLength, ais.readAllBytes()))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
}
