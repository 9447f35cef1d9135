package graft.multimodal

/** The swap point for media the JDK has no codec for (video containers,
  * compressed audio): [[Multimodal.extractFeatures]] and
  * [[Multimodal.resize]] are parameterized on this trait, so a real
  * FFmpeg/JNI implementation is a drop-in — the Spark-side execution
  * shape (schema, mapPartitions partition-parallelism, per-row failure
  * posture) does not change with the codec.
  *
  * Implementations MUST be:
  *  - `Serializable`: instances are captured by mapPartitions closures
  *    and shipped to executors;
  *  - deterministic per payload: the mm_* oracle queries hash-check
  *    row-for-row, and a 100 TB recompute must reproduce byte-identical
  *    features;
  *  - total: a corrupt blob must produce a marked row, not a stage
  *    failure (throwing here fails the whole task at scale).
  *
  * The JDK-backed tiers (grayscale PNG via `javax.imageio`, RIFF/WAV PCM
  * via `javax.sound.sampled`) don't implement this trait — they are real
  * codecs with their own typed surface in [[Codecs]]; this boundary
  * exists precisely for the formats where only a stub is possible in
  * this sandbox. */
trait MediaCodec extends Serializable {

  /** Decode a payload into geometry + the integer mean-intensity feature
    * (mean byte value × 10⁴, truncated — integer math end-to-end so the
    * value is bit-identical in any engine). */
  def decode(payload: Array[Byte]): MediaCodec.Decoded

  /** Resize a payload to `tw`×`th` bytes (row-major single-channel). */
  def resize(payload: Array[Byte], tw: Int, th: Int): Array[Byte]
}

object MediaCodec {
  /** Decoded-geometry record produced by [[MediaCodec.decode]]. */
  final case class Decoded(width: Int, height: Int, meanIntensityE4: Long)
}

/** ======== STUB ========
  * The deterministic stand-in codec (the default for [[Multimodal]]):
  * derives a fake geometry from the payload length and treats the raw
  * bytes as pixels. Both halves are mirrored exactly by the DuckDB
  * oracles (mm_decode_features / mm_resize), which is what makes the
  * plumbing oracle-checkable while the codec itself is fake. Replace via
  * the [[MediaCodec]] parameter with an FFmpeg/JNI codec — nothing else
  * changes. */
object StubMediaCodec extends MediaCodec {

  /** Stub geometry shared by decode and resize (and mirrored in both
    * DuckDB oracles): one definition so a real-codec swap cannot leave
    * resize computing stale geometry. */
  private def stubGeometry(n: Int): (Int, Int) = {
    val width = math.max(1, math.sqrt(n.toDouble).toInt)
    (width, math.max(1, n / width))
  }

  override def decode(payload: Array[Byte]): MediaCodec.Decoded = {
    val n = payload.length
    val (width, height) = stubGeometry(n)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xFF); i += 1 }
    val meanE4 = if (n == 0) 0L else sum * 10000L / n
    MediaCodec.Decoded(width, height, meanE4)
  }

  /** Nearest-neighbor downsample over the stub geometry (pixel (y,x) =
    * payload byte at sy*w+sx with sy = y*h/th, sx = x*w/tw — pure integer
    * index math, so any engine reproduces it). */
  override def resize(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    if (payload.isEmpty) return Array.emptyByteArray
    val n = payload.length
    val (w, h) = stubGeometry(n)
    val out = new Array[Byte](tw * th)
    var y = 0
    var i = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) { out(i) = payload(sy * w + x * w / tw); i += 1; x += 1 }
      y += 1
    }
    out
  }
}
