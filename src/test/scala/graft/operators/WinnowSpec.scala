package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing fingerprints (Schleimer et al. 2003) — [[Winnow
  * .winnowFingerprints]]: naive reimplementation parity, the coverage
  * guarantee (every w-window selects), the shared-substring detection
  * property the fingerprints exist for, and partition invariance. */
class WinnowSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Naive single-node winnowing with the identical normalization, hash
    * and rightmost-tie rule. */
  private def naive(text: String, k: Int, w: Int): Set[(Long, String)] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    val m = t.length - k + 1
    if (m < 1) Set.empty
    else {
      val hs = (1 to m).map(p => p.toLong -> md5hex(t.substring(p - 1, p - 1 + k)).take(16))
      val starts = 1 to math.max(m - w + 1, 1)
      starts.map { s =>
        val window = hs.slice(s - 1, math.min(s - 1 + w, m))
        // min hash, rightmost position on ties
        window.minBy { case (p, h) => (h, -p) }
      }.toSet
    }
  }

  private val texts = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "pack my box with five dozen liquor jugs and then some more text",
    3L -> "aaaaaaaaaaaaaaaaaaaaaaaa", // all-equal grams: ties everywhere
    4L -> "short", // < k chars: absent
    5L -> "exactly12ch") // few grams (< w): single global min

  private def docs = {
    val sp = spark
    import sp.implicits._
    texts.toDF("doc_id", "text")
  }

  test("winnowFingerprints matches the naive reimplementation, ties and short docs included") {
    val got = Winnow.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getString(2))).toSet).toMap
    for ((id, text) <- texts) {
      val expect = naive(text, 8, 4)
      assert(got.getOrElse(id, Set.empty) == expect,
        s"doc $id: got ${got.getOrElse(id, Set.empty)} expect $expect")
    }
    assert(!got.contains(4L), "sub-k documents are absent")
    assert(got(5L).size == 1, "a sub-w document selects its single global min")
    // doc 3 (all-equal grams): the rightmost-tie rule picks each window's
    // LAST position, so selections are one per window start — covered by
    // the naive parity above
  }

  test("coverage guarantee: every w-window of gram positions contains a selection") {
    val (id, text) = texts.head
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    val m = t.length - 8 + 1
    val sel = Winnow.winnowFingerprints(docs.filter(col("doc_id") === id),
        "doc_id", "text", k = 8, w = 4)
      .collect().map(_.getLong(1)).toSet
    for (s <- 1 to m - 4 + 1)
      assert((s until s + 4).exists(p => sel.contains(p.toLong)),
        s"window starting at $s has no selected position")
  }

  test("shared substrings of length >= w + k - 1 share a fingerprint; density ~ 2/(w+1)") {
    val sp = spark
    import sp.implicits._
    val shared = "thiscommonsubstringisquitelongindeed" // 36 chars >= 4+8-1
    val d = Seq(
      10L -> s"prefix one junk padding $shared and a suffix here",
      20L -> s"completely different preamble text $shared other tail words")
      .toDF("doc_id", "text")
    val fps = Winnow.winnowFingerprints(d, "doc_id", "text", k = 8, w = 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(2)).toSet).toMap
    assert((fps(10L) intersect fps(20L)).nonEmpty,
      "the winnowing guarantee: a >= w+k-1 shared substring must share a fingerprint")
    // density: expected ~2/(w+1) of grams selected (paper §3); allow wide slack
    val (id, text) = texts.head
    val m = text.toLowerCase.replaceAll("\\s+", " ").trim.length - 8 + 1
    val nSel = Winnow.winnowFingerprints(docs.filter(col("doc_id") === id),
        "doc_id", "text", k = 8, w = 4).count()
    assert(nSel >= m / 5 && nSel <= 4 * m / 5, s"density $nSel of $m grams")
  }

  test("winnowFingerprints is partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Winnow.winnowFingerprints(df, "doc_id", "text", k = 8, w = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }
}
