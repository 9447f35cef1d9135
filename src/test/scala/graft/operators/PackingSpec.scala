package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing checked against an independent single-node
  * reimplementation (explicit sort + running offsets + fragment loop),
  * plus the layout invariants a trainer relies on: exact-seqLen tiling,
  * per-document fragment continuity, and partition invariance. */
class PackingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (doc_id, seq_id, seq_off, frag_start, frag_len) fragments. */
  private def naivePack(docs: Seq[(Long, Long)], seqLen: Int,
                        seed: String): Seq[(Long, Long, Long, Long, Long)] = {
    val ordered = docs
      .map { case (id, n) => (md5hex(s"$seed:$id"), id, n) }
      .sortBy { case (hv, id, _) => (hv.substring(0, 2), hv, id) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var s = 0L
    for ((_, id, n) <- ordered) {
      if (n > 0) {
        var q = s / seqLen
        while (q * seqLen < s + n) {
          val fs = math.max(s, q * seqLen)
          val fe = math.min(s + n, (q + 1) * seqLen)
          out += ((id, q, fs - q * seqLen, fs - s, fe - fs))
          q += 1
        }
      }
      s += n
    }
    out.toSeq
  }

  private val docs: Seq[(Long, Long)] =
    (1L to 60L).map(i => (i, i % 11)) // counts 0..10 incl. zero-token docs

  private def run(seqLen: Int, parts: Int = 1) = {
    val sp = spark
    import sp.implicits._
    Packing.packSequences(docs.toDF("doc_id", "n_tokens").repartition(parts),
        "doc_id", "n_tokens", seqLen, seed = "ep0")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))).toSeq
  }

  test("packSequences matches the naive single-node packing, splits included") {
    val got = run(seqLen = 7)
    val expected = naivePack(docs, seqLen = 7, seed = "ep0")
    assert(got.sortBy(x => (x._2, x._3)) === expected.sortBy(x => (x._2, x._3)))
    assert(got.exists(_._5 < 7), "fixture must produce split fragments")
    assert(!got.exists(f => docs.toMap.apply(f._1) == 0L),
      "zero-token docs produce no fragments")
  }

  test("sequences tile exactly: seqLen tokens each (except the last), contiguous offsets") {
    val frags = run(seqLen = 7)
    val total = docs.map(_._2).sum
    assert(frags.map(_._5).sum === total, "every token lands exactly once")
    val bySeq = frags.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    for ((seq, fs) <- bySeq) {
      val sorted = fs.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"seq $seq must start at offset 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 + a._5 === b._3, s"gap inside seq $seq")
        case _ => ()
      }
      if (seq != lastSeq)
        assert(fs.map(_._5).sum === 7L, s"seq $seq must hold exactly seqLen")
    }
    // per-document continuity: fragments cover [0, n) in order
    for ((id, fs) <- frags.groupBy(_._1)) {
      val sorted = fs.sortBy(_._4)
      assert(sorted.head._4 === 0L)
      assert(sorted.map(_._5).sum === docs.toMap.apply(id))
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._5 === b._4)
        case _ => ()
      }
    }
  }

  test("packing is invariant to input partitioning") {
    assert(run(seqLen = 7).toSet === run(seqLen = 7, parts = 13).toSet)
  }
}
