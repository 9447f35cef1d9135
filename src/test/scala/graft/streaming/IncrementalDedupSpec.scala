package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.catalog.Layout
import graft.operators.Dedup

/** Golden for the continuous-curation loop
  * (StreamOps.dedupStreamAgainstIndex): micro-batches dedup against the
  * standing bucketed index AND against every earlier batch, because each
  * batch's signatures are folded into the index after its own check.
  */
class IncrementalDedupSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // ten distinct-vocabulary sentences: doc i shares no tokens with doc j,
  // so the only near-dup pairs are the exact-text copies planted below
  private def sentence(i: Int): String =
    (0 until 8).map(j => s"w${i}_$j").mkString(" ")

  test("streamed batches dedup against the index and all earlier batches") {
    val sp = spark
    import sp.implicits._
    val corpus = (0L until 10L).map(i => (i, sentence(i.toInt))).toDF("doc_id", "text")
    val table = "mh_stream_idx"
    Seq("_sigs", "_bands").foreach(s => sp.sql(s"DROP TABLE IF EXISTS $table$s"))
    val seen = mutable.Map[Long, Set[(Long, Long)]]()
    val in = MemoryStream[(Long, String)]
    val writer = StreamOps.dedupStreamAgainstIndex(
      in.toDF().toDF("doc_id", "text"), sp, table, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 4, buckets = 4,
      estThreshold = 0.5) { (pairs, id) =>
      seen(id) = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    try {
      Layout.minhashBandIndex(sp, corpus, "doc_id", "text",
        shingleN = 2, numHashes = 16, bands = 4, buckets = 4, table)
      val q = writer.start()
      try {
        // batch 0: two copies of corpus docs + one novel doc
        in.addData((100L, sentence(0)), (101L, sentence(1)), (102L, sentence(50)))
        q.processAllAvailable()
        // batch 1: a copy of a corpus doc, a copy of a BATCH-0 doc, novel
        in.addData((200L, sentence(2)), (201L, sentence(0)), (202L, sentence(60)))
        q.processAllAvailable()
      } finally q.stop()

      assert(seen(0L) == Set((100L, 0L), (101L, 1L)))
      // 201 matches corpus doc 0 AND batch-0 doc 100 — the latter proves
      // batch 0 was folded into the index before batch 1 arrived
      assert(seen(1L) == Set((200L, 2L), (201L, 0L), (201L, 100L)))

      // the index now holds corpus + both batches, and stays probe-able
      val after = Dedup.minHashNearDupsAgainstIndex(
          Seq((300L, sentence(50))).toDF("doc_id", "text"), sp, table,
          "doc_id", "text", shingleN = 2, numHashes = 16, bands = 4,
          estThreshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == Set((300L, 102L))) // finds the batch-0 novel doc
      assert(sp.table(s"${table}_sigs").count() == 16L) // 10 + 3 + 3
    } finally
      Seq("_sigs", "_bands").foreach(s => sp.sql(s"DROP TABLE IF EXISTS $table$s"))
  }

  test("curation loop: quality-gate, dedup survivors, fold ONLY kept docs into the index") {
    val sp = spark
    import sp.implicits._
    val corpus = (0L until 10L).map(i => (i, sentence(i.toInt))).toDF("doc_id", "text")
    val table = "mh_curate_idx"
    Seq("_sigs", "_bands").foreach(s => sp.sql(s"DROP TABLE IF EXISTS $table$s"))
    val kept = mutable.Map[Long, Set[Long]]()
    val dups = mutable.Map[Long, Set[(Long, Long)]]()
    val in = MemoryStream[(Long, String)]
    val writer = StreamOps.curateStreamAgainstIndex(
      in.toDF().toDF("doc_id", "text"), sp, table, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 4, buckets = 4,
      estThreshold = 0.5) { df =>
      df.filter(!col("text").contains("junk")) // the per-row quality gate
    } { (k, pairs, id) =>
      kept(id) = k.collect().map(_.getLong(0)).toSet
      dups(id) = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    try {
      Layout.minhashBandIndex(sp, corpus, "doc_id", "text",
        shingleN = 2, numHashes = 16, bands = 4, buckets = 4, table)
      val q = writer.start()
      try {
        // batch 0: a low-quality doc, a dup of corpus doc 3, a novel doc
        in.addData((100L, "junk junk junk spam"), (101L, sentence(3)),
          (102L, sentence(70)))
        q.processAllAvailable()
        // batch 1: a copy of the REJECTED junk doc (must NOT be a dup —
        // its original was never admitted, and it fails the gate itself),
        // a copy of batch-0's duplicate doc 101 (matches corpus 3, not
        // 101 — 101 was never folded in), a copy of batch-0's KEPT novel
        // doc (caught — 102 was folded in)
        in.addData((200L, "junk junk junk spam"), (201L, sentence(3)),
          (202L, sentence(70)))
        q.processAllAvailable()
      } finally q.stop()

      assert(kept(0L) == Set(102L), s"batch 0 kept ${kept(0L)}")
      assert(dups(0L) == Set((101L, 3L)))
      assert(kept(1L) == Set.empty, s"batch 1 kept ${kept(1L)}")
      // 201 pairs with corpus 3 ONLY (101 was rejected as a dup and not
      // folded); 202 pairs with the admitted 102; 200 pairs with nothing
      assert(dups(1L) == Set((201L, 3L), (202L, 102L)))
      // index = corpus + the single admitted document
      assert(sp.table(s"${table}_sigs").count() == 11L)
    } finally
      Seq("_sigs", "_bands").foreach(s => sp.sql(s"DROP TABLE IF EXISTS $table$s"))
  }
}
