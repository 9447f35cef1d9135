package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.statements.Statements

class LayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("registerTables routes DDL through the statements pipeline into the catalog") {
    // exercise the REAL loader (A1): write the DDL as .sql files, load,
    // validate, substitute, deploy — then query by table NAME
    val sqlDir = Files.createTempDirectory("graft-ddl")
    Seq("orders", "nation").zipWithIndex.foreach { case (t, i) =>
      Files.write(sqlDir.resolve(f"0${i + 1}%s_create_$t%s.sql"),
        (s"-- catalog table for $t\n" + Layout.tableDdl(t)).getBytes("UTF-8"))
    }
    val stmts = Statements.load(sqlDir)
    assert(stmts.map(_.order) == Seq(1, 2))
    stmts.foreach { st =>
      assert(Statements.validate(spark, st.content).isEmpty, st.name)
      spark.sql(Statements.substitute(st.content, Map("DATA_DIR" -> sfDir)))
    }
    assert(spark.catalog.tableExists("orders"))
    assert(spark.sql("SELECT COUNT(*) AS c FROM nation").head().getLong(0) == 25L)
    spark.sql("DROP TABLE orders"); spark.sql("DROP TABLE nation")
  }

  test("registerTables re-points a table when the data dir changes") {
    Layout.registerTables(spark, sfDir, Seq("region"))
    val n1 = spark.table("region").count()
    // re-register against the same dir: no drop, still readable
    Layout.registerTables(spark, sfDir, Seq("region"))
    assert(spark.table("region").count() == n1)
    // different dir: table must be re-created at the new location
    Layout.registerTables(spark, "/root/testdata/sf0.01", Seq("region"))
    assert(spark.table("region").count() == 5L) // region is 5 rows at every sf
    spark.sql("DROP TABLE region")
  }

  test("bucketed orders-lineitem join is co-located: no shuffle exchange in the plan") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Layout.bucketize(spark, sfDir, buckets = 4)
      val joined = Layout.bucketedJoin(spark)
      val rows = joined.count()
      assert(rows > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // correctness: bucketed result ≡ path-based join
      val expect = graft.Tables(spark, sfDir, "lineitem")
        .join(graft.Tables(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(rows == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("minhash band index: incremental dedup joins the corpus buckets in place") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Layout.minhashBandIndex(spark, corpus, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 8, buckets = 4, "mh_idx")
      // one file per bucket: the repartition-before-write contract
      assert(spark.table("mh_idx_bands").inputFiles.length == 4)
      // plan shape of the candidate join: the ONLY exchange is the batch
      // side being hashed into the index's bucket layout — the corpus
      // band table must reach the join with no shuffle
      val bandedBatch = Dedup.bandedSignatures(
        Dedup.minHashSignatures(batch, "doc_id", "text", 2, 32), 8, 4)
      val pairJoin = bandedBatch.select(col("id").as("batch_id"), col("bucket"))
        .join(spark.table("mh_idx_bands")
          .select(col("id").as("corpus_id"), col("bucket")), Seq("bucket"))
      val plan = pairJoin.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange".r.findAllMatchIn(plan).size == 1,
        s"only the batch side may shuffle:\n$plan")
      // end-to-end equality with the signature-frame variant
      val viaIndex = Dedup.minHashNearDupsAgainstIndex(batch, spark, "mh_idx",
          "doc_id", "text", shingleN = 2, numHashes = 32, bands = 8,
          estThreshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val viaSigs = Dedup.minHashNearDupsAgainst(batch,
          Dedup.minHashSignatures(corpus, "doc_id", "text", 2, 32),
          "doc_id", "text", shingleN = 2, numHashes = 32, bands = 8,
          estThreshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaIndex.nonEmpty, "expected cross near-dups at sf0.01")
      assert(viaIndex == viaSigs)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS mh_idx_sigs")
      spark.sql("DROP TABLE IF EXISTS mh_idx_bands")
    }
  }

  test("fingerprint index: incremental exact dedup joins the fp buckets in place") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    // batch: fresh ids, half exact twins of corpus docs (text reused, with
    // only whitespace/case noise the canonical form must erase), half new
    val twins = corpus.filter(col("doc_id") % 2 === 0 && col("doc_id") < 400)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        upper(concat(lit("  "), col("text"), lit("\t"))).as("text"))
    val fresh = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") < 300)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" zzqx_unique_suffix")).as("text"))
    val batch = twins.unionAll(fresh)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Layout.fingerprintIndex(spark, corpus, "doc_id", "text",
        buckets = 4, "fp_idx")
      assert(spark.table("fp_idx_fps").inputFiles.length == 4)

      val dups = Dedup.exactDupsAgainstIndex(batch, spark, "fp_idx",
        "doc_id", "text")
      val plan = dups.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange".r.findAllMatchIn(plan).size == 1,
        s"only the batch side may shuffle:\n$plan")

      // every twin matches exactly its source doc (normalization erases
      // the injected case/whitespace noise); fresh docs match nothing
      val got = dups.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = twins.select(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(0) - 1000000L)).toSet
      assert(got == expect, s"got ${got.size} pairs, expected ${expect.size}")

      // append folds the batch in: re-probing the batch now also finds
      // each batch doc's own stored fingerprint
      Layout.fingerprintIndexAppend(spark, batch, "doc_id", "text",
        buckets = 4, "fp_idx")
      val again = Dedup.exactDupsAgainstIndex(batch, spark, "fp_idx",
          "doc_id", "text")
        .filter(col("batch_id") === col("corpus_id")).count()
      assert(again == batch.count(),
        s"expected every batch doc to self-match, got $again")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS fp_idx_fps")
    }
  }

  test("span gram census: incremental span removal joins the census buckets in place") {
    import graft.operators.Dedup
    val sp = spark
    import sp.implicits._
    val shared = "0123456789ABCDEFGHIJ"
    val history = Seq(
      1L -> s"history body carrying $shared exactly once",
      2L -> "independent history body with no repeats").toDF("doc_id", "text")
    val uniqueB1 = "batch one wholly novel text body kept intact"
    val batch1 = Seq(
      10L -> s"batch copy of $shared from history",
      11L -> uniqueB1).toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Layout.spanGramCensus(spark, history, "text", gramLen = 20,
        buckets = 4, "span_idx")
      assert(spark.table("span_idx_grams").inputFiles.length == 4)
      // plan shape of the census probe join: the ONLY exchange is the
      // batch's per-gram counts hashing into the census bucket layout —
      // the standing census (the 100 TB side) reaches the join in place,
      // including its LSM count fold-up (a bucket-local aggregation)
      val standing = spark.table("span_idx_grams")
        .groupBy(col("g")).agg(sum(col("c")).as("cs"))
      val probeJoin = Dedup.gramCensus(batch1, "text", 20)
        .join(standing, Seq("g"), "left")
      val plan = probeJoin.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange".r.findAllMatchIn(plan).size == 1,
        s"only the batch side may shuffle:\n$plan")
      // table-read and frame variants agree
      val viaTable = Dedup.removeRepeatedSpansAgainst(batch1, "doc_id",
        "text", spark.table("span_idx_grams"), gramLen = 20)
      val viaFrame = Dedup.removeRepeatedSpansAgainst(batch1, "doc_id",
        "text", Dedup.gramCensus(history, "text", 20), gramLen = 20)
      assert(viaTable.orderBy(col("doc_id")).collect().toSeq ===
        viaFrame.orderBy(col("doc_id")).collect().toSeq)
      val b1 = viaTable.orderBy(col("doc_id")).collect()
      assert(b1(0).getLong(2) === 1L, "history singleton + batch copy removed")
      assert(b1(1).getString(4) === uniqueB1, "novel batch text intact")
      // fold the batch's ACCEPTED (cleaned) text in — directly off the
      // lazy table-reading output, exercising the checkpoint guard
      // against the self-referential append
      Layout.spanGramCensusAppend(spark,
        viaTable.select(col("clean_text").as("text")), "text",
        gramLen = 20, srcTag = "b1", buckets = 4, tableName = "span_idx")
      // a later copy of batch1's admitted unique text is now a repeat;
      // fresh text still is not
      val batch2 = Seq(20L -> uniqueB1,
        21L -> "later batch fresh wording with no precedent").toDF("doc_id", "text")
      val b2 = Dedup.removeRepeatedSpansAgainst(batch2, "doc_id", "text",
          spark.table("span_idx_grams"), gramLen = 20)
        .orderBy(col("doc_id")).collect()
      assert(b2(0).getString(4) === "", "admitted batch-1 text now dedups")
      assert(b2(1).getLong(3) === 0L, "fresh text untouched")
      // compaction folds the LSM multi-row keys and restores single-file
      // buckets; probe results must be identical
      val preRows = spark.table("span_idx_grams").count()
      Layout.spanGramCensusCompact(spark, buckets = 4, "span_idx")
      assert(spark.table("span_idx_grams").inputFiles.length == 4)
      assert(spark.table("span_idx_grams").count() <= preRows)
      val b2c = Dedup.removeRepeatedSpansAgainst(batch2, "doc_id", "text",
          spark.table("span_idx_grams"), gramLen = 20)
        .orderBy(col("doc_id")).collect()
      assert(b2c.toSeq === b2.toSeq, "compaction must not change probe results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS span_idx_grams")
    }
  }

  test("IVF cell-partitioned layout prunes partitions on a probe filter") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, dir, "embeddings")
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 4, lloydIters = 2, seed = 42)
    try {
      Layout.ivfPartition(spark, dir, cents, "embeddings_ivf")
      val probe = spark.table("embeddings_ivf").filter(col("cell").isin(0, 1))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        s"probe filter must prune partitions:\n$plan")
      // pruning reads strictly fewer files than the full table
      val allFiles = spark.table("embeddings_ivf").inputFiles.length
      val scan = probe.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scan.nonEmpty, s"expected a file scan:\n$plan")
      assert(scan.get.inputRDDs().nonEmpty) // force lazy file listing
      // correctness: probed rows == rows whose top-1 assignment is a probed cell
      val expect = emb.select(graft.functions
          .ivfAssign(col("embedding"), cents, 1)(0).as("cell"))
        .filter(col("cell").isin(0, 1)).count()
      assert(probe.count() == expect)
      assert(probe.count() < emb.count(), "probe must not scan the whole corpus")
      assert(allFiles >= 4, "one directory per cell")
    } finally spark.sql("DROP TABLE IF EXISTS embeddings_ivf")
  }

  test("IVF x PQ composite probe against the cell layout is partition-pruned") {
    import graft.operators.{Quantize, Similarity}
    val dir = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, dir, "embeddings")
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 4, lloydIters = 2, seed = 42)
    val books = Quantize.trainPqCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, lloydIters = 2, seed = 42)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .first().getSeq[Double](0).toSeq
    try {
      Layout.ivfPartition(spark, dir, cents, "embeddings_ivfpq")
      val topk = Quantize.ivfPqTopKForVector(spark.table("embeddings_ivfpq"),
        "vec_id", "embedding", qvec, k = 10, cents, nprobe = 2, books,
        shortlist = 64, trustCellColumn = true)
      // both scans in the composite (ADC shortlist + exact re-rank) read
      // the layout through the cell partition filter — no full-corpus scan
      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        s"composite probe must prune partitions:\n$plan")
      // the AQE wrapper hides FileSourceScanExec nodes from collect, so
      // assert on the rendered plan: EVERY scan of the layout (ADC
      // shortlist + exact re-rank) must carry the cell partition filter
      val scanLines = plan.linesIterator
        .filter(_.contains("FileScan parquet")).toSeq
      assert(scanLines.nonEmpty, s"expected layout file scans:\n$plan")
      scanLines.foreach { l =>
        assert(l.contains("PartitionFilters: [cell"),
          s"every layout scan must carry the cell filter:\n$l")
      }
      // and the answer still honors the exact-re-rank contract: sims are
      // the exact decimal cosine of the emitted ids
      val got = topk.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val exact = Similarity.topKForVector(emb, "vec_id", "embedding",
          qvec, k = emb.count().toInt)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      got.foreach { case (id, sim) =>
        assert(math.abs(exact(id) - sim) < 1e-9, s"sim for $id not exact")
      }
    } finally spark.sql("DROP TABLE IF EXISTS embeddings_ivfpq")
  }

  test("registerMinhashIndex re-attaches index files from a previous session, still co-located") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    val tmp = Files.createTempDirectory("graft-idx-reattach")
    try {
      Layout.minhashBandIndex(spark, corpus, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 8, buckets = 4, "mh_reg_idx")
      val expect = Dedup.minHashNearDupsAgainstIndex(batch, spark, "mh_reg_idx",
          "doc_id", "text", shingleN = 2, numHashes = 32, bands = 8,
          estThreshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // "session ends": copy the table files out, drop the managed tables
      // (which deletes the originals) — the copies are what a next day's
      // session finds on shared storage
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(conf)
      val locs = Seq("_sigs", "_bands").map { sfx =>
        val src = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(s"mh_reg_idx$sfx"))
            .location.getPath)
        val dst = new org.apache.hadoop.fs.Path(s"$tmp/idx$sfx")
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
        sfx -> dst.toString
      }.toMap
      Seq("_sigs", "_bands").foreach(s => spark.sql(s"DROP TABLE mh_reg_idx$s"))
      // "next session": re-attach by DDL with the identical bucket spec
      Layout.registerMinhashIndex(spark, locs("_sigs"), locs("_bands"),
        buckets = 4, "mh_reg2")
      val again = Dedup.minHashNearDupsAgainstIndex(batch, spark, "mh_reg2",
        "doc_id", "text", shingleN = 2, numHashes = 32, bands = 8,
        estThreshold = 0.3)
      val got = again.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expect && got.nonEmpty)
      // the re-attached band table must still join in place: one exchange
      // (the batch side) in the candidate join
      val bandedBatch = Dedup.bandedSignatures(
        Dedup.minHashSignatures(batch, "doc_id", "text", 2, 32), 8, 4)
      val pairJoin = bandedBatch.select(col("id").as("batch_id"), col("bucket"))
        .join(spark.table("mh_reg2_bands")
          .select(col("id").as("corpus_id"), col("bucket")), Seq("bucket"))
      val plan = pairJoin.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllMatchIn(plan).size == 1,
        s"re-attached index must still read in place:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("mh_reg_idx", "mh_reg2").foreach(t => Seq("_sigs", "_bands").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $t$s")))
    }
  }

  test("minhashIndexCompact rebuilds single-file buckets and preserves probe results") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val extra1 = docs.filter(col("doc_id") % 3 === 1)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val extra2 = docs.filter(col("doc_id") % 3 === 2)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val table = "mh_compact_idx"
    Seq("_sigs", "_bands", "_sigs_new", "_bands_new").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $table$s"))
    try {
      Layout.minhashBandIndex(spark, corpus, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 8, buckets = 4, table)
      Layout.minhashIndexAppend(spark, extra1, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 8, buckets = 4, table)
      Layout.minhashIndexAppend(spark, extra2, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 8, buckets = 4, table)
      // appends accumulate files past one-per-bucket
      assert(spark.table(s"${table}_bands").inputFiles.length > 4)
      val before = Dedup.minHashNearDupsAgainstIndex(batch, spark, table,
          "doc_id", "text", shingleN = 2, numHashes = 32, bands = 8,
          estThreshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // compact with a LARGER bucket count (the corpus grew)
      Layout.minhashIndexCompact(spark, bands = 8, buckets = 8, table)
      assert(spark.table(s"${table}_bands").inputFiles.length == 8)
      assert(spark.table(s"${table}_sigs").inputFiles.length == 8)
      val after = Dedup.minHashNearDupsAgainstIndex(batch, spark, table,
          "doc_id", "text", shingleN = 2, numHashes = 32, bands = 8,
          estThreshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(before.nonEmpty && after == before)
    } finally Seq("_sigs", "_bands", "_sigs_new", "_bands_new").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $table$s"))
  }

  test("ivfPartitionAppend folds a batch into the cell layout with the pinned centroids") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, dir, "embeddings")
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 8, lloydIters = 2, seed = 42)
    // full layout schema (vec_id, embedding, label, ...) with remapped ids
    val batch = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 5000000L)
    try {
      Layout.ivfPartition(spark, dir, cents, "embeddings_ivf")
      val nBefore = spark.table("embeddings_ivf").count()
      Layout.ivfPartitionAppend(spark, batch, "embedding", cents, "embeddings_ivf")
      assert(spark.table("embeddings_ivf").count() == nBefore + batch.count())
      // appended rows landed in the cells the pinned matrix assigns: a twin
      // probe of an appended vector finds it (identical assignment)
      val probe = emb.filter(col("vec_id") === 0)
        .withColumn("vec_id", lit(9000000L))
      val found = Similarity.ivfNearDupsAgainstLayout(probe,
          spark.table("embeddings_ivf"), "vec_id", "embedding", cents,
          probes = 1, simThreshold = 0.99)
        .select(col("corpus_id")).collect().map(_.getLong(0)).toSet
      assert(found.contains(0L))
      if (spark.table("embeddings_ivf").filter(col("vec_id") === 5000000L).count() == 1)
        assert(found.contains(5000000L)) // vec 0's appended twin, same cell
    } finally spark.sql("DROP TABLE IF EXISTS embeddings_ivf")
  }

  test("ivfNearDupsAgainstLayout prunes to the batch's probed cells and finds planted twins") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, dir, "embeddings")
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 8, lloydIters = 2, seed = 42)
    // batch = exact copies of 20 corpus vectors under fresh ids: cosine
    // 1.0 twins with IDENTICAL cell assignment, so recall is deterministic
    // at any probes >= 1
    val batch = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    try {
      Layout.ivfPartition(spark, dir, cents, "embeddings_ivf")
      val corpusLayout = spark.table("embeddings_ivf")
      val got = Similarity.ivfNearDupsAgainstLayout(batch, corpusLayout,
        "vec_id", "embedding", cents, probes = 2, simThreshold = 0.8,
        materialize = false)
      val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      spark.catalog.clearCache() // materialize=false leaves batchSides cached
      // every batch vector rediscovers its twin at sim 1.0
      val twins = rows.filter { case (b, c, s) => b - 1000000L == c && s == 1.0 }
      assert(twins.length == batch.count(), s"twin recall incomplete: ${twins.length}")
      // precision: every emitted pair is a true >= 0.8 cosine pair of the
      // brute-force batch x corpus cross set
      val exact = batch.toDF("batch_id", "emb_a").crossJoin(
          emb.select(col("vec_id").as("corpus_id"), col("embedding").as("emb_b")))
        .select(col("batch_id"), col("corpus_id"),
          (graft.functions.dotProduct(col("emb_a"), col("emb_b")) /
            (sqrt(graft.functions.l2NormSq(col("emb_a"))) *
             sqrt(graft.functions.l2NormSq(col("emb_b"))))).as("sim"))
        .filter(col("sim") >= 0.7999).select("batch_id", "corpus_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.forall(t => exact.contains((t._1, t._2))),
        "emitted a pair the brute-force cross set rejects")
      // the history read is partition pruning: the layout scan must open
      // only the batch's probed cell directories, strictly fewer than k.
      // (AQE wraps executed joins: AdaptiveSparkPlanExec and QueryStageExec
      // are leaf nodes whose subtrees collect/collectLeaves do not enter)
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case o => o.children
        }
        (p match {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
          case _ => Nil
        }) ++ kids.flatMap(allScans)
      }
      val scan = allScans(got.queryExecution.executedPlan)
        .find(_.relation.location.rootPaths.exists(_.toString.contains("embeddings_ivf")))
        .getOrElse(fail("expected a pruned scan of embeddings_ivf"))
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
        "corpus scan must filter the partition column")
      val batchCellCount = batch
        .select(explode(graft.functions.ivfAssign(col("embedding"), cents, 2)).as("cell"))
        .distinct().count()
      assert(scan.selectedPartitions.partitionCount == batchCellCount,
        s"expected $batchCellCount pruned partitions, got ${scan.selectedPartitions.partitionCount}")
    } finally spark.sql("DROP TABLE IF EXISTS embeddings_ivf")
  }

  test("semDedupAgainst prunes the corpus layout and removes planted twins") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, dir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      k = 8, lloydIters = 2, seed = 42)
    // batch, three groups: corpus twins (cosine-1.0 source IN the layout,
    // identical cell — removed by the CROSS rule at any probes); fresh
    // copies of vec_id % 10 == 0 vectors, which are NOT in the corpus and
    // have no natural >= 0.8 neighbor (kept — they are each
    // neighborhood's first batch member); and second copies of the same
    // under higher ids (removed by the INTRA keep-first rule only —
    // their sole >= 0.8 precedent is the smaller-id batch copy)
    val twins = corpus.filter(col("vec_id") % 40 === 1)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val excluded = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 400)
    val first = excluded
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val second = excluded
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    val batch = twins.unionAll(first).unionAll(second)
    try {
      Layout.ivfPartitionOf(spark, corpus, "embedding", cents, "emb_sd_ivf")
      val out = Similarity.semDedupAgainst(batch, spark.table("emb_sd_ivf"),
        "vec_id", "embedding", cents, probes = 2, tau = 0.8,
        materialize = false)
      val rows = out.collect().map(r => (r.getLong(0), r.getBoolean(3)))
      spark.catalog.clearCache() // materialize=false leaves batchSides cached
      assert(rows.length == batch.count())
      val kept = rows.filter(_._2).map(_._1).toSet
      val removed = rows.filterNot(_._2).map(_._1).toSet
      assert(removed.forall(id => id < 2000000L || id >= 3000000L) &&
        rows.count(r => r._1 < 2000000L) == removed.count(_ < 2000000L),
        s"corpus twins must all be removed: $removed")
      assert(kept == rows.map(_._1).filter(id =>
        id >= 2000000L && id < 3000000L).toSet,
        "exactly the first batch copies survive (corpus precedence + intra keep-first)")
      // the corpus read is partition pruning on the batch's probed cells
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case o => o.children
        }
        (p match {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
          case _ => Nil
        }) ++ kids.flatMap(allScans)
      }
      val scan = allScans(out.queryExecution.executedPlan)
        .find(_.relation.location.rootPaths.exists(_.toString.contains("emb_sd_ivf")))
        .getOrElse(fail("expected a pruned scan of emb_sd_ivf"))
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
        "corpus scan must filter the partition column")
      val batchCellCount = batch
        .select(explode(graft.functions.ivfAssign(col("embedding"), cents, 2)).as("cell"))
        .distinct().count()
      assert(scan.selectedPartitions.partitionCount == batchCellCount,
        s"expected $batchCellCount pruned partitions, got ${scan.selectedPartitions.partitionCount}")
    } finally spark.sql("DROP TABLE IF EXISTS emb_sd_ivf")
  }

  test("topKForVectorIvf against the cell-partitioned layout prunes to nprobe partitions") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, dir, "embeddings")
    val k = 4
    val nprobe = 2
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      k = k, lloydIters = 2, seed = 42)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).collect().head.getSeq[Double](0)
    try {
      Layout.ivfPartition(spark, dir, cents, "embeddings_ivf")
      val topk = Similarity.topKForVectorIvf(spark.table("embeddings_ivf"),
        "vec_id", "embedding", qvec, k = 10, cents, nprobe = nprobe,
        assignReplicas = 1, trustCellColumn = true)
      val scan = topk.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .getOrElse(fail(s"expected a file scan:\n${topk.queryExecution.executedPlan}"))
      // the probe filter must land on the PARTITION column, not a
      // recomputed expression over the embedding
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"probe must filter the partition column:\n${topk.queryExecution.executedPlan}")
      // ...and the scan must open exactly nprobe of the k cell directories
      assert(scan.selectedPartitions.partitionCount == nprobe,
        s"expected $nprobe pruned partitions, got ${scan.selectedPartitions.partitionCount}")
      // correctness: identical result to the unpartitioned probe
      val expect = Similarity.topKForVectorIvf(emb, "vec_id", "embedding",
          qvec, k = 10, cents, nprobe = nprobe, assignReplicas = 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = topk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expect)
    } finally spark.sql("DROP TABLE IF EXISTS embeddings_ivf")
  }

  test("winnow index: incremental overlap joins the fp buckets in place") {
    import graft.operators.Winnow
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Layout.winnowIndex(spark, corpus, "doc_id", "text", k = 8, w = 6,
        buckets = 4, maxDf = None, tableName = "wn_idx")
      assert(spark.table("wn_idx_wfps").inputFiles.length == 4)
      // plan shape of the probe join: batch fingerprints (materialized —
      // their own window/distinct exchanges are the batch's text pass,
      // not the join) against the bucketed corpus sets; the ONLY
      // exchange is the batch side hashing into the bucket layout
      val batchFps = Winnow.fingerprintSets(batch, "doc_id", "text", 8, 6)
        .toDF("batch_id", "fp").localCheckpoint(true)
      val probeJoin = batchFps.join(
        spark.table("wn_idx_wfps").select(col("id").as("corpus_id"), col("fp")),
        Seq("fp"))
      val plan = probeJoin.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange".r.findAllMatchIn(plan).size == 1,
        s"only the batch side may shuffle:\n$plan")
      // table-read and frame variants agree (the text_winnow_pairs_incr
      // oracle gates the frame variant globally)
      def collectPairs(corpusFps: org.apache.spark.sql.DataFrame) =
        Winnow.overlapPairsAgainst(batch, "doc_id", "text", corpusFps,
            k = 8, w = 6, minShared = 5)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4))).toSet
      val viaTable = collectPairs(spark.table("wn_idx_wfps"))
      val viaFrame = collectPairs(
        Winnow.fingerprintSets(corpus, "doc_id", "text", 8, 6))
      assert(viaTable.nonEmpty && viaTable == viaFrame)
      // append folds the batch in: every batch doc now fully self-matches
      // at overlap 1.0 against its own stored set
      Layout.winnowIndexAppend(spark, batch, "doc_id", "text", k = 8, w = 6,
        buckets = 4, tableName = "wn_idx")
      val self = Winnow.overlapPairsAgainst(batch, "doc_id", "text",
          spark.table("wn_idx_wfps").filter(col("id").isin(
            batch.select(col("doc_id")).collect().map(_.getLong(0)).take(50)
              .map(java.lang.Long.valueOf): _*))
            .select(col("id"), col("fp"))
            .withColumn("id", col("id") + 1000000L), // distinct ids: self-pairs excluded otherwise
          k = 8, w = 6, minShared = 1)
        .filter(col("corpus_id") - 1000000L === col("batch_id"))
        .collect()
      assert(self.nonEmpty && self.forall(_.getDouble(4) == 1.0),
        "appended sets must fully contain their own documents")
      // compact with a df cap: boilerplate fps leave, buckets re-form as
      // single files, and a re-probe only loses pairs (cap ⊆ uncapped)
      Layout.winnowIndexCompact(spark, buckets = 4, maxDf = Some(40L),
        tableName = "wn_idx")
      assert(spark.table("wn_idx_wfps").inputFiles.length == 4)
      val capped = collectPairs(spark.table("wn_idx_wfps")
        .filter(col("id") % 3 =!= 0)) // corpus rows only (append added batch)
      assert(capped.map(p => (p._1, p._2)).subsetOf(
        viaTable.map(p => (p._1, p._2))),
        "df-capped probe must be a subset of the uncapped pairs")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wn_idx_wfps")
    }
  }

  test("winnow index auto cap: Some(AutoMaxDf) applies the operator's derived policy, not a -1 literal") {
    // round-11: before the sentinel was understood by dfCapped, a caller
    // aligning the index with the operator default (ADVICE r10 low)
    // would have built an EMPTY index (filter df <= -1). The policy:
    // clean corpus -> cap = floor 64 -> everything under it stays;
    // a planted every-doc boilerplate fp (df = 200 > 64) leaves.
    val sp = spark
    import sp.implicits._
    import graft.operators.Winnow
    // 1000 docs sharing one exact boilerplate sentence + unique bodies:
    // the banner's distinct fps must be under the 0.1% quantile tail of
    // the corpus's distinct-fp population for the quantile to land at
    // df = 1 (clean-corpus regime) — ~12 banner fps over ~20k+ distinct
    // body fps ≈ 0.05% here
    def hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10)
    val docs = (0L until 1000L).map { i =>
      // gram-disjoint bodies (seeded hex tokens, the entropyCorpus
      // discipline — literal patterns like w1_2 share 8-grams across
      // docs and push the df quantile above the floor)
      val body = (0 until 10).map(j => hex(s"b:$i:$j")).mkString(" ")
      (i, s"$body shared boilerplate banner line for every doc")
    }.toDF("doc_id", "text")
    try {
      Layout.winnowIndex(sp, docs, "doc_id", "text", k = 8, w = 6,
        buckets = 4, maxDf = Some(Winnow.AutoMaxDf), tableName = "wn_auto_idx")
      val idx = sp.table("wn_auto_idx_wfps")
      assert(idx.count() > 0, "auto cap must not empty the index")
      // no surviving fp may exceed the floor (the banner fps are gone)
      val maxDfLeft = idx.groupBy(col("fp")).count()
        .agg(org.apache.spark.sql.functions.max(col("count"))).head().getLong(0)
      assert(maxDfLeft <= 64L, s"boilerplate fps survived the auto cap: df $maxDfLeft")
      // and the index equals the explicitly-64-capped build (the clean
      // corpus's quantile is 1 -> cap = floor exactly)
      Layout.winnowIndex(sp, docs, "doc_id", "text", k = 8, w = 6,
        buckets = 4, maxDf = Some(64L), tableName = "wn_auto_idx_ref")
      val a = idx.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val b = sp.table("wn_auto_idx_ref_wfps").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(a == b, "auto cap on a clean corpus must equal the floor cap")
      intercept[IllegalArgumentException] {
        Layout.winnowIndex(sp, docs, "doc_id", "text", k = 8, w = 6,
          buckets = 4, maxDf = Some(-7L), tableName = "wn_auto_idx_bad")
      }
    } finally Seq("wn_auto_idx_wfps", "wn_auto_idx_ref_wfps",
      "wn_auto_idx_bad_wfps").foreach(t => sp.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
