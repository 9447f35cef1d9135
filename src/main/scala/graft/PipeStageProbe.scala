package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Scratch probe (r15): attribute op_pipeline_full − op_pipeline ≈ 29 s
  * — the sub-document stages (paragraph keep-first + span removal at
  * gram 20) over the SEEDED harness corpus, timed in isolation on the
  * same inputs the composed chain feeds them. Not part of the driver
  * contract. */
object PipeStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("pipe-stage-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PIPESTAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val seeded = PipelineHarness.corpus(spark, dir)
      .localCheckpoint(true)
    println(s"PIPESTAGE seeded rows=${seeded.count()} " +
      s"chars=${seeded.agg(sum(length(col("text")))).head().getLong(0)}")
    for (rep <- 1 to 2) {
      println(s"PIPESTAGE --- rep $rep ---")
      t("c4_gate") { noop(PipelineHarness.c4OnlyFilter(seeded)) }
      t("paragraph_keep_first") {
        noop(Dedup.dedupParagraphs(seeded, "doc_id", "text"))
      }
      t("span_removal_gram20") {
        noop(Dedup.removeRepeatedSpans(seeded, "doc_id", "text", gramLen = 20))
      }
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
    }

    // ---- composed attribution (r15 session 2): the runOnFull flow with
    // a timed action at every stage boundary, replicating
    // Curation.pipeline's materialize=true wiring verbatim so each
    // phase's first-touch cost (persist fill + its own routing jobs) is
    // visible. Σ phases ≈ the op_pipeline_full arm's 41 s.
    val table = "pipe_probe_idx"
    for (rep <- 1 to 2) {
      println(s"PIPESTAGE --- composed rep $rep ---")
      val c = PipelineHarness.corpus(spark, dir)
      t("phase_ensureIndex") { PipelineHarness.ensureIndex(spark, c, table) }
      val cols = c.columns.map(col)
      t("phase_sub_corpus") { noop(c) }
      val q = PipelineHarness.c4OnlyFilter(c).select(cols: _*)
      t("phase_sub_q_gate") { noop(q) }
      val lineClean = Curation.removeBoilerplateLines(q, "doc_id", "text", 50L,
        None)
      t("phase_sub_lineClean") { noop(lineClean) }
      val afterLines = q.drop("text")
        .join(lineClean.filter(col("n_kept") >= 1)
          .select(col("doc_id"), col("clean_text").as("text")), Seq("doc_id"))
        .select(cols: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("phase_gate_lines") { noop(afterLines) }
      val afterParas = afterLines.drop("text")
        .join(Dedup.dedupParagraphs(afterLines, "doc_id", "text")
          .filter(col("n_kept") >= 1)
          .select(col("doc_id"), col("clean_text").as("text")), Seq("doc_id"))
        .select(cols: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("phase_paragraphs") { noop(afterParas) }
      t("phase_sub_est_agg") {
        afterParas.agg(sum(length(col("text")))).head()
      }
      val cleaned = t("phase_span_construct") {
        afterParas.drop("text")
          .join(Dedup.removeRepeatedSpans(afterParas, "doc_id", "text", 20)
            .filter(col("n_removed") < col("n_chars"))
            .select(col("doc_id"), col("clean_text").as("text")), Seq("doc_id"))
          .select(cols: _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      t("phase_span_fill") { noop(cleaned) }
      val idxSurv = t("phase_index_dedup_construct") {
        Dedup.curateBatchAgainstIndex(cleaned, spark, table,
          "doc_id", "text", 2, 32, 8, 8, 0.3,
          appendSurvivors = false, materialize = true)
      }
      val intra = Dedup.minHashNearDups(idxSurv, "doc_id", "text", 2, 32, 8, 0.3)
      val afterDedup = idxSurv.join(
        intra.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      t("phase_intra_minhash") { noop(afterDedup) }
      val es = PipelineHarness.evalShingles(c)
        .select(col("s").as("__pl_s")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val esCount = t("phase_eval_count") { es.count() }
      println(s"PIPESTAGE eval_shingles $esCount")
      import graft.functions.{tokens, wordShingles}
      val contaminated = afterDedup.select(col("doc_id"),
          explode(wordShingles(tokens(col("text")), 3)).as("__pl_s"))
        .join(broadcast(es), "__pl_s")
        .select(col("doc_id")).distinct()
      val decon = afterDedup.join(contaminated, Seq("doc_id"), "left_anti")
      val accepted = t("phase_decon_checkpoint") { decon.localCheckpoint(true) }
      t("phase_mix_shard") {
        noop(graft.operators.Sampling.shardShuffle(
          graft.operators.Sampling.temperatureMix(accepted, "doc_id", "lang",
            0.5, 1000L), "doc_id", "ep0"))
      }
      Seq(afterLines, afterParas, cleaned, es).foreach(_.unpersist())
      org.apache.spark.sql.graftglue.Glue.releaseLocalCheckpoint(accepted)
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
    }
    // the arm itself, same session, for the Σ-phases comparison
    // (SPARK_GRAFT_PIPE_ARM=0 skips it when only the phases are needed)
    if (sys.env.getOrElse("SPARK_GRAFT_PIPE_ARM", "1") == "1")
      for (rep <- 1 to 2)
        t(s"op_pipeline_full_rep$rep") {
          noop(PipelineHarness.runOnFull(spark, dir, materialize = true))
          spark.catalog.clearCache(); System.gc()
        }
    spark.stop()
  }
}
