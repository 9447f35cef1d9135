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
    spark.stop()
  }
}
