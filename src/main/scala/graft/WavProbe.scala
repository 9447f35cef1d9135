package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Scratch probe (r15, VERDICT r14 next #8): the r14 blanket-spread A/B
  * showed mm_audio_wav REGRESSING under the scan spread while the two
  * PNG codec queries improved — hypothesis: the JDK sound stack's
  * provider lookup (AudioSystem) contends across many concurrent tasks
  * where ImageIO's does not. 6 timed reps per route (plain single-task
  * scan vs spread), same inter-rep hygiene as Bench. Not part of the
  * driver contract. */
object WavProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("wav-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def wavOf(bin: DataFrame): DataFrame =
      Multimodal.decodeAudioFeatures(
        Multimodal.packWavPcm8(bin, "doc_id", "payload", sampleRate = 8000f),
        "media_id", "wav").toDF().orderBy(col("media_id"))
    def binPlain = Tables(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    def binSpread = graft.Storage.spread(binPlain, col("doc_id"))

    for (route <- Seq("plain", "spread", "plain", "spread")) {
      val bin = if (route == "plain") binPlain else binSpread
      // one untimed warmup per route block, then 3 timed reps
      noop(wavOf(bin))
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        noop(wavOf(bin))
        println(f"WAVPROBE $route rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
      }
    }
    spark.stop()
  }
}
