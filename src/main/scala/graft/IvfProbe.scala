package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch probe (r15): attribute sim_ann_ivf's wall time — the driver
  * read it as the 2nd-slowest engine row at 7.4 s @32 cores with 0.6
  * scaling (FASTER at 8 cores), the job-latency-bound signature. Times
  * each phase of the gate query separately: the brute contract arm, the
  * farthest-point init, the Lloyd iterations, the cell pair join +
  * exact verify, and the final except/count gates. Not part of the
  * driver contract. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("ivf-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"IVFPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 3) {
      println(s"IVFPROBE --- rep $rep ---")
      t("whole_query") {
        noop(SparkEntry.queries("sim_ann_ivf")(spark, dir))
      }
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
      val brute = t("brute_arm_checkpoint") {
        SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
          .select(col("id_a"), col("id_b")).localCheckpoint()
      }
      t("train_init_only_0iters") {
        Similarity.trainIvfCentroids(Tables(spark, dir, "embeddings"),
          "vec_id", "embedding", k = 8, lloydIters = 0, seed = 42)
      }
      t("train_centroids_alone") {
        Similarity.trainIvfCentroids(Tables(spark, dir, "embeddings"),
          "vec_id", "embedding", k = 8, lloydIters = 3, seed = 42)
      }
      // includes a second training run — subtract train_centroids_alone
      // for the pair-join + verify share
      val ivf = t("full_operator_checkpoint") {
        Similarity.ivfNearDupPairs(Tables(spark, dir, "embeddings"),
          "vec_id", "embedding", k = 8, probes = 3, lloydIters = 3,
          seed = 42, simThreshold = 0.3)
          .select(col("id_a"), col("id_b")).localCheckpoint()
      }
      t("except_and_counts") {
        noop(brute.agg(count(lit(1)).as("n_true"))
          .crossJoin(ivf.except(brute).agg(count(lit(1)).as("n_extra")))
          .crossJoin(ivf.agg(count(lit(1)).as("n_found")))
          .select(col("n_true"),
            (col("n_extra") === 0).as("subset_ok"),
            (col("n_found") >= col("n_true") * 0.9).as("recall_ok"),
            (col("n_found") > 0).as("nonempty")))
      }
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
    }
    spark.stop()
  }
}
