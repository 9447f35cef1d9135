package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe: times structural variants of the dedup_minhash_lsh gate
  * to attribute the round-5 regression — per-side cost, then (A) eager
  * per-side checkpoints, (B) lazy persist + single lazy action (round-4
  * shape), (C) lazy persist + eager contract checkpoint + unpersist.
  * Not part of the driver contract. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("variant-probe")
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"VARIANT $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clean(): Unit = { spark.catalog.clearCache(); System.gc() }

    val docs = Tables(spark, dir, "documents")
    def candPlan = operators.Dedup.minHashNearDups(docs, "doc_id", "text",
        shingleN = 2, numHashes = 128, bands = 32, estThreshold = 0.1)
      .select(col("id_a"), col("id_b"))
    def exactPlan = operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        shingleN = 2, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    def contract(cand: DataFrame, exactHigh: DataFrame): DataFrame =
      exactHigh.agg(count(lit(1)).as("n_exact_high"))
        .crossJoin(exactHigh.except(cand).agg(count(lit(1)).as("n_missed")))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .select(col("n_exact_high"),
          (col("n_missed") === 0).as("high_sim_covered"),
          (col("n_cand") > 0).as("nonempty"))

    for (rep <- 1 to 2) {
      t(s"cand_alone rep$rep") { noop(candPlan) }; clean()
      t(s"exact_alone rep$rep") { noop(exactPlan) }; clean()

      t(s"A_eager_sides rep$rep") {
        val cand = candPlan.localCheckpoint()
        val exactHigh = exactPlan.localCheckpoint()
        noop(contract(cand, exactHigh))
      }; clean()

      t(s"B_lazy_r4 rep$rep") {
        val cand = candPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val exactHigh = exactPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        noop(contract(cand, exactHigh))
      }; clean()

      t(s"C_lazy_eager_contract rep$rep") {
        val cand = candPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val exactHigh = exactPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = contract(cand, exactHigh).localCheckpoint(eager = true)
        cand.unpersist(); exactHigh.unpersist()
        noop(out)
      }; clean()
    }
    spark.stop()
  }
}
