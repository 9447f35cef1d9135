package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Winnow

/** Scratch probe (r15): attribute the winnow pairs tier — df census
  * shape (max df, Σ df², joinable rows) and per-phase wall time of the
  * overlapPairs construction + action, at the bench parameters. Not
  * part of the driver contract. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("winnow-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WINNOWPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables(spark, dir, "documents")

    // df census shape at the bench parameters (k=8, w=6)
    val census = Winnow.fingerprintSets(docs, "doc_id", "text", 8, 6)
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val stats = census.agg(
      count(lit(1)).as("n_fps"),
      max(col("df")).as("max_df"),
      sum(col("df")).as("sum_df"),
      sum(col("df") * col("df")).as("sum_df2"),
      sum(when(col("df") >= 2, (col("df") * (col("df") - 1) / 2).cast("long"))
        .otherwise(0L)).as("pairs_generated"),
      sum(when(col("df") >= 2, col("df"))).as("joinable_rows")).head()
    println(s"WINNOWPROBE census n_fps=${stats.getLong(0)} max_df=${stats.getLong(1)} " +
      s"sum_df=${stats.getLong(2)} sum_df2=${stats.getLong(3)} " +
      s"pairs=${stats.getLong(4)} joinable=${stats.getLong(5)}")
    // top of the df histogram — the skew picture
    census.groupBy(col("df")).agg(count(lit(1)).as("nf"))
      .orderBy(col("df").desc).limit(12).collect()
      .foreach(r => println(s"WINNOWPROBE hist df=${r.getLong(0)} nf=${r.getLong(1)}"))

    for (rep <- 1 to 2) {
      println(s"WINNOWPROBE --- rep $rep ---")
      val pairsDf = t("construct_eager") {
        Winnow.overlapPairs(docs, "doc_id", "text", k = 8, w = 6,
          minShared = 5, maxDf = Long.MaxValue)
      }
      t("pairs_action_unsorted") { noop(pairsDf) }
      t("pairs_action_sorted") { noop(pairsDf.orderBy(col("id_a"), col("id_b"))) }
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250); System.gc()
    }
    spark.stop()
  }
}
