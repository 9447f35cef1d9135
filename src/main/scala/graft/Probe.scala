package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the dedup operators. */
object Probe {
  def t(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("probe")
    val docs = Tables(spark, dir, "documents")
    import graft.functions._

    val shingles = docs.select(col("doc_id"), wordShingles(tokens(col("text")), 2).as("shs"))
    t("warmup")(docs)
    t("shingle_arrays")(shingles)
    val sh = docs.select(col("doc_id"), explode(wordShingles(tokens(col("text")), 2)).as("sh"))
    t("shingle_explode")(sh)
    val t0 = System.nanoTime()
    val (dict, vocab) = graft.operators.Dedup.denseDictionary(
      sh.withColumnRenamed("doc_id", "id"), spark.sparkContext.defaultParallelism)
    val v = vocab.toInt
    println(f"PROBE dict_count($v) ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val docSets = sh.join(broadcast(dict), "sh")
      .groupBy(col("doc_id")).agg(collect_set(col("shid")).as("ids"))
      .select(col("doc_id"), size(col("ids")).as("sz"), bitmapFromInts(col("ids"), v).as("bm"))
    t("jacc_docsets")(docSets)
    val par = spark.sparkContext.defaultParallelism
    val a = docSets.toDF("id_a", "sz_a", "bm_a").repartition(par)
    val b = docSets.toDF("id_b", "sz_b", "bm_b")
    t("jacc_pairjoin")(a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bitAndCount(col("bm_a"), col("bm_b")).as("inter"),
        col("sz_a"), col("sz_b")))
    t("jacc_full")(graft.operators.Dedup.jaccardBitmapPairs(docs, "doc_id", "text", 2, 0.2))
    spark.stop()
  }
}
