package graft

import org.apache.spark.sql.functions._

/** Scratch probe: phase timings + cardinalities of the prefix-filtered
  * exact-jaccard path at the bench scale, next to the bitmap path. Not
  * part of the driver contract. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("prefix-probe")
    val docs = Tables(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sh = docs.select(col("doc_id").as("id"),
        explode(graft.functions.wordShingles(graft.functions.tokens(col("text")), 2)).as("sh"))
      .distinct()
      .persist()
    println("PPROBE shingle_rows " + t("count_sh")(sh.count()))
    println("PPROBE vocab " + t("count_vocab")(sh.select(col("sh")).distinct().count()))
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("dfreq")).persist()
    println("PPROBE df_top " + dfreq.orderBy(col("dfreq").desc).limit(5)
      .collect().map(r => r.getLong(1)).mkString(","))
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("id"))
    val tthr = 0.8 - 1e-4
    val ranked = sh.join(dfreq, "sh")
      .withColumn("sz", count(lit(1)).over(byDoc))
      .withColumn("rnk", row_number().over(byDoc.orderBy(col("dfreq"), col("sh"))))
    val prefix = ranked.filter(col("rnk") <= col("sz") - ceil(col("sz") * tthr) + 1)
      .select(col("id"), col("sh")).persist()
    println("PPROBE prefix_rows " + t("count_prefix")(prefix.count()))
    val cand = prefix.toDF("id_a", "sh")
      .join(prefix.toDF("id_b", "sh_b"),
        col("sh") === col("sh_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct().persist()
    println("PPROBE candidates " + t("count_cand")(cand.count()))
    val dd = sh.groupBy(col("id"))
      .agg(sort_array(collect_list(col("sh"))).as("toks"), count(lit(1)).as("sz"))
      .persist()
    println("PPROBE docs " + t("count_docs")(dd.count()))
    val verified = cand
      .join(dd.toDF("id_a", "toks_a", "sz_a"), "id_a")
      .join(dd.toDF("id_b", "toks_b", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.sortedIntersectCount(col("toks_a"), col("toks_b")).as("inter"),
        col("sz_a"), col("sz_b"))
      .filter(graft.functions.evalBarrier(
        col("inter").cast("double") * (1.0 + tthr) >=
          (col("sz_a") + col("sz_b")).cast("double") * tthr))
    println("PPROBE verified " + t("count_verified")(verified.count()))
    t("full_operator_rep1") {
      operators.Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 2, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache(); System.gc()
    t("full_operator_rep2") {
      operators.Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 2, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache(); System.gc()
    t("bitmap_operator") {
      operators.Dedup.jaccardBitmapPairs(docs, "doc_id", "text", 2, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
