package graft

import org.apache.spark.sql.functions._

/** Dev utility: empirical scaling check for the operators whose 100 TB
  * posture the docs claim. Builds a K×-replicated copy of the sf0.1
  * documents/embeddings tables in /tmp (ids offset per replica so near-dup
  * structure replicates rather than collides), then times the scale-path
  * operators at 1× and K× — near-linear growth is the pass condition;
  * the O(n²) exact baselines are deliberately NOT run at K×.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft-scale-${k}x"
    val spark = GraftSession.local("scale-probe")

    val docs0 = Tables(spark, src, "documents")
    val emb0 = Tables(spark, src, "embeddings")
    val nDocs0 = docs0.count()
    val nEmb0 = emb0.count()
    val docs = (0 until k).map(i => docs0.select(
      (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
      col("text"))).reduce(_ unionAll _)
    val emb = (0 until k).map(i => emb0.select(
      (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
      col("embedding"))).reduce(_ unionAll _)
    docs.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    emb.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val bigDocs = spark.read.parquet(s"$dst/documents.parquet")
    val bigEmb = spark.read.parquet(s"$dst/embeddings.parquet")
    println(s"SCALE corpus: ${nDocs0} -> ${bigDocs.count()} docs, " +
      s"${nEmb0} -> ${bigEmb.count()} vectors")

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"SCALE $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }

    import graft.operators.{Dedup, Sampling, Similarity}
    // 1x warm reference numbers
    t("minhash_lsh_1x")(Dedup.minHashNearDups(docs0, "doc_id", "text", 2, 128, 32, 0.1).count())
    t(s"minhash_lsh_${k}x")(Dedup.minHashNearDups(bigDocs, "doc_id", "text", 2, 128, 32, 0.1).count())
    t("simhash_1x")(Dedup.simHashNearDups(docs0, "doc_id", "text", 3).count())
    t(s"simhash_${k}x")(Dedup.simHashNearDups(bigDocs, "doc_id", "text", 3).count())
    t("lsh_ann_1x")(Similarity.lshNearDupPairs(emb0, "vec_id", "embedding", 64, 4, 24, 42, 0.3).count())
    t(s"lsh_ann_${k}x")(Similarity.lshNearDupPairs(bigEmb, "vec_id", "embedding", 64, 4, 24, 42, 0.3).count())
    t(s"components_${k}x") {
      val pairs = Dedup.minHashNearDups(bigDocs, "doc_id", "text", 2, 128, 32, 0.5)
      Dedup.connectedComponentsStar(pairs, "id_a", "id_b").count()
    }
    t(s"split_${k}x")(Sampling.stableSplit(bigDocs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split")).count().count())
    spark.stop()
  }
}
