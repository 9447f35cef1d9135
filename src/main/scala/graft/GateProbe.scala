package graft

import org.apache.spark.sql.functions._

/** Scratch probe: measured error of the approximate gates (q29 HLL,
  * dedup_minhash_check) at both verify scales — used to pick tightened
  * tolerances. Not part of the driver contract. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("gate-probe")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val hll = Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact"),
          approx_count_distinct(col("o_custkey"), 0.025).as("approx"))
        .select(max(abs(col("approx") - col("exact")).cast("double") /
          col("exact").cast("double")).as("max_rel_err"))
        .head().getDouble(0)
      val docs = Tables(spark, dir, "documents")
      val mh = operators.Dedup.minHashNearDups(docs, "doc_id", "text",
        shingleN = 2, numHashes = 128, bands = 32, estThreshold = 0.1)
      val sets = docs.select(col("doc_id"),
        functions.wordShingles(functions.tokens(col("text")), 2).as("sh"))
      val mmErr = mh
        .join(sets.toDF("id_a", "sh_a"), "id_a")
        .join(sets.toDF("id_b", "sh_b"), "id_b")
        .select(abs(col("est_jaccard") -
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("e"))
        .agg(max(col("e")).as("max_abs_err"), count(lit(1)).as("pairs"))
        .head()
      println(s"PROBE $dir hll_max_rel_err=$hll minhash_max_abs_err=${mmErr.getDouble(0)} pairs=${mmErr.getLong(1)}")
    }
    spark.stop()
  }
}
