package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe (r15): attribute dedup_edit_distance's wall time — the
  * slowest engine row of the r15 32-core full run (5.24 s in-suite,
  * 3.35/3.96 isolated min/median). Times each phase of the gate query
  * separately: the derived title corpus, the measureEditQ density
  * probes, the gram census + rarest-gram window, the long-tier candidate
  * join, the short tier, and the levenshtein verify. Not part of the
  * driver contract. */
object EditProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("edit-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"EPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.functions.tokens
    // warm + full-query reference timings (2 reps, like IsoBench)
    for (rep <- 1 to 3)
      t(s"full_query_rep$rep") {
        noop(SparkEntry.queries("dedup_edit_distance")(spark, dir))
        spark.catalog.clearCache(); System.gc()
      }

    // phase decomposition (mirrors the query body + operator internals)
    val reps = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        array_join(slice(tokens(col("text")), 1, 5), " ").as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("id"))
    val variants = reps.filter(col("id") % 4 === 0)
      .select((col("id") + 1000000L).as("id"),
        concat(lit("x"), expr("substring(t, 2)")).as("t"))
    val corpus = reps.select(col("id"), col("t")).union(variants)
    t("corpus_noop")(noop(corpus))
    println("EPROBE corpus_rows " + t("corpus_count")(corpus.count()))

    // measureEditQ: time each density probe individually
    def qgramArray(str: org.apache.spark.sql.Column, q: Int) =
      transform(sequence(lit(1), length(str) - (q - 1)),
        i => str.substr(i, lit(q)))
    var qPick = 2
    var done = false
    for (q <- 2 to 7 if !done) {
      val d = t(s"density_q$q") {
        val r = corpus.filter(length(col("t")) >= q)
          .select(explode(qgramArray(col("t"), q)).as("gram"))
          .agg(count(lit(1)).as("n"), approx_count_distinct(col("gram")).as("d"))
          .head()
        if (r.getLong(0) == 0L) 0.0
        else r.getLong(0).toDouble / math.max(r.getLong(1), 1L)
      }
      println(f"EPROBE density_q$q%d_val $d%.2f")
      qPick = q
      if (d <= 16.0) done = true
    }
    println("EPROBE q_picked " + qPick)

    val maxDist = 1
    val q = qPick
    val minLong = (maxDist + 1) * q
    val s = corpus.select(col("id").cast("long").as("id"),
      col("t").as("str"), length(col("t")).as("len"))
    val gramRows = s.filter(col("len") >= minLong)
      .select(col("id"), col("len"),
        posexplode(qgramArray(col("str"), q)).as(Seq("pos", "gram")))
    t("gram_rows_noop")(noop(gramRows))
    println("EPROBE gram_rows " + t("gram_rows_count")(gramRows.count()))
    val gdf = gramRows.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    t("gdf_noop")(noop(gdf))
    println("EPROBE gdf_rows " + t("gdf_count")(gdf.count()))
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy(col("id"))
      .orderBy(col("gdf").asc, col("gram").asc, col("pos").asc)
    val probeG = gramRows.join(gdf, "gram")
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= maxDist * q + 1)
      .select(col("id"), col("len"), col("pos"), col("gram"))
    t("probeG_noop")(noop(probeG))
    println("EPROBE probeG_rows " + t("probeG_count")(probeG.count()))
    val candLong = probeG.as("a").join(gramRows.as("b"),
        col("a.gram") === col("b.gram") &&
          col("a.id") =!= col("b.id") &&
          abs(col("a.pos") - col("b.pos")) <= maxDist &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    t("candLong_noop")(noop(candLong))
    println("EPROBE candLong_rows " + t("candLong_count")(candLong.count()))
    val shortS = s.filter(col("len") < minLong + maxDist)
    println("EPROBE short_rows " + t("short_count")(shortS.count()))
    t("full_operator_noop") {
      noop(graft.operators.Dedup.editDistancePairs(corpus, "id", "t", maxDist = 1))
    }
    spark.stop()
  }
}
