package graft

/** Single-query timing harness: `runMain graft.IsoBench <query>...` runs
  * the named SparkEntry queries in a fresh warmed session, two reps each,
  * against SPARK_GRAFT_SF_DIR. Exists to separate a query's own cost from
  * full-bench cross-query state (block-store pressure, GC debt): when
  * graft.Bench shows a regression, the first diagnostic is whether it
  * reproduces here in isolation. */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-iso",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    for (name <- args; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"ISO $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      System.gc() // same block-store hygiene as graft.Bench
    }
    spark.stop()
  }
}
