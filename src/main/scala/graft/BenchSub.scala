package graft

/** Dev utility: time individual SparkEntry queries by name against
  * SPARK_GRAFT_SF_DIR (default sf0.1), materializing through the `noop`
  * datasource so Catalyst cannot prune the work under a count(). */
object BenchSub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("bench-sub")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
