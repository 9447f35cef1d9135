package graft

import java.nio.file.{Files, Paths}

/** Focused plan dumper: `runMain graft.PlanDump <outDir> <suffix> <names>`
  * writes `<outDir>/<name>_<suffix>.txt` with the formatted physical plan
  * for each comma-separated SparkEntry query or Plans operator entry —
  * the per-round before/after evidence files (plans/r15/...), without
  * regenerating all of PLANS.md. Same session shape as graft.Plans. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.local("plandump", 8)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df =
        if (SparkEntry.queries.contains(n)) SparkEntry.queries(n)(spark, sfDir)
        else Plans.operatorPlan(spark, sfDir, n)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"),
        s"## $n\n\n```\n$plan```\n")
      println(s"PLANDUMP wrote $outDir/${n}_$suffix.txt")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
