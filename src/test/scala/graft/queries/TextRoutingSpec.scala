package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Routing spec for the vocab-gated broadcast in the text ranking queries
  * (VERDICT_r05 next-round #2): the per-term document-frequency relation
  * is broadcast only under a measured vocabulary bound — a small vocab
  * takes the BroadcastHashJoin plan, a vocab past the bound must fall
  * back to a shuffle join (the 100 TB-safe route), and both routes must
  * return identical rows.
  */
class TextRoutingSpec extends SparkSpec {

  private def docs: DataFrame = {
    val sp = spark
    import sp.implicits._
    Seq((1L, "a b c"), (2L, "b c d"), (3L, "c d e"), (4L, "a a e f"))
      .toDF("doc_id", "text")
  }

  /** Count BroadcastHashJoin operators in the (pre-execution) physical
    * plan. The 1-row scalar folds (crossJoin of n / avgdl) appear as
    * BroadcastNestedLoopJoin and never match this. */
  private def bhjCount(df: DataFrame): Int =
    "BroadcastHashJoin".r.findAllIn(df.queryExecution.executedPlan.toString).length

  /** Run `body` with the auto-broadcast threshold disabled, so the only
    * possible source of a BroadcastHashJoin is the gate's explicit hint —
    * on test-sized data Catalyst would otherwise broadcast ANY join side
    * and both routes would look identical. */
  private def withoutAutoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body
    finally { spark.conf.set(key, prev); spark.catalog.clearCache() }
  }

  private def checkBothRoutes(mk: (DataFrame, Long) => DataFrame): Unit =
    withoutAutoBroadcast {
      val broadcastRoute = mk(docs, Long.MaxValue)
      val shuffleRoute = mk(docs, 0L)
      assert(bhjCount(broadcastRoute) == 1,
        "small vocab must take the broadcast-hinted term join")
      assert(bhjCount(shuffleRoute) == 0,
        "past the vocab bound the term join must be a shuffle join")
      val a = broadcastRoute.collect().toSeq
      val b = shuffleRoute.collect().toSeq
      assert(a == b, "routes must agree row-for-row")
      assert(a.nonEmpty)
    }

  test("text_tfidf routes broadcast under the vocab bound, shuffle past it") {
    checkBothRoutes(Text.tfidf)
  }

  test("text_bm25 routes broadcast under the vocab bound, shuffle past it") {
    checkBothRoutes(Text.bm25)
  }
}
