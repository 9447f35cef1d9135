package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators — the manual counterpart to the AQE
  * skew-join handling GraftSession enables.
  *
  * When to reach for these instead of AQE:
  *  - AQE's skew join only splits SORT-MERGE join partitions post-shuffle;
  *    a shuffled-hash join, a stateful/streaming join, or a skewed
  *    AGGREGATION key gets no help;
  *  - AQE reacts after the skewed shuffle block already exists — at a
  *    1000-executor 100 TB shuffle, one 500 GiB hot-key block can fail the
  *    fetch before AQE ever re-plans. Pre-salting prevents the block from
  *    forming at all.
  */
object Skew {

  /** Salted equi-join: spreads each hot key of the big side over `salt`
    * shuffle partitions by joining on (keys..., salt_id), with the small
    * side replicated `salt` times (explode of a 0..salt-1 sequence).
    *
    * Correct for any per-row salt assignment because every big-side row
    * carries exactly ONE salt value and the small side carries ALL of
    * them: each big row still matches exactly its key's replica set once.
    * Supported join types: inner, left / left_outer, left_semi, left_anti
    * — shapes where result rows are driven by the big side. (right/full
    * outer would emit one row per UNMATCHED small-side replica — wrong —
    * so they are rejected.)
    *
    * Cost model: small side grows ×salt (keep it broadcast-or-near-
    * broadcast sized); big side's hot key spreads across `salt` reducers,
    * turning one straggler task into `salt` even ones. */
  def saltedJoin(big: DataFrame, small: DataFrame, on: Seq[String],
                 salt: Int, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salt >= 2, "salt must be >= 2 (1 is just a plain join)")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports big-side-driven join types only, got $joinType")
    val saltCol = "__graft_salt"
    val bigS = big.withColumn(saltCol, floor(rand(seed) * salt).cast("int"))
    val smallS = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, on :+ saltCol, joinType).drop(saltCol)
  }

  /** Exact COUNT(DISTINCT value) per key for skewed keys, as two even
    * aggregations instead of one hot one.
    *
    * Stage 1 groups by (key, xxhash64(value) % salt) and counts distinct
    * values inside each shard; stage 2 sums the shard counts per key.
    * EXACT (not approximate): hashing the VALUE assigns every distinct
    * value to exactly one shard, so shard-distinct-counts partition the
    * key's distinct set and their sum is its cardinality. A key with
    * 10^9 distinct values becomes `salt` tasks of 10^9/salt values each
    * instead of one straggler holding a 10^9-entry hash set. */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          salt: Int, outCol: String = "distinct_cnt"): DataFrame = {
    require(salt >= 2, "salt must be >= 2")
    df.groupBy(col(key), pmod(xxhash64(col(valueCol)), lit(salt)).as("__graft_shard"))
      .agg(count_distinct(col(valueCol)).as("__graft_partial"))
      .groupBy(col(key))
      .agg(sum(col("__graft_partial")).as(outCol))
  }
}
