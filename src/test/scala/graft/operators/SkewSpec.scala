package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  /** Heavily skewed fact: 90% of rows carry key 1. */
  private lazy val big: DataFrame = {
    val sp = spark
    import sp.implicits._
    (1 to 5000).map { i =>
      val k = if (i % 10 == 0) (i % 7) + 2 else 1
      (k, i.toLong)
    }.toDF("k", "v")
  }

  private lazy val small: DataFrame = {
    val sp = spark
    import sp.implicits._
    (1 to 8).map(k => (k, s"name_$k")).toDF("k", "name")
  }

  test("saltedJoin inner matches the plain join exactly") {
    val plain = big.join(small, Seq("k")).select(col("k"), col("v"), col("name"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 4)
      .select(col("k"), col("v"), col("name"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left outer keeps unmatched big rows exactly once") {
    val bigPlus = big.union(spark.range(3).selectExpr("100 as k", "id as v"))
    val plain = bigPlus.join(small, Seq("k"), "left")
      .select(col("k"), col("v"), col("name"))
    val salted = Skew.saltedJoin(bigPlus, small, Seq("k"), salt = 4, joinType = "left")
      .select(col("k"), col("v"), col("name"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin semi and anti match plain semantics") {
    val bigPlus = big.union(spark.range(3).selectExpr("100 as k", "id as v"))
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = bigPlus.join(small, Seq("k"), jt)
      val salted = Skew.saltedJoin(bigPlus, small, Seq("k"), salt = 4, joinType = jt)
      assert(salted.count() == plain.count(), jt)
      assert(salted.exceptAll(plain).isEmpty, jt)
    }
  }

  test("saltedJoin rejects small-side-driven join types") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), salt = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), salt = 1)
    }
  }

  test("saltedDistinctCount is exact on a skewed key") {
    val expect = big.groupBy(col("k")).agg(count_distinct(col("v")).as("distinct_cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Skew.saltedDistinctCount(big, "k", "v", salt = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the hot key's distinct work really is sharded: stage-1 cardinality
    // for key 1 spans multiple shards
    val shards = big.filter(col("k") === 1)
      .select(pmod(xxhash64(col("v")), lit(8)).as("shard"))
      .distinct().count()
    assert(shards > 1, s"expected multiple shards, got $shards")
  }
}
