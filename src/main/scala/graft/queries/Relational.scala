package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational core: scan/project/filter, scalar exprs, joins, aggregation,
  * set ops — the batch analog of the FlinkSQL surface the reference
  * generates and validates (reference: internal/templates/files/sql/local/
  * 03_create_processing.sql projection+alias; docs-site/advanced/
  * performance.md:160-182 joins+hints+HAVING; docs-site/ai-generation.md:
  * 258-275 conditional aggregation).
  *
  * Scale notes (100 TB posture):
  *  - dimension joins (region/nation/part) are explicitly broadcast — no
  *    shuffle of the fact table for small dims;
  *  - fact-fact joins shuffle on their equi keys and rely on AQE for skew;
  *  - aggregates are partial+final (HashAggregateExec) automatically;
  *  - money math in DECIMAL: deterministic, and codegen-friendly.
  */
object Relational extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact net revenue per lineitem: price * (1 - discount) in DECIMAL. */
  private def netDec: Column = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))

  val queries: Map[String, QFn] = Map(
    // -- Q1: scan + projection + filter (predicate pushed to parquet scan)
    "q01_filter_project" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // -- Q2: arithmetic + alias + CASE WHEN
    "q02_case_arith" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(netDec, 4).cast("double").as("net"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // -- Q3: hash aggregate + HAVING (TPC-H Q1 shape — the reference's
    //    flagship revenue pipeline upgraded with aggregation surface).
    //    Round-4 perf: the sums run over INTEGER-SCALED longs (cents /
    //    10^-4 units) instead of DECIMAL(18,2) — Spark's sum buffer for
    //    decimal inputs is precision+10 = 28, past the compact-long
    //    representation, so every row paid a BigDecimal add; the long
    //    sums stay in whole-stage codegen (2.4 s → ~0.8 s at sf0.1).
    //    Correctness story: the monetary values have <= 2 decimals,
    //    round(x*100) recovers the exact integer (the true value is
    //    integral, double error ~1e-10 — never near a .5 boundary), and
    //    sum_qty/sum_base long totals stay exact (< 2^53) through sf100.
    //    sum_disc's 10^-4-scaled total crosses 2^53 around sf100 (~6e17),
    //    so its final long→double conversion is then rounded, not exact —
    //    but both engines convert the IDENTICAL integer with the same
    //    nearest-double rule, so the outputs remain bit-identical
    //    cross-engine at every scale. The oracle mirrors the same
    //    scaled-integer formulation.
    "q03_tpch_q1_agg" -> ((s, dir) => {
      val qc = round(col("l_quantity") * 100).cast("long")      // qty * 100
      val pc = round(col("l_extendedprice") * 100).cast("long") // cents
      val dc = round(col("l_discount") * 100).cast("long")      // percent
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(qc).cast("double") / 100.0).as("sum_qty"),
          (sum(pc).cast("double") / 100.0).as("sum_base"),
          (sum(pc * (lit(100L) - dc)).cast("double") / 10000.0).as("sum_disc"),
          round(sum(qc).cast("double") / 100.0 / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") > 0)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // -- Q4: inner equi join (shuffle join on keys; AQE may broadcast)
    "q04_join_inner" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // -- Q5: multi-way join + aggregation (TPC-H Q5 shape); small dims
    //    broadcast so the lineitem fact never shuffles for them
    "q05_multi_join_agg" -> ((s, dir) => {
      val region = broadcast(Tables(s, dir, "region"))
      val nation = broadcast(Tables(s, dir, "nation"))
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      val lineitem = Tables(s, dir, "lineitem")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(netDec), 4).cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    // -- Q6: broadcast join with small dimension (explicit hint — direct
    //    analog of the reference's /*+ BROADCAST(dim) */ guidance)
    "q06_broadcast_join" -> ((s, dir) => {
      val part = broadcast(Tables(s, dir, "part"))
      Tables(s, dir, "lineitem")
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(netDec), 4).cast("double").as("revenue"))
        .orderBy(col("p_brand"))
    }),

    // -- Q7: left outer join + null-safe count
    "q07_left_outer" -> ((s, dir) => {
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      customer.join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy(col("c_custkey"))
    }),

    // -- Q8: left semi join (EXISTS)
    "q08_semi_join" -> ((s, dir) => {
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // -- Q9: left anti join (NOT EXISTS)
    "q09_anti_join" -> ((s, dir) => {
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // -- Q10: equi + theta self-join (pairs within an order)
    "q10_theta_self_join" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"))
      val l1 = li.as("l1")
      val l2 = li.withColumnRenamed("l_linenumber", "ln2").as("l2")
      l1.join(l2,
          col("l1.l_orderkey") === col("l2.l_orderkey") && col("l_linenumber") < col("ln2"))
        .groupBy(col("l1.l_orderkey").as("okey"))
        .agg(count(lit(1)).as("pair_cnt"))
        .orderBy(col("okey"))
    }),

    // -- Q11: COUNT(DISTINCT)
    "q11_count_distinct" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("uniq_cust"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- Q12: ROLLUP (Catalyst Expand); rolled-up levels surfaced as 'ALL'
    "q12_rollup" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum(dec2(col("o_totalprice"))), 4).cast("double").as("total"),
             count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("total"), col("cnt"))
        .orderBy(col("status"), col("prio"))
    }),

    // -- Q17: set operations, tagged into one result
    "q17_set_ops" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val o = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val f = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val u = o.union(f).distinct().withColumn("op", lit("union"))
      val i = o.intersect(f).withColumn("op", lit("intersect"))
      val e = o.except(f).withColumn("op", lit("except"))
      u.unionAll(i).unionAll(e)
        .select(col("op"), col("o_custkey"))
        .orderBy(col("op"), col("o_custkey"))
    }),

    // -- Q18: string functions
    "q18_string_fns" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("pre"),
          concat(col("c_mktsegment"), lit("-"), col("c_name")).as("tagged"),
          length(col("c_name")).cast("long").as("name_len"))
        .orderBy(col("c_custkey"))
    }),

    // -- Q19: date truncation + aggregation
    "q19_date_trunc" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"),
             round(sum(dec2(col("o_totalprice"))), 4).cast("double").as("total"))
        .orderBy(col("month"))
    })
  )

  private val netSql = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val oracles: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_case_arith" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(ROUND($netSql, 4) AS DOUBLE) AS net,
         |  CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS ret
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // scaled-integer mirror of the Spark formulation (see the query note):
    // SUM(BIGINT) is HUGEINT in DuckDB — cast to DOUBLE before descaling,
    // matching Spark's long→double→/100.0 order exactly
    "q03_tpch_q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
         |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base,
         |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
         |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc,
         |  ROUND(CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*), 4) AS avg_qty,
         |  COUNT(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |HAVING COUNT(*) > 0 ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q04_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q05_multi_join_agg" ->
      s"""SELECT n_name, CAST(ROUND(SUM($netSql), 4) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_broadcast_join" ->
      s"""SELECT p_brand, COUNT(*) AS cnt, CAST(ROUND(SUM($netSql), 4) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q07_left_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q10_theta_self_join" ->
      """SELECT l1.l_orderkey AS okey, COUNT(*) AS pair_cnt
        |FROM lineitem l1 JOIN lineitem l2
        |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
        |GROUP BY l1.l_orderkey ORDER BY okey""".stripMargin,

    "q11_count_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS uniq_cust
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q12_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS prio,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, prio""".stripMargin,

    "q17_set_ops" ->
      """WITH o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |     f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT 'union' AS op, o_custkey FROM (SELECT o_custkey FROM o UNION SELECT o_custkey FROM f)
        |UNION ALL
        |SELECT 'intersect' AS op, o_custkey FROM (SELECT o_custkey FROM o INTERSECT SELECT o_custkey FROM f)
        |UNION ALL
        |SELECT 'except' AS op, o_custkey FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f)
        |ORDER BY op, o_custkey""".stripMargin,

    "q18_string_fns" ->
      """SELECT c_custkey, UPPER(c_name) AS uname, SUBSTRING(c_name, 1, 8) AS pre,
        |  c_mktsegment || '-' || c_name AS tagged,
        |  CAST(LENGTH(c_name) AS BIGINT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q19_date_trunc" ->
      """SELECT STRFTIME(o_orderdate, '%Y-%m') AS month, COUNT(*) AS cnt,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin
  )
}
