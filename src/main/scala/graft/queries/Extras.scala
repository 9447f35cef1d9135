package graft.queries

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-2 SQL-surface stragglers (VERDICT.md "what's missing" #8): cube,
  * grouping sets, approximate aggregates with oracle-checked error
  * bounds, right/full outer joins, and a typed UDAF through the
  * `Aggregator` surface.
  *
  * Approximate aggregates cannot hash-match a different engine's sketch,
  * so their correctness rows assert the error CONTRACT instead: Spark
  * emits the exact value plus a boolean "approx within tolerance", and
  * the DuckDB oracle recomputes the exact value independently with TRUE
  * for the bound — a sketch regression turns the row red.
  */
object Extras extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** One SQL text, two engines: Spark runs it over catalog tables
    * (q38_catalog_sql), DuckDB runs it over the parquet views — bit-exact
    * by the decimal-sum/double-emit pattern. */
  private val catalogJoinSql: String =
    """SELECT n_name, COUNT(*) AS cnt,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** One SQL text, two engines (q44): correlated EXISTS / NOT EXISTS plus
    * an uncorrelated scalar subquery. Thresholds are CAST(... AS DOUBLE)
    * products of stored doubles — IEEE-identical in both engines (no
    * decimal-literal promotion ambiguity). */
  private val subqueryExistsSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_totalprice > (SELECT CAST(0.9 AS DOUBLE) * MAX(o2.o_totalprice)
      |                            FROM orders o2))
      |  AND NOT EXISTS (SELECT 1 FROM orders o3
      |    WHERE o3.o_custkey = c.c_custkey
      |      AND o3.o_orderpriority = '1-URGENT'
      |      AND o3.o_totalprice < (SELECT CAST(0.2 AS DOUBLE) * MAX(o4.o_totalprice)
      |                             FROM orders o4))
      |ORDER BY c_custkey""".stripMargin

  /** Typed UDAF: weighted mean via exact decimal partial sums. BigDecimal
    * buffers make merge order irrelevant (exact arithmetic), so the
    * result is deterministic under any partitioning — the property a
    * Double-buffer UDAF would lose. */
  private class WeightedMean extends Aggregator[(java.math.BigDecimal, java.math.BigDecimal),
      (java.math.BigDecimal, java.math.BigDecimal), (Double, Double)] {
    private val Z = java.math.BigDecimal.ZERO
    def zero: (java.math.BigDecimal, java.math.BigDecimal) = (Z, Z)
    def reduce(b: (java.math.BigDecimal, java.math.BigDecimal),
               a: (java.math.BigDecimal, java.math.BigDecimal)) =
      (b._1.add(a._1.multiply(a._2)), b._2.add(a._2))
    def merge(x: (java.math.BigDecimal, java.math.BigDecimal),
              y: (java.math.BigDecimal, java.math.BigDecimal)) =
      (x._1.add(y._1), x._2.add(y._2))
    def finish(b: (java.math.BigDecimal, java.math.BigDecimal)): (Double, Double) =
      (b._1.doubleValue(), b._2.doubleValue())
    def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  }

  val queries: Map[String, QFn] = Map(
    // -- Q27: CUBE with grouping_id (Catalyst Expand over 4 grouping sets)
    "q27_cube" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          round(sum(dec2(col("o_totalprice"))), 4).cast("double").as("total"),
          count(lit(1)).as("cnt"))
        .select(col("gid").cast("long").as("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("total"), col("cnt"))
        .orderBy(col("gid"), col("status"), col("prio"))
    }),

    // -- Q28: GROUPING SETS ((status), (priority)) — two disjoint levels
    "q28_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum(dec2(col("o_totalprice"))), 4).cast("double").as("total"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("total"), col("cnt"))
        .orderBy(col("status"), col("prio"))
    }),

    // -- Q29: approx_count_distinct (HLL++) with an oracle-checked error
    //    bound. Round-3 tightening: rsd pinned to 2.5% (the sketch is
    //    deterministic — no seed — so the only variable is data), gate at
    //    3× rsd = 7.5%; measured max relative error is 2.3% at sf0.01 and
    //    1.8% at sf0.1.
    "q29_approx_distinct" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_uniq"),
          approx_count_distinct(col("o_custkey"), 0.025).as("approx"))
        .select(col("o_orderpriority"), col("exact_uniq"),
          (abs(col("approx") - col("exact_uniq")).cast("double") <=
            col("exact_uniq").cast("double") * 0.075).as("approx_ok"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- Q30: RIGHT OUTER join — right side (customer) fully preserved,
    //    order columns null-filled for customers without orders
    "q30_right_outer" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      orders
        .join(Tables(s, dir, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "right_outer")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("okey"),
          coalesce(col("o_orderstatus"), lit("NONE")).as("status"))
        .orderBy(col("c_custkey"), col("okey"))
    }),

    // -- Q31: FULL OUTER join of two disjoint aggregates
    "q31_full_outer" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val open = orders.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("ck_o")).agg(count(lit(1)).as("open_cnt"))
      val fin = orders.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("ck_f")).agg(count(lit(1)).as("fin_cnt"))
      open.join(fin, col("ck_o") === col("ck_f"), "full_outer")
        .select(
          coalesce(col("ck_o"), col("ck_f")).as("custkey"),
          coalesce(col("open_cnt"), lit(0L)).as("open_cnt"),
          coalesce(col("fin_cnt"), lit(0L)).as("fin_cnt"))
        .orderBy(col("custkey"))
    }),

    // -- Q33: approx_percentile for the 100 TB path (exact percentile_cont
    //    needs a full sort per group — the approximate sketch is the scale
    //    answer; VERDICT.md round-1 watch item on q25). The exact median
    //    is hash-checked; the sketch is gated inside the exact p45..p55
    //    band.
    "q33_approx_percentile" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)"), 4).as("p50_exact"),
          expr("percentile_cont(0.45) WITHIN GROUP (ORDER BY value)").as("lo"),
          expr("percentile_cont(0.55) WITHIN GROUP (ORDER BY value)").as("hi"),
          expr("approx_percentile(value, 0.5, 1000)").as("ap"))
        .select(col("event_type"), col("p50_exact"),
          (col("ap") >= col("lo") && col("ap") <= col("hi")).as("approx_ok"))
        .orderBy(col("event_type"))
    }),

    // -- Q37: conditional aggregation in AGGREGATE position — the
    //    count(CASE WHEN)/sum(CASE WHEN) shape of the reference's generated
    //    pipelines (docs-site/ai-generation.md:265-268). Round 2 only
    //    covered CASE WHEN in projection position; this closes the §2.B
    //    "conditional agg" row with a hash-checked grouped query.
    "q37_conditional_agg" -> ((s, dir) => {
      val isF = col("o_orderstatus") === "F"
      val isO = col("o_orderstatus") === "O"
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(when(isF, lit(1))).as("n_finished"),
          count(when(isO, lit(1))).as("n_open"),
          round(sum(when(isF, dec2(col("o_totalprice")))
            .otherwise(lit(0))), 4).cast("double").as("finished_total"),
          // conditional mean via exact decimal sum / double division (NOT
          // avg(): Spark's decimal avg rounds at scale s+4 while DuckDB's
          // returns double — this pattern is bit-exact on both engines)
          sum(when(isF, dec2(col("o_totalprice")))).cast("double").as("fsum"),
          count(when(isF, lit(1))).cast("double").as("fcnt"))
        .select(col("o_orderpriority"), col("n_finished"), col("n_open"),
          col("finished_total"),
          when(col("fcnt") > 0, (col("fsum") / col("fcnt"))
            .cast(DecimalType(18, 4)).cast("double")).as("finished_avg"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- Q38: the catalog path — tables registered via CREATE TABLE DDL
    //    routed through the statements layer (clean → validate →
    //    ${DATA_DIR} substitute → spark.sql), then the query itself runs
    //    as plain SQL over catalog NAMES, not paths. Identical SQL text
    //    serves as the DuckDB oracle. Exercises A1–A5 + §7.4.6 end-to-end
    //    inside the driver's correctness gate.
    "q38_catalog_sql" -> ((s, dir) => {
      graft.catalog.Layout.registerTables(s, dir, Seq("orders", "customer", "nation"))
      s.sql(catalogJoinSql)
    }),

    // -- Q39: skew-proof exact COUNT(DISTINCT) — the two-stage salted
    //    aggregation from graft.operators.Skew: stage 1 counts distinct
    //    order keys inside (returnflag, xxhash64(orderkey)%8) shards,
    //    stage 2 sums shard counts. Exact because value-hashing partitions
    //    each key's distinct set; at 100 TB a hot key's distinct set
    //    spreads over `salt` tasks instead of one straggler hash set.
    "q39_salted_distinct" -> ((s, dir) => {
      graft.operators.Skew
        .saltedDistinctCount(Tables(s, dir, "lineitem"),
          "l_returnflag", "l_orderkey", salt = 8)
        .orderBy(col("l_returnflag"))
    }),

    // -- Q32: typed UDAF (Aggregator surface) — weighted mean discount by
    //    quantity, decimal-exact partials, double division at the end
    "q32_udaf_weighted_mean" -> ((s, dir) => {
      val wm = udaf(new WeightedMean(),
        Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL))
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          dec2(col("l_discount")).as("d"), dec2(col("l_quantity")).as("q"))
        .groupBy(col("l_returnflag"))
        .agg(wm(col("d"), col("q")).as("wm"))
        .select(col("l_returnflag"),
          // decimal(9,4) quantizes deterministically; double is the OUTPUT
          // type (Spark/DuckDB decimals hash differently in the driver's
          // canonicalization even when equal as values — round-2 red row)
          (col("wm._1") / col("wm._2"))
            .cast(DecimalType(9, 4)).cast("double").as("wavg_discount"))
        .orderBy(col("l_returnflag"))
    }),

    // -- Q41: the DECIMAL aggregation contract (VERDICT_r05 next-round #6).
    //    TPC-H Q1 in HONEST decimal arithmetic: q03 runs the fast
    //    scaled-long formulation, so this row is the oracle proof that the
    //    engine's native DECIMAL(18,2) SUM / AVG / multiply semantics match
    //    DuckDB digit-for-digit — native decimal aggs over exact decimal
    //    intermediates, accepted to be slower than q03.
    //    Type discipline (both engines compute the identical exact values):
    //     - ep*(1-disc): (18,2)x(19,2) -> scale-4 product, exact; quantized
    //       to DECIMAL(18,4) before the next multiply because DuckDB's
    //       multiply requires width1+width2 <= 38 (the values need only ~7
    //       integer digits, so the narrowing is lossless);
    //     - *(1+tax): (18,4)x(19,2) -> scale-6, exact in both engines;
    //     - AVG: Spark's decimal avg yields DECIMAL(22,6) with HALF_UP at
    //       scale 6; the oracle emulates exactly that with integer math
    //       ((2*S*10^6 + C) // (2*C) is round-half-up of S*10^6/C), since
    //       DuckDB's own avg() returns DOUBLE.
    //    Outputs present the decimals as doubles (one correctly-rounded
    //    conversion of identical exact decimal values on both sides) —
    //    raw decimal OUTPUT columns hash-mismatch in the driver's
    //    canonicalization even when numerically equal (round-2 red row,
    //    see q32 above); the decimal SEMANTICS are what this row proves.
    "q41_decimal_agg" -> ((s, dir) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val qty = dec2(col("l_quantity"))
      val ep = dec2(col("l_extendedprice"))
      val disc = dec2(col("l_discount"))
      val tax = dec2(col("l_tax"))
      val discPrice = (ep * (one - disc)).cast(DecimalType(18, 4))
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(ep).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(discPrice * (one + tax)).cast("double").as("sum_charge"),
          avg(qty).cast("double").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // -- Q42: the remaining rank-family window surface — ntile, pct_rank,
    //    cume_dist, first_value, nth_value — over a UNIQUE total ordering
    //    (quantity, orderkey, linenumber): percent_rank/cume_dist are
    //    integer-ratio doubles, bit-identical across engines only when the
    //    ordering admits no ties; nth/first get the SQL-standard default
    //    frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW), which equals ROWS
    //    under a tie-free ordering, so both engines agree row for row.
    "q42_window_extra" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("linenum"),
          col("l_returnflag"),
          col("l_quantity").as("qty"),
          ntile(4).over(w).cast("long").as("ntile4"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          first_value(col("l_quantity")).over(w).as("first_qty"),
          nth_value(col("l_quantity"), 3).over(w).as("third_qty"))
        // (orderkey, linenumber) is NOT unique in the synthetic lineitem —
        // qty disambiguates; ntile4 last because two rows tied on every
        // window key share rank/cume/first/nth but can straddle a tile
        // boundary (each engine assigns {t, t+1} to the pair arbitrarily)
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("linenum"),
          col("qty"), col("ntile4"))
    }),

    // -- Q43: pivot (long→wide) through the Dataset `pivot` API with
    //    EXPLICIT pivot values — the values-unspecified overload runs a
    //    distinct job over the pivot column first, a hidden extra scan
    //    (and an unbounded column explosion on a 100 TB corpus); naming
    //    the columns keeps it to one pass, a plain two-phase hash agg
    //    under Expand. Decimal sums, double emit (the q03/q38 pattern).
    "q43_pivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec2(col("l_quantity"))))
        .select(col("l_returnflag"),
          col("F").cast("double").as("f_qty"),
          col("O").cast("double").as("o_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // -- Q45: unpivot (wide→long melt) through the Dataset API — the
    //    inverse of Q43's pivot. Runs over a 3-row aggregate, so the
    //    interesting property is the operator semantics (column→row
    //    labels, value column typing), not scale; the Expand it plans to
    //    is a zero-shuffle per-row map at any size.
    "q45_unpivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("price"),
          sum(dec2(col("l_discount"))).cast("double").as("disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")),
          "measure", "value")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // -- Q44: correlated subqueries — EXISTS (rewritten to a left-semi
    //    join by Catalyst), NOT EXISTS (anti join) and an uncorrelated
    //    scalar subquery (one-row broadcast) in one statement, shared
    //    verbatim with the oracle (the q38 one-SQL-two-engines pattern).
    "q44_subquery_exists" -> ((s, dir) => {
      graft.catalog.Layout.registerTables(s, dir, Seq("orders", "customer"))
      s.sql(subqueryExistsSql)
    }),

    // -- Q47: interval/range self-join, BINNED. "Events within the hour
    //    after each event, per user" is a non-equi predicate; the naive
    //    plan is a per-user theta join (quadratic in the hot user). The
    //    scale formulation quantizes time into interval-width buckets:
    //    each probe row expands to the (at most 2) buckets its window
    //    overlaps, the join is EQUI on (user, bucket), and the exact
    //    range predicate filters residuals. Every (a,b) pair meets
    //    exactly once because b lives in exactly one bucket. Candidate
    //    fanout per row is bounded by bucket population, not user
    //    population — the same bound-the-candidates discipline as the
    //    LSH/prefix dedup paths. Timestamps leave as epoch seconds
    //    (QueryPack policy).
    "q47_range_join_binned" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts").cast("long").as("sec"))
      val probe = e.select(col("event_id"), col("user_id"), col("sec"),
        explode(array(floor(col("sec") / 3600), floor(col("sec") / 3600) + 1))
          .as("bucket"))
      val build = e.select(col("event_id").as("b_id"), col("user_id"),
        col("sec").as("b_sec"), floor(col("sec") / 3600).as("bucket"))
      probe.join(build, Seq("user_id", "bucket"))
        .filter(col("b_sec") > col("sec") && col("b_sec") <= col("sec") + 3600)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_following"),
          min(col("b_sec") - col("sec")).as("min_gap_s"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q27_cube" ->
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS prio,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, prio""".stripMargin,

    "q28_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS prio,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, prio""".stripMargin,

    "q29_approx_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_uniq,
        |  TRUE AS approx_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q30_right_outer" ->
      """SELECT c.c_custkey,
        |  COALESCE(o.o_orderkey, -1) AS okey,
        |  COALESCE(o.o_orderstatus, 'NONE') AS status
        |FROM orders o RIGHT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY c_custkey, okey""".stripMargin,

    "q31_full_outer" ->
      """WITH open_o AS (
        |  SELECT o_custkey AS ck_o, COUNT(*) AS open_cnt FROM orders
        |  WHERE o_orderstatus = 'O' GROUP BY o_custkey),
        |fin AS (
        |  SELECT o_custkey AS ck_f, COUNT(*) AS fin_cnt FROM orders
        |  WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT COALESCE(ck_o, ck_f) AS custkey,
        |  COALESCE(open_cnt, 0) AS open_cnt,
        |  COALESCE(fin_cnt, 0) AS fin_cnt
        |FROM open_o FULL OUTER JOIN fin ON ck_o = ck_f
        |ORDER BY custkey""".stripMargin,

    "q33_approx_percentile" ->
      """SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q37_conditional_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        |  CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 4) AS DOUBLE) AS finished_total,
        |  CAST(CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / NULLIF(CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE), 0)
        |    AS DECIMAL(18,4)) AS DOUBLE) AS finished_avg
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q38_catalog_sql" -> catalogJoinSql,

    "q39_salted_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS distinct_cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q32_udaf_weighted_mean" ->
      """SELECT l_returnflag,
        |  CAST(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |     / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS DECIMAL(9,4)) AS DOUBLE) AS wavg_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Honest-decimal TPC-H Q1 (semantics notes at the query). The avg
    // emulates Spark's DECIMAL(22,6) HALF_UP average with integer math
    // because DuckDB's avg() over decimal returns DOUBLE.
    "q41_decimal_agg" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS ep,
        |    CAST(l_discount AS DECIMAL(18,2)) AS disc,
        |    CAST(l_tax AS DECIMAL(18,2)) AS tax,
        |    CAST(l_quantity AS BIGINT) AS qty_i
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'),
        |p AS (
        |  SELECT l_returnflag, l_linestatus, qty, ep, qty_i,
        |    CAST(ep * (CAST(1 AS DECIMAL(3,2)) - disc) AS DECIMAL(18,4)) AS disc_price,
        |    (CAST(1 AS DECIMAL(3,2)) + tax) AS one_tax
        |  FROM l)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(qty) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(ep) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(disc_price) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(disc_price * one_tax) AS DOUBLE) AS sum_charge,
        |  CAST((2 * SUM(qty_i) * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
        |    / 1000000.0 AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM p GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q42_window_extra" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenum, l_returnflag,
        |  l_quantity AS qty,
        |  CAST(ntile(4) OVER w AS BIGINT) AS ntile4,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(l_quantity) OVER w AS first_qty,
        |  nth_value(l_quantity, 3) OVER w AS third_qty
        |FROM lineitem WHERE l_orderkey % 20 = 0
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_quantity, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_orderkey, linenum, qty, ntile4""".stripMargin,

    "q43_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS f_qty,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS o_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q44_subquery_exists" -> subqueryExistsSql,

    // the oracle states the CONTRACT as the naive range join — the binned
    // rewrite must be invisible in the result
    "q47_range_join_binned" ->
      """WITH e AS (SELECT event_id, user_id,
        |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events)
        |SELECT a.event_id, COUNT(*) AS n_following,
        |  MIN(b.sec - a.sec) AS min_gap_s
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.sec > a.sec AND b.sec <= a.sec + 3600
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,

    "q45_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'qty' AS measure, qty AS value FROM a
        |  UNION ALL SELECT l_returnflag, 'price', price FROM a
        |  UNION ALL SELECT l_returnflag, 'disc', disc FROM a) u
        |ORDER BY l_returnflag, measure""".stripMargin
  )
}
