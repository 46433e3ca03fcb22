package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational surface (SURVEY.md §2.2–2.5, §2.7–2.8): calc,
  * joins (all types), aggregations, grouping sets, over-windows, top-N,
  * sort/limit, set ops, dedup. All declarative DataFrame plans — Catalyst
  * supplies pushdown, partial aggregation, join selection and AQE; at
  * cluster scale the same plans shuffle on their natural keys and the
  * dimension sides (region/nation/supplier) stay broadcast-able.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary (ref: flink-end-to-end-tests
    * test_tpch.sh q1; SURVEY §2.5 batch hash agg). One scan + partial/final
    * hash agg; only 7 lineitem columns are read (column pruning).
    */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Fused project+filter ≈ Blink Calc node (ref: StreamExecCalc.scala:39).
    * Whole-stage-codegen'd single pass; filter + 4-col projection reach the
    * parquet scan.
    */
  def calc(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate").between(lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
          && col("l_discount") =!= 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // No round(): both engines compute the identical IEEE-754 product,
        // while round-to-2 differs on .xx5 boundaries (BigDecimal HALF_UP
        // vs DuckDB's float rounding).
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        when(col("l_quantity") > 30, "bulk").when(col("l_quantity") > 10, "mid").otherwise("small").as("qty_class"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("rf"))
      .orderBy("l_orderkey", "l_linenumber")

  val calcSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS net_price,
      |  CASE WHEN l_quantity > 30 THEN 'bulk' WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS qty_class,
      |  coalesce(nullif(l_returnflag, 'N'), 'none') AS rf
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31' AND l_discount <> 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** UNNEST / lateral table function ≈ Correlate (ref:
    * StreamExecCorrelate.scala:36, LogicalUnnestRule) via `explode`.
    */
  def unnest(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  val unnestSql: String =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word ORDER BY word""".stripMargin

  /** 4-way inner join, revenue per nation (ref: BatchExecHashJoin.scala,
    * HashJoinOperator.java:454). nation is explicitly broadcast (25 rows at
    * any SF); customer/orders join shuffles on the key — at 100 TB that is
    * the natural hash-partitioned plan, and AQE can still flip sides.
    */
  def joinInner(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy("n_name")
  }

  val joinInnerSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS cnt
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left outer join keeping order-less customers (ref:
    * SortMergeFullOuterJoinIterator.java / outer join family).
    */
  def joinLeft(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total"))
      .orderBy("c_custkey")
  }

  val joinLeftSql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  round(coalesce(sum(o_totalprice), 0), 2) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Semi join = SQL EXISTS (ref: StreamingSemiAntiJoinOperator.java:35). */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val joinSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Anti join = SQL NOT EXISTS. */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val joinAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Full outer join over pre-aggregated sides (supplier vs customer
    * nation counts) — exercises unmatched rows on both sides.
    */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("sn"))
      .agg(count(lit(1)).as("s_cnt"))
    val cus = Tables.customer(s, dir).groupBy(col("c_nationkey").as("cn"))
      .agg(count(lit(1)).as("c_cnt"))
    sup.join(cus, col("sn") === col("cn"), "full")
      .select(coalesce(col("sn"), col("cn")).as("nationkey"), col("s_cnt"), col("c_cnt"))
      .orderBy("nationkey")
  }

  val joinFullSql: String =
    """SELECT coalesce(sn, cn) AS nationkey, s_cnt, c_cnt
      |FROM (SELECT s_nationkey AS sn, count(*) AS s_cnt FROM supplier GROUP BY 1) s
      |FULL JOIN (SELECT c_nationkey AS cn, count(*) AS c_cnt FROM customer GROUP BY 1) c ON sn = cn
      |ORDER BY nationkey""".stripMargin

  /** Pure theta join → broadcast nested-loop (ref:
    * BatchExecNestedLoopJoin.scala, NestedLoopJoinCodeGenerator.scala).
    * supplier is tiny at every SF — broadcast side stays bounded.
    */
  def joinTheta(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val sup = Tables.supplier(s, dir)
    p.join(broadcast(sup),
        col("p_size") >= col("s_nationkey") && col("p_size") <= col("s_nationkey") + 10)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("s_suppkey")
  }

  val joinThetaSql: String =
    """SELECT s_suppkey, count(*) AS cnt
      |FROM part, supplier
      |WHERE p_size BETWEEN s_nationkey AND s_nationkey + 10
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  /** Bucketed range join — the interval join that SCALES when neither
    * side broadcasts (the standard fixed-width-bucket device; cf.
    * Databricks' range-join bin optimization): [[joinTheta]] relies on
    * a broadcast nested-loop, which dies the moment the dimension
    * outgrows a broadcast, so here each supplier price band
    * [s_suppkey·1000, +5000) EXPLODES into its covered width-1000
    * buckets (≤ 6 rows per band — bounded by band/width, not data),
    * probes bucket on floor(price/1000), and the pair EQUI-JOINS on
    * the bucket key with the exact interval as a residual filter —
    * one hash-partitioned shuffle both sides, no nested loop anywhere
    * (the registry plan audit enforces it). The oracle is the NAIVE
    * inequality join: equality proves the bucket decomposition is
    * semantically invisible.
    */
  def joinRangeBucket(s: SparkSession, dir: String): DataFrame = {
    val W = 1000L
    val bands = Tables.supplier(s, dir).select(col("s_suppkey"),
      (col("s_suppkey") * W).cast("double").as("lo"),
      (col("s_suppkey") * W + 5000L).cast("double").as("hi"))
    val buckets = bands.withColumn("b",
      explode(sequence(floor(col("lo") / W).cast("long"),
        floor((col("hi") - 1) / W).cast("long"))))
    val probes = Tables.orders(s, dir).select(col("o_totalprice"))
      .withColumn("b", floor(col("o_totalprice") / W).cast("long"))
    probes.join(buckets, Seq("b"))
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("cnt"))
      .orderBy("s_suppkey")
  }

  val joinRangeBucketSql: String =
    """SELECT s_suppkey, count(*)::BIGINT AS cnt
      |FROM supplier, orders
      |WHERE o_totalprice >= s_suppkey * 1000
      |  AND o_totalprice < s_suppkey * 1000 + 5000
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  /** Distinct aggregates (ref: FlinkAggregateExpandDistinctAggregatesRule).
    */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  val aggDistinctSql: String =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
      |  count(DISTINCT o_orderpriority) AS n_prio, count(*) AS cnt
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** ROLLUP grouping sets → Expand (ref: DecomposeGroupingSetsRule,
    * StreamExecExpand.scala:42).
    */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("cnt"), col("total"))
      .orderBy("status", "prio")

  val aggRollupSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS prio,
      |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, prio""".stripMargin

  /** CUBE grouping sets (ref: DecomposeGroupingSetsRule — all 4
    * combinations of the two keys).
    */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("cnt"))
      .orderBy("status", "prio")

  val aggCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS cnt
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, prio""".stripMargin

  /** Statistical aggregates STDDEV/VAR family (ref: FlinkSqlOperatorTable
    * agg section; AggsHandlerCodeGenerator.scala).
    */
  def aggStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_samp"),
        round(stddev_pop(col("l_quantity")), 4).as("sd_pop"),
        round(var_samp(col("l_quantity")), 4).as("v_samp"),
        round(var_pop(col("l_quantity")), 4).as("v_pop"),
        round(avg(col("l_quantity")), 4).as("mean"),
        round(min(col("l_quantity")), 2).as("mn"),
        round(max(col("l_quantity")), 2).as("mx"))
      .orderBy("l_returnflag")

  val aggStatsSql: String =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_samp,
      |  round(stddev_pop(l_quantity), 4) AS sd_pop,
      |  round(var_samp(l_quantity), 4) AS v_samp,
      |  round(var_pop(l_quantity), 4) AS v_pop,
      |  round(avg(l_quantity), 4) AS mean,
      |  round(min(l_quantity), 2) AS mn,
      |  round(max(l_quantity), 2) AS mx
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Bivariate statistical aggregates (ref: FlinkSqlOperatorTable
    * COVAR_POP/COVAR_SAMP — Pearson correlation and the OLS slope/
    * intercept derived from the same moments): quantity vs
    * extendedprice per return flag. All map-side-combinable moment
    * aggregates; doubles round to 6 (these are ratio statistics —
    * last-ulp sums diverge cross-engine unrounded).
    */
  def aggCorr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_s"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("cov_p"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice"))
          / var_pop(col("l_quantity")), 6).as("slope"),
        round(avg(col("l_extendedprice"))
          - covar_pop(col("l_quantity"), col("l_extendedprice"))
            / var_pop(col("l_quantity")) * avg(col("l_quantity")), 4).as("intercept"))
      .orderBy("l_returnflag")

  val aggCorrSql: String =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 6) AS r,
      |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
      |  round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p,
      |  round(covar_pop(l_quantity, l_extendedprice) / var_pop(l_quantity), 6) AS slope,
      |  round(avg(l_extendedprice)
      |    - covar_pop(l_quantity, l_extendedprice) / var_pop(l_quantity) * avg(l_quantity),
      |    4) AS intercept
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** COLLECT multiset aggregate (ref: FlinkSqlOperatorTable COLLECT) —
    * sorted for deterministic compare.
    */
  def aggCollect(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .groupBy("n_regionkey")
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
      .orderBy("n_regionkey")

  val aggCollectSql: String =
    """SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** minBy/maxBy (ref: KeyedStream.minBy/maxBy, KeyedStream.java:701-997)
    * as SQL max_by/min_by.
    */
  def aggMinMaxBy(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("max_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("min_order"),
        round(max(col("o_totalprice")), 2).as("max_total"))
      .orderBy("o_orderstatus")

  val aggMinMaxBySql: String =
    """SELECT o_orderstatus,
      |  max_by(o_orderkey, o_totalprice) AS max_order,
      |  min_by(o_orderkey, o_totalprice) AS min_order,
      |  round(max(o_totalprice), 2) AS max_total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Running-total OVER window, ROWS UNBOUNDED PRECEDING (ref:
    * BatchExecOverAggregate.scala, UnboundedFollowingOverFrame.java).
    */
  def overRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val overRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** RANK / DENSE_RANK / ROW_NUMBER (ref: BatchExecRank.scala,
    * FlinkSqlOperatorTable rank funcs). Cast to BIGINT on both sides.
    */
  def overRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"))
      .orderBy("p_brand", "rn")
  }

  val overRankSql: String =
    """SELECT p_brand, p_partkey,
      |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk, row_number() OVER w AS rn
      |FROM part
      |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
      |ORDER BY p_brand, rn""".stripMargin

  /** Distribution window functions NTILE / PERCENT_RANK / CUME_DIST
    * (ref: FlinkSqlOperatorTable NTILE/PERCENT_RANK/CUME_DIST,
    * BatchExecRank.scala — the remaining third of the reference's rank
    * function battery beyond [[overRank]]). Partitioned by nation so
    * the window never funnels more than one nation's customers through
    * a task; doubles rounded to 6 on both sides.
    */
  def overDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_nationkey", "c_custkey")
  }

  val overDistSql: String =
    """SELECT c_nationkey, c_custkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_nationkey, c_custkey""".stripMargin

  /** LEAD/LAG/FIRST_VALUE over event streams (ref: FlinkSqlOperatorTable
    * LEAD/LAG; StreamExecOverAggregate.scala:55).
    */
  def overLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        lag("event_type", 1).over(w).as("prev_type"),
        lead("event_type", 1).over(w).as("next_type"),
        first("event_id").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_id"))
      .orderBy("user_id", "event_id")
  }

  val overLeadLagSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id, event_id,
        |  lag(event_type, 1) OVER w AS prev_type,
        |  lead(event_type, 1) OVER w AS next_type,
        |  first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_id
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin

  /** RANGE frame on a numeric sort key (ref: SlidingOverFrame.java /
    * RANGE-bounded over frames).
    */
  def overRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000L, 1000L)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(w).as("near_cnt"))
      .orderBy("o_orderkey")
  }

  val overRangeSql: String =
    """SELECT o_orderkey, o_custkey,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS near_cnt
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Top-N per group, the ROW_NUMBER <= N rewrite (ref:
    * FlinkLogicalRankRule, AppendOnlyTopNFunction.java:222). Ordering uses
    * the ROUNDED revenue so Spark's and DuckDB's last-ulp summation
    * differences cannot flip ranks; p_partkey breaks ties.
    */
  def topNPerGroup(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val rev = l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rn")
      .orderBy("p_brand", "rn")
  }

  val topNPerGroupSql: String =
    """SELECT p_brand, p_partkey, revenue, rn FROM (
      |  SELECT p_brand, p_partkey, revenue,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rn
      |  FROM (
      |    SELECT p_brand, p_partkey,
      |      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_brand, p_partkey))
      |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin

  /** ORDER BY ... LIMIT → TakeOrderedAndProject (ref: BatchExecSortLimit
    * .scala — per-partition top-k then merge, no full sort at scale).
    */
  def sortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
      .orderBy(col("total").desc, col("o_orderkey"))
      .limit(10)

  val sortLimitSql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS total
      |FROM orders ORDER BY total DESC, o_orderkey LIMIT 10""".stripMargin

  /** UNION (distinct) (ref: StreamExecUnion.scala, UnionToDistinctRule). */
  def setUnion(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").cast("int").as("nk"))
      .union(Tables.supplier(s, dir).select(col("s_nationkey").cast("int").as("nk")))
      .distinct()
      .orderBy("nk")

  val setUnionSql: String =
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin

  /** INTERSECT → semi join rewrite (ref: ReplaceIntersectWithSemiJoinRule). */
  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("ck"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("ck")))
      .orderBy("ck")
  }

  val setIntersectSql: String =
    """SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY ck""".stripMargin

  /** EXCEPT → anti join rewrite (ref: ReplaceMinusWithAntiJoinRule). */
  def setExcept(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(col("o_custkey").as("ck"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("ck")))
      .orderBy("ck")
  }

  val setExceptSql: String =
    """SELECT o_custkey AS ck FROM orders
      |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY ck""".stripMargin

  /** EXCEPT ALL multiset semantics (ref: RewriteMinusAllRule). */
  def setExceptAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("ck"))
      .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("ck")))
      .orderBy("ck")
  }

  val setExceptAllSql: String =
    """SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY ck""".stripMargin

  /** INTERSECT ALL multiset semantics (ref: RewriteIntersectAllRule). */
  def setIntersectAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("ck"))
      .intersectAll(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("ck")))
      .orderBy("ck")
  }

  val setIntersectAllSql: String =
    """SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY ck""".stripMargin

  /** Keep-FIRST-row dedup by event time (ref: StreamExecDeduplicate
    * .scala:47, DeduplicateKeepFirstRowFunction.java). Batch form of the
    * streaming dedup; ROW_NUMBER()=1 rewrite.
    */
  def dedupFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event"), col("ts"))
      .orderBy("user_id", "event_type")
  }

  val dedupFirstSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id, event_type, event_id AS first_event, ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM ev) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_agg_pricing", aggPricing, Some(aggPricingSql)),
    Q("q_calc", calc, Some(calcSql)),
    Q("q_unnest", unnest, Some(unnestSql)),
    Q("q_join_inner", joinInner, Some(joinInnerSql)),
    Q("q_join_left", joinLeft, Some(joinLeftSql)),
    Q("q_join_semi", joinSemi, Some(joinSemiSql)),
    Q("q_join_anti", joinAnti, Some(joinAntiSql)),
    Q("q_join_full", joinFull, Some(joinFullSql)),
    Q("q_join_theta", joinTheta, Some(joinThetaSql)),
    Q("q_join_range_bucket", joinRangeBucket, Some(joinRangeBucketSql)),
    Q("q_agg_distinct", aggDistinct, Some(aggDistinctSql)),
    Q("q_agg_rollup", aggRollup, Some(aggRollupSql)),
    Q("q_agg_cube", aggCube, Some(aggCubeSql)),
    Q("q_agg_stats", aggStats, Some(aggStatsSql)),
    Q("q_agg_corr", aggCorr, Some(aggCorrSql)),
    Q("q_agg_collect", aggCollect, Some(aggCollectSql)),
    Q("q_agg_minmax_by", aggMinMaxBy, Some(aggMinMaxBySql)),
    Q("q_over_running", overRunning, Some(overRunningSql)),
    Q("q_over_rank", overRank, Some(overRankSql)),
    Q("q_over_leadlag", overLeadLag, Some(overLeadLagSql)),
    Q("q_over_dist", overDist, Some(overDistSql)),
    Q("q_over_range", overRange, Some(overRangeSql)),
    Q("q_topn_group", topNPerGroup, Some(topNPerGroupSql)),
    Q("q_sort_limit", sortLimit, Some(sortLimitSql)),
    Q("q_set_union", setUnion, Some(setUnionSql)),
    Q("q_set_intersect", setIntersect, Some(setIntersectSql)),
    Q("q_set_except", setExcept, Some(setExceptSql)),
    Q("q_set_except_all", setExceptAll, Some(setExceptAllSql)),
    Q("q_set_intersect_all", setIntersectAll, Some(setIntersectAllSql)),
    Q("q_dedup_first", dedupFirst, Some(dedupFirstSql))
  )
}
