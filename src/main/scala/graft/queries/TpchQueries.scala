package graft.queries

import graft.TableEnv
import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H-shaped end-to-end queries (ref: the reference's own e2e
  * correctness corpus, flink-end-to-end-tests/test-scripts/test_tpch.sh
  * — all 22 queries at fixed scale). Adapted to the driver schema
  * (FIXTURES.md; no partsupp/shipmode columns) while keeping each
  * query's plan shape: multi-join chains with region filters (Q5),
  * group-by-customer outer revenue (Q10), priority bucketing (Q12
  * shape), NOT-IN anti subquery with distinct counts (Q16 shape),
  * correlated scalar subquery (Q17), and HAVING-IN subquery (Q18).
  *
  * Spark runs the same SQL text through TableEnv (Catalyst decorrelates
  * the subqueries — SURVEY §4.1 subquery_rewrite/decorrelate); the
  * DuckDB oracle runs the identical statement.
  */
object TpchQueries {

  private def sql(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => TableEnv(s, dir).sqlQuery(text)

  val q5: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  val q10: String =
    """SELECT c_custkey, c_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  round(c_acctbal, 2) AS bal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  val q12: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey AND l_shipdate >= o_orderdate
      |GROUP BY year(l_shipdate) ORDER BY ship_year""".stripMargin

  val q16: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND p_brand <> 'Brand#1'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  val q17: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  val q18: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, round(o_totalprice, 2) AS total,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  val q7: String =
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year, l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val q14: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |  round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |GROUP BY year(l_shipdate) ORDER BY ship_year""".stripMargin

  /** Q1 pricing summary — the full 8-aggregate shape over
    * returnflag × linestatus (map-side partial agg + tiny final shuffle).
    */
  val q1: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q2 shape (min-cost supplier): the schema has no partsupp, so the
    * correlated MIN runs over the suppliers that actually shipped the
    * part (via lineitem) — same decorrelated-scalar-subquery plan.
    */
  val q2: String =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_type
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size = 15 AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND s_acctbal = (
      |    SELECT min(s2.s_acctbal)
      |    FROM supplier s2, lineitem l2, nation n2, region r2
      |    WHERE p_partkey = l2.l_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |GROUP BY s_acctbal, s_name, n_name, p_partkey, p_type
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** Q4 shape (order priority with EXISTS): commit/receipt dates are not
    * in the schema; the EXISTS probes late-shipping lineitems instead —
    * same semi-join-after-decorrelation plan.
    */
  val q4: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q6 forecasting revenue — pure scan + filter + single agg: the
    * whole query should collapse into one WholeStageCodegen span over
    * the parquet scan with every predicate pushed.
    */
  val q6: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Q8 national market share — 7-table join, share-of-total via
    * conditional aggregation per year.
    */
  val q8: String =
    """SELECT o_year, round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
      |    / sum(volume), 4) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS volume, n1.n_name AS nation
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      |    AND o_custkey = c_custkey AND c_nationkey = n2.n_nationkey
      |    AND n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      |    AND s_nationkey = n1.n_nationkey AND p_type = 'ECONOMY') all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Q9 product type profit shape: no partsupp supplycost — retail price
    * stands in as unit cost (profit = revenue − cost·qty), keeping the
    * LIKE filter and per-nation-per-year rollup.
    */
  val q9: String =
    """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND l_orderkey = o_orderkey
      |    AND s_nationkey = n_nationkey AND p_name LIKE '%red%') profit
      |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin

  /** Q11 important-stock shape: supplier shipment value against a
    * share-of-total threshold. The textbook HAVING-scalar-subquery form
    * repeats the whole join+agg; the window total over the grouped
    * result keeps one pass (same single-scan rationale as Q15).
    */
  val q11: String =
    """SELECT s_suppkey, value FROM (
      |  SELECT s_suppkey, round(sum(l_extendedprice * l_quantity), 2) AS value,
      |    sum(l_extendedprice * l_quantity) AS raw,
      |    sum(sum(l_extendedprice * l_quantity)) OVER () AS tot
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |  GROUP BY s_suppkey)
      |WHERE raw > 0.05 * tot
      |ORDER BY value DESC, s_suppkey""".stripMargin

  /** Q13 customer order-count distribution — LEFT outer join with an
    * ON-clause filter, then a second aggregation over the counts.
    */
  val q13: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15 top supplier. The textbook scalar-MAX-subquery form references
    * the revenue view twice, and BOTH engines inline it into two full
    * lineitem scan+agg subtrees — at scale that doubles the dominant
    * scan. The empty-frame window max keeps one evaluation (the window
    * runs over the ~|suppliers| aggregate, not the fact table) with
    * identical semantics, so the shared SQL is the scale-correct form.
    */
  val q15: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier,
      |  (SELECT supplier_no, total_revenue, max(total_revenue) OVER () AS mx FROM revenue) r
      |WHERE s_suppkey = supplier_no AND total_revenue = mx
      |ORDER BY s_suppkey""".stripMargin

  /** Q19 discounted revenue — the disjunction-of-conjunctions predicate
    * (brand × size × quantity bands) that exercises OR-pushdown and
    * join-condition hoisting.
    */
  val q19: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem, part
      |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
      |    AND l_quantity >= 1 AND l_quantity <= 11 AND p_size BETWEEN 1 AND 5)
      |  OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
      |    AND l_quantity >= 10 AND l_quantity <= 20 AND p_size BETWEEN 1 AND 10)
      |  OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
      |    AND l_quantity >= 20 AND l_quantity <= 30 AND p_size BETWEEN 1 AND 15)""".stripMargin

  /** Q20 potential-promotion shape: nested IN chain (suppliers → parts →
    * heavy shippers) without partsupp — the inner HAVING plays the
    * excess-stock threshold role.
    */
  val q20: String =
    """SELECT s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
      |ORDER BY s_name, s_acctbal""".stripMargin

  /** Q21 waiting-orders shape: EXISTS (another supplier on the order) +
    * NOT EXISTS (another LATE supplier) — late = shipped after the order
    * date, standing in for the missing receipt/commit dates.
    */
  val q21: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** Q22 global-sales-opportunity shape: no phone column — the nation
    * key bucket plays the country-code role; keeps the avg-balance
    * scalar subquery + NOT EXISTS anti join.
    */
  val q22: String =
    """SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM (
      |  SELECT c_nationkey % 5 AS cntrycode, c_acctbal
      |  FROM customer
      |  WHERE c_nationkey % 5 IN (0, 1, 2)
      |    AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1998-01-01')) custsale
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  /** Q17's correlated scalar subquery compares l_quantity against a
    * per-part average — both engines decorrelate it to a join; the
    * single-row result is rounded to absorb summation-order noise.
    */
  val all: Seq[Q] = Seq(
    Q("q_tpch_q1", sql(q1), Some(q1)),
    Q("q_tpch_q2", sql(q2), Some(q2)),
    Q("q_tpch_q4", sql(q4), Some(q4)),
    Q("q_tpch_q6", sql(q6), Some(q6)),
    Q("q_tpch_q8", sql(q8), Some(q8)),
    Q("q_tpch_q9", sql(q9), Some(q9)),
    Q("q_tpch_q11", sql(q11), Some(q11)),
    Q("q_tpch_q13", sql(q13), Some(q13)),
    Q("q_tpch_q15", sql(q15), Some(q15)),
    Q("q_tpch_q19", sql(q19), Some(q19)),
    Q("q_tpch_q20", sql(q20), Some(q20)),
    Q("q_tpch_q21", sql(q21), Some(q21)),
    Q("q_tpch_q22", sql(q22), Some(q22)),
    Q("q_tpch_q7", sql(q7), Some(q7)),
    Q("q_tpch_q14", sql(q14), Some(q14)),
    Q("q_tpch_q5", sql(q5), Some(q5)),
    Q("q_tpch_q10", sql(q10), Some(q10)),
    Q("q_tpch_q12", sql(q12), Some(q12)),
    Q("q_tpch_q16", sql(q16), Some(q16)),
    Q("q_tpch_q17", sql(q17), Some(q17)),
    Q("q_tpch_q18", sql(q18), Some(q18)),
    // Q3's shape ships as ApiQueries.sqlRevenue (spark.sql entry); this
    // alias makes the corpus read 22/22 under the q_tpch_* prefix
    Q("q_tpch_q3", ApiQueries.sqlRevenue, Some(ApiQueries.sqlRevenueSql))
  )
}
