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
    """SELECT year(l_shipdate) AS ship_year,
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
      |    year(l_shipdate) AS l_year, l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val q14: String =
    """SELECT year(l_shipdate) AS ship_year,
      |  round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |GROUP BY year(l_shipdate) ORDER BY ship_year""".stripMargin

  /** Q17's correlated scalar subquery compares l_quantity against a
    * per-part average — both engines decorrelate it to a join; the
    * single-row result is rounded to absorb summation-order noise.
    */
  val all: Seq[Q] = Seq(
    Q("q_tpch_q7", sql(q7), Some(q7)),
    Q("q_tpch_q14", sql(q14), Some(q14)),
    Q("q_tpch_q5", sql(q5), Some(q5)),
    Q("q_tpch_q10", sql(q10), Some(q10)),
    Q("q_tpch_q12", sql(q12), Some(q12)),
    Q("q_tpch_q16", sql(q16), Some(q16)),
    Q("q_tpch_q17", sql(q17), Some(q17)),
    Q("q_tpch_q18", sql(q18), Some(q18))
  )
}
