package graft.queries

import graft.Tables
import graft.cep.MatchRecognize
import graft.operators.LookupJoin
import graft.streaming.Event
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE, lookup join, and the second scalar-function battery. */
object MiscQueries {

  /** SQL row-pattern matching (ref: MATCH_RECOGNIZE, SURVEY §2.11):
    * PARTITION BY user_id ORDER BY ts PATTERN (S P+) DEFINE S = signup,
    * P = purchase, over the signup/purchase sub-stream. STRICT
    * contiguity + greedy P+ + SKIP PAST LAST — the oracle computes each
    * signup's run of immediately-following purchases.
    */
  def matchRecognize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    MatchRecognize[Event, Long, (Long, Long, Long)](
      ev,
      partitionBy = _.user_id,
      orderTsUs = _.tsUs,
      pattern = "S P+",
      define = Map(
        "S" -> (_.event_type == "signup"),
        "P" -> (_.event_type == "purchase")),
      measures = (k, m) =>
        (k, m.bindings("S").head.event_id, m.bindings("P").length.toLong))
      .toDF("user_id", "signup_id", "n_purchases")
      .orderBy("signup_id")
  }

  val matchRecognizeSql: String =
    Tables.eventsCte +
      """
        |, sp AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM ev WHERE event_type IN ('signup', 'purchase')),
        |runs AS (
        |  SELECT s.user_id, s.event_id AS signup_id,
        |    coalesce((SELECT min(x.rn) FROM sp x
        |              WHERE x.user_id = s.user_id AND x.rn > s.rn AND x.event_type <> 'purchase'),
        |             (SELECT max(x.rn) + 1 FROM sp x WHERE x.user_id = s.user_id)) - s.rn - 1 AS n_purchases
        |  FROM sp s WHERE s.event_type = 'signup')
        |SELECT user_id, signup_id, n_purchases FROM runs WHERE n_purchases >= 1
        |ORDER BY signup_id""".stripMargin

  /** Row-pattern ALTERNATION (ref: StreamExecMatch / NFACompiler group
    * patterns; SQL 2016 `PATTERN ((A|B) P)`): a click-or-view immediately
    * followed by a purchase; CLASSIFIER() reports which alternative
    * bound. Lexicographic preference is exercised by overlapping DEFINEs
    * being impossible here (disjoint types), overlap-free by
    * construction, so SKIP PAST LAST equals the per-pair oracle.
    */
  def matchAlternation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    MatchRecognize[Event, Long, (Long, Long, String, Long)](
      ev,
      partitionBy = _.user_id,
      orderTsUs = _.tsUs,
      pattern = "(A|B) P",
      define = Map(
        "A" -> (_.event_type == "click"),
        "B" -> (_.event_type == "view"),
        "P" -> (_.event_type == "purchase")),
      measures = (k, m) => {
        val (cls, x) = m.bindings.get("A").map(es => ("A", es.head))
          .getOrElse(("B", m.bindings("B").head))
        (k, x.event_id, cls, m.bindings("P").head.event_id)
      })
      .toDF("user_id", "x_id", "classifier", "p_id")
      .orderBy("x_id")
  }

  val matchAlternationSql: String =
    Tables.eventsCte +
      """
        |, o AS (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt,
        |    lead(event_id)   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nid
        |  FROM ev)
        |SELECT user_id, event_id AS x_id,
        |  CASE WHEN event_type = 'click' THEN 'A' ELSE 'B' END AS classifier,
        |  nid AS p_id
        |FROM o WHERE event_type IN ('click', 'view') AND nt = 'purchase'
        |ORDER BY x_id""".stripMargin

  /** PERMUTE row pattern (ref: NFACompiler PERMUTE expansion; SQL 2016
    * `PATTERN (S PERMUTE(A,B))`): a signup immediately followed by click
    * and view in EITHER order; `ord` reports which permutation matched
    * (candidates tried in lexicographic order). Matches cannot overlap
    * (the 2nd/3rd rows are never signups), so SKIP PAST LAST equals the
    * per-triple oracle.
    */
  def matchPermute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    MatchRecognize[Event, Long, (Long, Long, Long, Long, String)](
      ev,
      partitionBy = _.user_id,
      orderTsUs = _.tsUs,
      pattern = "S PERMUTE(A,B)",
      define = Map(
        "S" -> (_.event_type == "signup"),
        "A" -> (_.event_type == "click"),
        "B" -> (_.event_type == "view")),
      measures = (k, m) => {
        val seq = m.rows.drop(1) // (classifier, event) in row order, after S
        (k, m.bindings("S").head.event_id,
          seq.head._2.event_id, seq.last._2.event_id,
          if (seq.head._1 == "A") "AB" else "BA")
      })
      .toDF("user_id", "s_id", "first_id", "second_id", "ord")
      .orderBy("s_id")
  }

  val matchPermuteSql: String =
    Tables.eventsCte +
      """
        |, o AS (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type, 1) OVER w AS t1, lead(event_id, 1) OVER w AS id1,
        |    lead(event_type, 2) OVER w AS t2, lead(event_id, 2) OVER w AS id2
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS s_id, id1 AS first_id, id2 AS second_id,
        |  CASE WHEN t1 = 'click' THEN 'AB' ELSE 'BA' END AS ord
        |FROM o WHERE event_type = 'signup'
        |  AND ((t1 = 'click' AND t2 = 'view') OR (t1 = 'view' AND t2 = 'click'))
        |ORDER BY s_id""".stripMargin

  /** SINGLE_VALUE aggregate (ref: FlinkSqlOperatorTable SINGLE_VALUE):
    * enforced-singleton groups — region keys are unique, so each group
    * yields its one name; a multi-row group would raise at runtime
    * (error path covered in GraftFunctionsSpec).
    */
  def fnSingleValue(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir)
      .groupBy("r_regionkey")
      .agg(graft.functions.GraftFunctions.single_value(col("r_name")).as("name"))
      .orderBy("r_regionkey")

  val fnSingleValueSql: String =
    "SELECT r_regionkey, min(r_name) AS name FROM region GROUP BY 1 ORDER BY 1"

  /** Lookup join (ref: StreamExecLookupJoin): events enriched against
    * the customer dimension by point lookup; unmatched keep NULLs.
    */
  def lookupJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    LookupJoin.viaBroadcast(ev, dim, col("user_id") === col("c_custkey"))
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .orderBy("segment")
  }

  val lookupJoinSql: String =
    Tables.eventsCte +
      """
        |SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM ev LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin

  /** Scalar-function battery 2: bin/hex/chr/unicode/position/printf
    * family (ref: FlinkSqlOperatorTable BIN, HEX, CHR, ASCII, POSITION,
    * and misc string tail).
    */
  def fnString2(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(
      col("s_suppkey"),
      bin(col("s_suppkey")).as("b"),
      lower(hex(col("s_suppkey"))).as("hx"),
      chr(col("s_nationkey") + 65).as("ch"),
      expr("position('a' IN s_name)").cast("long").as("pos"),
      format_string("%s#%d", col("s_name"), col("s_suppkey")).as("fmt"),
      initcap(col("s_name")).as("ic"),
      octet_length(col("s_name")).cast("long").as("ol"),
      conv(col("s_suppkey").cast("string"), 10, 16).as("cv"))
      .orderBy("s_suppkey")

  val fnString2Sql: String =
    """SELECT s_suppkey,
      |  bin(s_suppkey) AS b,
      |  lower(hex(s_suppkey)) AS hx,
      |  chr(s_nationkey + 65) AS ch,
      |  position('a' IN s_name)::BIGINT AS pos,
      |  printf('%s#%d', s_name, s_suppkey) AS fmt,
      |  upper(s_name[1]) || s_name[2:] AS ic,
      |  octet_length(s_name::BLOB)::BIGINT AS ol,
      |  upper(to_hex(s_suppkey)) AS cv
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** Explicit GROUPING SETS + GROUPING/GROUPING_ID (ref:
    * FlinkSqlOperatorTable GROUPING/GROUPING_ID; DecomposeGroupingSetsRule)
    * — same SQL text on both engines.
    */
  val groupingSetsSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS prio,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  count(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
      |ORDER BY status, prio""".stripMargin

  def groupingSets(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(groupingSetsSql)

  /** Bounded ROWS frame, 2 preceding / 1 following (ref:
    * BatchExecOverAggregate SlidingOverFrame).
    */
  def overBounded(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-2, 1)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("frame_sum"),
        count(lit(1)).over(w).as("frame_cnt"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val overBoundedSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER w, 2) AS frame_sum,
      |  count(*) OVER w AS frame_cnt
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Async lookup enrichment ([[graft.operators.AsyncEnrich
    * .mapAsyncOrdered]], ref: AsyncDataStream.orderedWait /
    * AsyncFunction): every order probes a simulated external fee
    * service — a Future per record, up to 8 in flight per partition,
    * input order preserved — and the enriched stream aggregates per
    * priority. The service function is DETERMINISTIC (fee from the
    * order key and priority), so the async machinery is exercised in
    * the production path while the result stays oracle-replayable;
    * values are independent of completion timing by construction.
    */
  def lookupAsync(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import scala.concurrent.Future
    import scala.concurrent.duration._
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .as[(Long, String, Double)]
    val enriched = graft.operators.AsyncEnrich.mapAsyncOrdered(
      orders, parallelism = 8, timeout = 30.seconds) { case (key, prio, total) =>
      import scala.concurrent.ExecutionContext.Implicits.global
      Future { (key, prio, total, prio.length * 0.5 + (key % 7)) }
    }
    enriched.toDF("o_orderkey", "prio", "total", "fee")
      .groupBy("prio")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("total") + col("fee")), 2).as("billed"))
      .orderBy("prio")
  }

  val lookupAsyncSql: String =
    """SELECT o_orderpriority AS prio, count(*)::BIGINT AS cnt,
      |  round(sum(o_totalprice + len(o_orderpriority) * 0.5 + (o_orderkey % 7)), 2) AS billed
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** The SQL-STATEMENT MATCH_RECOGNIZE route (ref: StreamExecMatch
    * .scala:68 — the reference's users write the clause, not a builder):
    * the same S P+ pattern as [[matchRecognize]] but entered through
    * `TableEnv.sqlQuery` as the raw SQL:2016 statement, over the FULL
    * event stream (no pre-filter, so strict contiguity means purchases
    * IMMEDIATELY following the signup among all the user's events).
    * Exercises the pre-parser (clause extraction, MEASURES forms,
    * DEFINE lowering to codegen'd boolean columns) and the outer-query
    * splice; the oracle computes each signup's immediate purchase run
    * over the unfiltered ordered stream.
    */
  def matchRecognizeStmt(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT user_id, signup_id, n_purchases
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(S.event_id) AS signup_id, COUNT(P.*) AS n_purchases
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (S P+)
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)
        |ORDER BY signup_id""".stripMargin)

  val matchRecognizeStmtSql: String =
    graft.Tables.eventsCte +
      """
        |, o AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM ev),
        |runs AS (
        |  SELECT s.user_id, s.event_id AS signup_id,
        |    coalesce((SELECT min(x.rn) FROM o x
        |              WHERE x.user_id = s.user_id AND x.rn > s.rn AND x.event_type <> 'purchase'),
        |             (SELECT max(x.rn) + 1 FROM o x WHERE x.user_id = s.user_id)) - s.rn - 1 AS n_purchases
        |  FROM o s WHERE s.event_type = 'signup')
        |SELECT user_id, signup_id, n_purchases::BIGINT AS n_purchases
        |FROM runs WHERE n_purchases >= 1
        |ORDER BY signup_id""".stripMargin

  /** ALL ROWS PER MATCH through the SQL route — the statement form of
    * [[StreamingQueries.matchAllRows]]'s builder query (same pattern,
    * same oracle): every matched event emits with CLASSIFIER(),
    * RUNNING COUNT(*), and the FINAL COUNT(*). The FROM operand is a
    * user-registered temp view (the create-view-then-query flow).
    */
  def matchStmtAllRows(s: SparkSession, dir: String): DataFrame = {
    val env = graft.TableEnv(s, dir)
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .createOrReplaceTempView("mr_ev_cvp")
    env.sqlQuery(
      """SELECT user_id, event_id, classifier, running_cnt, final_cnt
        |FROM mr_ev_cvp MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES CLASSIFIER() AS classifier, RUNNING COUNT(*) AS running_cnt,
        |    COUNT(*) AS final_cnt
        |  ALL ROWS PER MATCH
        |  PATTERN (a+ b)
        |  DEFINE a AS event_type = 'click', b AS event_type = 'purchase'
        |)
        |ORDER BY user_id, event_id""".stripMargin)
  }

  /** WITHIN through the SQL route (ref: flink's MATCH_RECOGNIZE WITHIN
    * INTERVAL clause): signup immediately followed by a purchase no
    * more than 24 h later — the window anchors at the match start, so
    * the oracle is a lead() pair with the time bound.
    */
  def matchStmtWithin(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT user_id, s_id, p_id
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES S.event_id AS s_id, P.event_id AS p_id
        |  PATTERN (S P)
        |  WITHIN INTERVAL '24' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)
        |ORDER BY s_id""".stripMargin)

  val matchStmtWithinSql: String =
    graft.Tables.eventsCte +
      """
        |, o AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    lead(event_id) OVER w AS nid,
        |    lead(event_type) OVER w AS nt,
        |    lead(ts) OVER w AS nts
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS s_id, nid AS p_id
        |FROM o
        |WHERE event_type = 'signup' AND nt = 'purchase'
        |  AND nts <= ts + INTERVAL 24 HOUR
        |ORDER BY s_id""".stripMargin

  /** The canonical V-shape through the SQL route (ref: the
    * MATCH_RECOGNIZE example in flink-docs and Calcite —
    * `DEFINE DOWN AS DOWN.price < PREV(DOWN.price)`): PREV navigation
    * lowers to a lag() window column evaluated ONCE by Catalyst, so the
    * NFA walks precomputed booleans. Matches are maximal strictly-
    * descending runs (per user, by value) followed by ≥1 strictly-
    * ascending row; the oracle is the gaps-and-islands formulation over
    * the same lag flags.
    */
  def matchStmtUpdown(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT user_id, d_first, bottom, top, n
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(DOWN.event_id) AS d_first, LAST(DOWN.value) AS bottom,
        |    LAST(UP.value) AS top, COUNT(*) AS n
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (DOWN+ UP+)
        |  DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
        |         UP AS UP.value > PREV(UP.value)
        |)
        |ORDER BY user_id, d_first""".stripMargin)

  val matchStmtUpdownSql: String =
    graft.Tables.eventsCte +
      """
        |, f AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER w AS rn,
        |    CASE WHEN value < lag(value) OVER w THEN 1 ELSE 0 END AS dn,
        |    CASE WHEN value > lag(value) OVER w THEN 1 ELSE 0 END AS up
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |d AS (SELECT user_id, rn, event_id, value,
        |        rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM f WHERE dn = 1),
        |dr AS (SELECT user_id, min(rn) AS ds, max(rn) AS de,
        |         arg_min(event_id, rn) AS d_first, arg_max(value, rn) AS bottom
        |       FROM d GROUP BY user_id, grp),
        |u AS (SELECT user_id, rn, value,
        |        rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM f WHERE up = 1),
        |ur AS (SELECT user_id, min(rn) AS us, max(rn) AS ue,
        |         arg_max(value, rn) AS top
        |       FROM u GROUP BY user_id, grp)
        |SELECT dr.user_id, d_first, bottom, top,
        |  (de - ds + 1 + ue - us + 1)::BIGINT AS n
        |FROM dr JOIN ur ON ur.user_id = dr.user_id AND ur.us = dr.de + 1
        |ORDER BY dr.user_id, d_first""".stripMargin

  /** ORDER BY DESC + a subquery FROM operand through the SQL route: in
    * descending row order, `P V` with strict contiguity is "a purchase
    * whose ascending-immediate predecessor (among view/purchase rows)
    * is a view" — the oracle is the ascending lag() pair.
    */
  def matchStmtDesc(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT user_id, p_id, v_id
        |FROM (SELECT user_id, event_id, ts, event_type FROM events
        |      WHERE event_type IN ('view', 'purchase'))
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC
        |  MEASURES P.event_id AS p_id, V.event_id AS v_id
        |  PATTERN (P V)
        |  DEFINE P AS event_type = 'purchase', V AS event_type = 'view'
        |)
        |ORDER BY p_id""".stripMargin)

  val matchStmtDescSql: String =
    graft.Tables.eventsCte +
      """
        |, fl AS (SELECT user_id, event_id, ts, event_type FROM ev
        |         WHERE event_type IN ('view', 'purchase')),
        |o AS (SELECT user_id, event_id, event_type,
        |        lag(event_id) OVER w AS v_id, lag(event_type) OVER w AS vt
        |      FROM fl WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS p_id, v_id
        |FROM o WHERE event_type = 'purchase' AND vt = 'view'
        |ORDER BY p_id""".stripMargin

  /** FIRST-navigation in DEFINE through the SQL route (ref:
    * IterativeCondition.java:65-85 — the condition sees previously
    * bound events): B rows must beat the SIGNUP row's value, a
    * cross-variable reference no row-local predicate can express. The
    * quantifier is bounded (`B{1,3}`) so the oracle is three lead()
    * probes; SKIP TO NEXT ROW makes every signup independent.
    */
  def matchStmtNav(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT user_id, a_id, nb, b_last
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(A.event_id) AS a_id, COUNT(B.*) AS nb,
        |    LAST(B.value) AS b_last
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A B{1,3})
        |  DEFINE A AS event_type = 'signup', B AS B.value > FIRST(A.value)
        |)
        |ORDER BY a_id""".stripMargin)

  val matchStmtNavSql: String =
    graft.Tables.eventsCte +
      """
        |, o AS (SELECT user_id, event_id, value, event_type,
        |    lead(value, 1) OVER w AS v1, lead(value, 2) OVER w AS v2,
        |    lead(value, 3) OVER w AS v3
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_id AS a_id, v1, v2, v3,
        |    (CASE WHEN v1 > value THEN
        |       CASE WHEN v2 > value THEN
        |         CASE WHEN v3 > value THEN 3 ELSE 2 END
        |       ELSE 1 END
        |     ELSE 0 END) AS nb
        |  FROM o WHERE event_type = 'signup')
        |SELECT user_id, a_id, nb::BIGINT AS nb,
        |  CASE nb WHEN 3 THEN v3 WHEN 2 THEN v2 WHEN 1 THEN v1 END AS b_last
        |FROM s WHERE nb >= 1
        |ORDER BY a_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_lookup_async", lookupAsync, Some(lookupAsyncSql)),
    Q("q_match_sql", matchRecognizeStmt, Some(matchRecognizeStmtSql)),
    Q("q_match_sql_updown", matchStmtUpdown, Some(matchStmtUpdownSql)),
    Q("q_match_sql_desc", matchStmtDesc, Some(matchStmtDescSql)),
    Q("q_match_sql_nav", matchStmtNav, Some(matchStmtNavSql)),
    Q("q_match_sql_all", matchStmtAllRows, Some(StreamingQueries.matchAllRowsSql)),
    Q("q_match_sql_within", matchStmtWithin, Some(matchStmtWithinSql)),
    Q("q_grouping_sets", groupingSets, Some(groupingSetsSql)),
    Q("q_over_bounded", overBounded, Some(overBoundedSql)),
    Q("q_match_recognize", matchRecognize, Some(matchRecognizeSql)),
    Q("q_match_alternation", matchAlternation, Some(matchAlternationSql)),
    Q("q_match_permute", matchPermute, Some(matchPermuteSql)),
    Q("q_fn_single_value", fnSingleValue, Some(fnSingleValueSql)),
    Q("q_lookup_join", lookupJoin, Some(lookupJoinSql)),
    Q("q_fn_string2", fnString2, Some(fnString2Sql))
  )
}
