package graft.cep

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The SQL-statement MATCH_RECOGNIZE route: clause parsing, measure
  * forms, skip modes, and the loud failures for the documented
  * out-of-subset constructs. End-to-end oracle coverage is q_match_sql.
  */
class MatchRecognizeSqlSpec extends SparkSpec {

  private def mkView(): Unit = {
    import spark.implicits._
    Seq(
      // user 1: V V P V  → (A|B)+ P style fixtures; ord gives total order
      (1L, 1L, "view", 2.0), (1L, 2L, "view", 3.0), (1L, 3L, "purchase", 10.0),
      (1L, 4L, "view", 1.0),
      // user 2: V P V P — two disjoint matches
      (2L, 1L, "view", 5.0), (2L, 2L, "purchase", 7.0),
      (2L, 3L, "view", 6.0), (2L, 4L, "purchase", 8.0),
      // user 3: no purchase
      (3L, 1L, "view", 9.0)
    ).toDF("uid", "ord", "etype", "amount").createOrReplaceTempView("mr_ev")
  }

  test("SQL route: FIRST/LAST/COUNT/SUM/MIN/MAX measures, greedy V+") {
    mkView()
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, first_v, last_v, n_v, sum_v, min_v, max_v, p_amt
        |FROM mr_ev MATCH_RECOGNIZE (
        |  PARTITION BY uid
        |  ORDER BY ord
        |  MEASURES FIRST(V.ord) AS first_v, LAST(V.ord) AS last_v,
        |    COUNT(V.*) AS n_v, SUM(V.amount) AS sum_v,
        |    MIN(V.amount) AS min_v, MAX(V.amount) AS max_v,
        |    P.amount AS p_amt
        |  ONE ROW PER MATCH
        |  PATTERN (V+ P)
        |  DEFINE V AS etype = 'view', P AS etype = 'purchase'
        |) ORDER BY uid, first_v""".stripMargin)
    val got = out.collect().toSeq
    assert(got === Seq(
      Row(1L, 1L, 2L, 2L, 5.0, 2.0, 3.0, 10.0),
      Row(2L, 1L, 1L, 1L, 5.0, 5.0, 5.0, 7.0),
      Row(2L, 3L, 3L, 1L, 6.0, 6.0, 6.0, 8.0)))
  }

  test("SQL route: COUNT(*), undefined variable matches any row, SKIP TO NEXT ROW") {
    mkView()
    // X has no DEFINE → matches any row (SQL default); SKIP TO NEXT ROW
    // re-scans from the row after each match START, so the X P pairs
    // overlap-step instead of jumping past the match
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, x_ord, n FROM mr_ev MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES FIRST(X.ord) AS x_ord, COUNT(*) AS n
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (X P)
        |  DEFINE P AS etype = 'purchase'
        |) ORDER BY uid, x_ord""".stripMargin)
    val got = out.collect().toSeq
    // user1: (2,P@3); user2: (1,P@2) and (3,P@4) — X is the row right
    // before each purchase
    assert(got === Seq(Row(1L, 2L, 2L), Row(2L, 1L, 2L), Row(2L, 3L, 2L)))
  }

  test("SQL route: ALL ROWS PER MATCH emits per-event rows with CLASSIFIER and RUNNING count") {
    mkView()
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, ord, cls, rcnt, n FROM mr_ev MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES CLASSIFIER() AS cls, RUNNING COUNT(*) AS rcnt, COUNT(*) AS n
        |  ALL ROWS PER MATCH
        |  PATTERN (V+ P)
        |  DEFINE V AS etype = 'view', P AS etype = 'purchase'
        |) ORDER BY uid, ord""".stripMargin)
    val got = out.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // user 1: V@1 V@2 P@3 (greedy V+) → 3 rows of one match
    assert(got.filter(_._1 == 1L) === Seq(
      (1L, 1L, "V", 1L, 3L), (1L, 2L, "V", 2L, 3L), (1L, 3L, "P", 3L, 3L)))
    // user 2: two disjoint V P matches
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._3, t._4, t._5)) ===
      Seq((1L, "V", 1L, 2L), (2L, "P", 2L, 2L), (3L, "V", 1L, 2L), (4L, "P", 2L, 2L)))
  }

  test("SQL route: WITHIN bounds the match window from the match start") {
    import spark.implicits._
    // ord doubles as epoch seconds via CAST in the route
    Seq((1L, 100L, "view"), (1L, 130L, "purchase"), // 30 s apart → inside
        (2L, 100L, "view"), (2L, 200L, "purchase")) // 100 s apart → outside
      .toDF("uid", "ord", "etype").createOrReplaceTempView("mr_w")
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid FROM mr_w MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES FIRST(V.ord) AS v_ord
        |  PATTERN (V P)
        |  WITHIN INTERVAL '1' MINUTE
        |  DEFINE V AS etype = 'view', P AS etype = 'purchase'
        |) ORDER BY uid""".stripMargin)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("SQL route: documented out-of-subset constructs fail loudly") {
    mkView()
    val badWithin = intercept[IllegalArgumentException] {
      MatchRecognizeSql.run(spark,
        """SELECT * FROM mr_ev MATCH_RECOGNIZE (
          |  PARTITION BY uid ORDER BY ord
          |  MEASURES COUNT(*) AS n
          |  PATTERN (V P)
          |  WITHIN INTERVAL '1' FORTNIGHT
          |  DEFINE V AS etype = 'view', P AS etype = 'purchase'
          |)""".stripMargin)
    }
    assert(badWithin.getMessage.contains("unsupported WITHIN"))
    val badMeasure = intercept[IllegalArgumentException] {
      MatchRecognizeSql.run(spark,
        """SELECT * FROM mr_ev MATCH_RECOGNIZE (
          |  PARTITION BY uid ORDER BY ord
          |  MEASURES AVG(V.amount) + 1 AS n
          |  PATTERN (V P) DEFINE V AS etype = 'view', P AS etype = 'purchase'
          |)""".stripMargin)
    }
    assert(badMeasure.getMessage.contains("unsupported MEASURES"))
  }

  test("SQL route: a clause out of canonical order fails loudly, never silently drops") {
    mkView()
    // WITHIN placed BEFORE PATTERN: the sequential parser must reject it
    // rather than leave the match unbounded in time
    val bad = intercept[IllegalArgumentException] {
      MatchRecognizeSql.run(spark,
        """SELECT * FROM mr_ev MATCH_RECOGNIZE (
          |  PARTITION BY uid ORDER BY ord
          |  MEASURES COUNT(*) AS n
          |  WITHIN INTERVAL '1' MINUTE
          |  PATTERN (V P)
          |  DEFINE V AS etype = 'view', P AS etype = 'purchase'
          |)""".stripMargin)
    }
    assert(bad.getMessage.contains("out of the canonical"), bad.getMessage)
  }

  test("SQL route: doubled-quote escapes inside string literals stay masked") {
    import spark.implicits._
    Seq((1L, 1L, "O'Brien AND Sons"), (1L, 2L, "purchase"))
      .toDF("uid", "ord", "etype").createOrReplaceTempView("mr_q")
    // the literal contains an escaped quote AND a bare AND — the clause
    // splitter must not cut inside it
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, n FROM mr_q MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES COUNT(*) AS n
        |  PATTERN (V P)
        |  DEFINE V AS etype = 'O''Brien AND Sons', P AS etype = 'purchase'
        |) ORDER BY uid""".stripMargin)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("SQL route: DEFINE with PREV lowers to lag() — the canonical V-shape") {
    import spark.implicits._
    Seq((1L, 1L, 10.0), (1L, 2L, 8.0), (1L, 3L, 6.0), (1L, 4L, 7.0),
        (1L, 5L, 9.0), (1L, 6L, 5.0),
        (2L, 1L, 3.0), (2L, 2L, 4.0))
      .toDF("sym", "seq", "price").createOrReplaceTempView("mr_px")
    val out = MatchRecognizeSql.run(spark,
      """SELECT sym, bottom, up_last FROM mr_px MATCH_RECOGNIZE (
        |  PARTITION BY sym
        |  ORDER BY seq
        |  MEASURES LAST(DOWN.price) AS bottom, LAST(UP.price) AS up_last
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (STRT DOWN+ UP+)
        |  DEFINE DOWN AS DOWN.price < PREV(DOWN.price),
        |         UP AS UP.price > PREV(UP.price)
        |) ORDER BY sym""".stripMargin)
    assert(out.collect().toSeq === Seq(Row(1L, 6.0, 9.0)))
  }

  test("SQL route: FIRST/LAST navigation in DEFINE lowers to an iterative condition") {
    import spark.implicits._
    Seq((1L, 1L, 10.0), (1L, 2L, 8.0), (1L, 3L, 6.0), (1L, 4L, 7.0), (1L, 5L, 9.0))
      .toDF("sym", "seq", "price").createOrReplaceTempView("mr_px2")
    // UP must beat both its predecessor AND the first DOWN price: the
    // start-at-10 attempt fails (7 < first down 8), the start-at-8
    // attempt succeeds (7 > first down 6)
    val out = MatchRecognizeSql.run(spark,
      """SELECT sym, first_down, up_last FROM mr_px2 MATCH_RECOGNIZE (
        |  PARTITION BY sym ORDER BY seq
        |  MEASURES FIRST(DOWN.price) AS first_down, LAST(UP.price) AS up_last
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (STRT DOWN+ UP+)
        |  DEFINE DOWN AS DOWN.price < PREV(DOWN.price),
        |         UP AS UP.price > PREV(UP.price) AND UP.price > FIRST(DOWN.price)
        |) ORDER BY sym""".stripMargin)
    assert(out.collect().toSeq === Seq(Row(1L, 6.0, 9.0)))
  }

  test("SQL route: ORDER BY DESC matches over the reversed sequence") {
    mkView()
    // in DESC order, P V = a purchase whose ASC-immediate predecessor is a view
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, p_ord, v_ord FROM mr_ev MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord DESC
        |  MEASURES P.ord AS p_ord, V.ord AS v_ord
        |  PATTERN (P V)
        |  DEFINE P AS etype = 'purchase', V AS etype = 'view'
        |) ORDER BY uid, p_ord""".stripMargin)
    assert(out.collect().toSeq ===
      Seq(Row(1L, 3L, 2L), Row(2L, 2L, 1L), Row(2L, 4L, 3L)))
  }

  test("SQL route: subquery FROM operand") {
    mkView()
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, n FROM (SELECT uid, ord, etype FROM mr_ev WHERE uid <> 2)
        |MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES COUNT(V.*) AS n
        |  PATTERN (V+ P)
        |  DEFINE V AS etype = 'view', P AS etype = 'purchase'
        |) ORDER BY uid""".stripMargin)
    assert(out.collect().toSeq === Seq(Row(1L, 2L)))
  }

  test("SQL route: RUNNING SUM/MIN/MAX under ALL ROWS PER MATCH") {
    mkView()
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, ord, rsum, rmin, rmax FROM mr_ev MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES RUNNING SUM(V.amount) AS rsum, RUNNING MIN(amount) AS rmin,
        |    RUNNING MAX(amount) AS rmax
        |  ALL ROWS PER MATCH
        |  PATTERN (V+ P)
        |  DEFINE V AS etype = 'view', P AS etype = 'purchase'
        |) ORDER BY uid, ord""".stripMargin)
    val u1 = out.collect().toSeq.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // V@1(2.0) V@2(3.0) P@3(10.0): V-qualified RUNNING SUM freezes at the P
    // row; unqualified RUNNING MIN/MAX see every match row
    assert(u1 === Seq((1L, 2.0, 2.0, 2.0), (2L, 5.0, 2.0, 3.0), (3L, 5.0, 2.0, 10.0)))
  }

  test("SQL route: AFTER MATCH SKIP TO FIRST/LAST variable") {
    import spark.implicits._
    Seq((1L, 1L, "view"), (1L, 2L, "view"), (1L, 3L, "view"), (1L, 4L, "purchase"))
      .toDF("uid", "ord", "etype").createOrReplaceTempView("mr_skip")
    def run(skip: String): Int = MatchRecognizeSql.run(spark,
      s"""SELECT uid FROM mr_skip MATCH_RECOGNIZE (
         |  PARTITION BY uid ORDER BY ord
         |  MEASURES COUNT(A.*) AS na
         |  AFTER MATCH $skip
         |  PATTERN (A+ P)
         |  DEFINE A AS etype = 'view', P AS etype = 'purchase'
         |)""".stripMargin).count().toInt
    assert(run("SKIP PAST LAST ROW") === 1) // [1,2,3]+4
    assert(run("SKIP TO LAST A") === 2)     // restart at 3 → [3]+4
    assert(run("SKIP TO A") === 2)          // bare variable ≡ LAST
    assert(run("SKIP TO FIRST A") === 3)    // restart at 2 → [2,3]+4 → [3]+4
  }

  test("SQL route: clause keywords inside DEFINE expressions do not truncate clauses") {
    import spark.implicits._
    // columns literally named pattern / within, referenced in DEFINE —
    // the sequential depth-0 parser must not mistake them for clauses
    Seq((1L, 1L, "view", 5L, 1L), (1L, 2L, "purchase", 7L, 1L))
      .toDF("uid", "ord", "etype", "pattern", "within").createOrReplaceTempView("mr_kw")
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, n FROM mr_kw MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES COUNT(*) AS n
        |  PATTERN (V P)
        |  DEFINE V AS etype = 'view' AND pattern > 0 AND within = 1,
        |         P AS etype = 'purchase'
        |) ORDER BY uid""".stripMargin)
    assert(out.collect().toSeq === Seq(Row(1L, 2L)))
  }

  test("SQL route: navigation-shaped text inside a DEFINE string literal is data, not syntax") {
    import spark.implicits._
    // etype values literally contain PREV(V.x) / V.note shapes — the
    // PrevNextRx / qualified-ref rewrites must not fire inside literals
    Seq((1L, 1L, "PREV(V.x)"), (1L, 2L, "V.note"), (1L, 3L, "FIRST(A.y)"))
      .toDF("uid", "ord", "etype").createOrReplaceTempView("mr_lit")
    val out = MatchRecognizeSql.run(spark,
      """SELECT uid, n FROM mr_lit MATCH_RECOGNIZE (
        |  PARTITION BY uid ORDER BY ord
        |  MEASURES COUNT(*) AS n
        |  PATTERN (V W F)
        |  DEFINE V AS etype = 'PREV(V.x)',
        |         W AS etype = 'V.note',
        |         F AS etype = 'FIRST(A.y)'
        |) ORDER BY uid""".stripMargin)
    assert(out.collect().toSeq === Seq(Row(1L, 3L)))
  }

  test("SQL route: FIRST/LAST navigating an unknown pattern variable fails loudly") {
    mkView()
    // ZZ is not in the pattern — eventsFor would return empty and the
    // condition would be silently always-false; must error instead
    val bad = intercept[IllegalArgumentException] {
      MatchRecognizeSql.run(spark,
        """SELECT * FROM mr_ev MATCH_RECOGNIZE (
          |  PARTITION BY uid ORDER BY ord
          |  MEASURES COUNT(*) AS n
          |  PATTERN (V P)
          |  DEFINE V AS etype = 'view',
          |         P AS etype = 'purchase' AND amount > FIRST(ZZ.amount)
          |)""".stripMargin)
    }
    assert(bad.getMessage.contains("unknown pattern variable"), bad.getMessage)
  }

  test("applies() is word-bounded and case-insensitive") {
    assert(MatchRecognizeSql.applies("select 1 from t match_recognize (x)"))
    assert(!MatchRecognizeSql.applies("select match_recognized from t"))
    assert(!MatchRecognizeSql.applies("select 1 from t"))
  }
}
