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

  test("applies() is word-bounded and case-insensitive") {
    assert(MatchRecognizeSql.applies("select 1 from t match_recognize (x)"))
    assert(!MatchRecognizeSql.applies("select match_recognized from t"))
    assert(!MatchRecognizeSql.applies("select 1 from t"))
  }
}
