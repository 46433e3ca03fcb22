package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time window semantics over the `events` table, batch form
  * (SURVEY.md §2.6 group windows + §2.4 interval/temporal joins). The
  * same `window()`/`session_window()` expressions power the streaming
  * queries (StreamingQueries.scala) — Spark evaluates them identically
  * in batch, which is exactly the unified batch/stream model the
  * reference advertises.
  *
  * Oracle alignment: Spark's `window()` origin is epoch-aligned; DuckDB
  * `time_bucket` origin (2000-01-01) is a multiple of every width used
  * here, so bucket edges coincide.
  */
object WindowQueries {

  /** TUMBLE window aggregate (ref: StreamExecGroupWindowAggregate
    * .scala:33, Tumble class; SQL TUMBLE_START/_END).
    */
  def windowTumble(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("event_type"), col("cnt"), col("sv"))
      .orderBy("wstart", "event_type")

  val windowTumbleSql: String =
    Tables.eventsCte +
      """
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
        |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
        |  event_type, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM ev GROUP BY 1, 2, 3 ORDER BY wstart, event_type""".stripMargin

  /** Tumbling window with an OFFSET (ref: `TumblingEventTimeWindows.of(
    * size, offset)` / SQL TUMBLE's offset argument — the "daily window
    * in a non-UTC timezone / billing hour starting at :15" feature):
    * 1-hour windows shifted by 15 minutes, so boundaries fall at
    * :15 instead of :00. Spark expresses the same thing with
    * `window(..., startTime)`; the oracle shifts, buckets, and shifts
    * back — the reference's own definition of the offset semantics.
    */
  def windowTumbleOffset(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("event_type"), col("cnt"), col("sv"))
      .orderBy("wstart", "event_type")

  val windowTumbleOffsetSql: String =
    Tables.eventsCte +
      """
        |SELECT time_bucket(INTERVAL '1 hour', ts - INTERVAL '15 minutes')
        |    + INTERVAL '15 minutes' AS wstart,
        |  time_bucket(INTERVAL '1 hour', ts - INTERVAL '15 minutes')
        |    + INTERVAL '75 minutes' AS wend,
        |  event_type, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM ev GROUP BY 1, 2, 3 ORDER BY wstart, event_type""".stripMargin

  /** HOP (sliding) window aggregate, size 1h slide 30m (ref: Slide class,
    * SQL HOP). Each event lands in size/slide = 2 windows; the oracle
    * materializes that expansion with a UNION ALL of shifted buckets.
    */
  def windowHop(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .select(col("w.start").as("wstart"), col("cnt"), col("sv"))
      .orderBy("wstart")

  val windowHopSql: String =
    Tables.eventsCte +
      """
        |, expanded AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart, value FROM ev
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM ev)
        |SELECT wstart, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM expanded GROUP BY wstart ORDER BY wstart""".stripMargin

  /** SESSION window per user, 30 min gap (ref: EventTimeSessionWindows
    * .java:45, MergingWindowSet.java; Session class). Spark's
    * `session_window` end-exclusive merge rule: a gap >= 30 min starts a
    * new session — the oracle's islands computation uses the same `>=`.
    */
  def windowSession(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .select(col("user_id"), col("w.start").as("sstart"), col("cnt"), col("sv"))
      .orderBy("user_id", "sstart")

  val windowSessionSql: String =
    Tables.eventsCte +
      """
        |, marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS sstart, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM sessions GROUP BY user_id, sid ORDER BY user_id, sstart""".stripMargin

  /** Interval (time-bounded) join (ref: KeyedStream.intervalJoin:425,
    * TimeBoundedStreamJoin.java:52): purchases within 1 hour after each
    * signup, per user. Equi-key on user_id keeps it a hash join with a
    * range residual — no cross product.
    */
  def joinInterval(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b,
        col("user_id") === col("b_user")
          && col("b_ts") > col("a_ts")
          && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"),
        "left")
      .groupBy(col("a_id"))
      .agg(count(col("b_id")).as("follows"))
      .orderBy("a_id")
  }

  val joinIntervalSql: String =
    Tables.eventsCte +
      """
        |SELECT a.event_id AS a_id, count(b.event_id) AS follows
        |FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |GROUP BY a.event_id ORDER BY a_id""".stripMargin

  /** As-of (temporal) join via graft.operators.AsOfJoin: each purchase
    * event picks up the latest prior click of the same user. Oracle is
    * DuckDB's native ASOF LEFT JOIN.
    */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    AsOfJoin.backward(
      purchases, clicks,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "click_ts",
      payload = Seq("click_id"), tieBreak = Some("click_id"))
      .select(col("event_id"), col("user_id"), col("click_id"))
      .orderBy("event_id")
  }

  val joinAsofSql: String =
    Tables.eventsCte +
      """
        |SELECT a.event_id, a.user_id, b.click_id
        |FROM (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM ev WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts
        |ORDER BY a.event_id""".stripMargin

  /** The `FOR SYSTEM_TIME AS OF` STATEMENT (ref SqlSnapshot /
    * StreamExecTemporalJoin — the reference's temporal-join SQL shape),
    * routed through [[graft.TemporalSql]]: the versioned side's time
    * axis is declared ONCE on the view (`createVersionedView`, the
    * PRIMARY KEY + WATERMARK DDL analog), the statement never names it,
    * and the lowering is the same oracled [[AsOfJoin.backward]]
    * union-sort plan as [[joinAsof]]. INNER semantics: purchases with
    * no prior click drop (vs [[joinAsof]]'s keep-with-null), so the
    * oracle is the inner ASOF join.
    */
  def joinAsofSqlRoute(s: SparkSession, dir: String): DataFrame = {
    val env = graft.TableEnv(s, dir)
    val ev = Tables.events(s, dir)
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("asof_purchases")
    env.createVersionedView("asof_clicks",
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id")),
      versionTimeCol = "click_ts", tieBreak = Some("click_id"))
    env.sqlQuery(
      """SELECT p.event_id, p.user_id, v.click_id
        |FROM asof_purchases p
        |JOIN asof_clicks FOR SYSTEM_TIME AS OF p.ts AS v
        |ON v.user_id = p.user_id
        |ORDER BY event_id""".stripMargin)
  }

  val joinAsofSqlRouteSql: String =
    Tables.eventsCte +
      """
        |SELECT a.event_id, a.user_id, b.click_id
        |FROM (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase') a
        |ASOF JOIN (SELECT user_id, ts, event_id AS click_id FROM ev WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts
        |ORDER BY a.event_id""".stripMargin

  /** The temporal table FUNCTION syntax (ref: TemporalTableFunction /
    * `LATERAL TABLE (Rates(o.rowtime))` — the reference's OTHER
    * temporal-join SQL form, predating FOR SYSTEM_TIME AS OF): the
    * function is declared with its version axis and primary key
    * (`createTemporalTableFunction`), the statement supplies the key
    * equalities in WHERE, and [[graft.TemporalSql.runFn]] lowers onto
    * the same as-of plan as the SYSTEM_TIME route — the two syntaxes
    * MUST agree, so the oracle is [[joinAsofSqlRouteSql]] verbatim.
    * A residual WHERE conjunct exercises the pass-through path.
    */
  def joinTemporalFn(s: SparkSession, dir: String): DataFrame = {
    val env = graft.TableEnv(s, dir)
    val ev = Tables.events(s, dir)
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("tfn_purchases")
    env.createTemporalTableFunction("clicks_fn",
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id")),
      timeAttr = "click_ts", primaryKeys = Seq("user_id"), tieBreak = Some("click_id"))
    env.sqlQuery(
      """SELECT p.event_id, p.user_id, r.click_id
        |FROM tfn_purchases p, LATERAL TABLE (clicks_fn(p.ts)) r
        |WHERE r.user_id = p.user_id AND p.event_id >= 0
        |ORDER BY p.event_id""".stripMargin)
  }

  /** CUMULATE windows, batch form (ref: windowing TVF CUMULATE(step 15m,
    * size 1h)): each event feeds every expanding window that contains it
    * — explode bounded by maxK, one shuffle to the aggregate.
    */
  def windowCumulate(s: SparkSession, dir: String): DataFrame =
    graft.operators.CumulateWindows
      .assign(Tables.events(s, dir), "ts", stepSec = 900, maxK = 4)
      .groupBy("wstart", "wend")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .orderBy("wstart", "wend")

  val windowCumulateSql: String =
    Tables.eventsCte +
      """
        |, base AS (SELECT *, date_trunc('hour', ts) AS wstart,
        |    CAST(floor(epoch(ts - date_trunc('hour', ts)) / 900) AS BIGINT) AS k0 FROM ev)
        |SELECT wstart, wstart + k * INTERVAL '15 minutes' AS wend,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM base JOIN generate_series(1, 4) t(k) ON t.k > base.k0
        |GROUP BY wstart, wend ORDER BY wstart, wend""".stripMargin

  /** The windowing-TVF SQL STATEMENTS through `TableEnv.sqlQuery` —
    * the reference's flagship §2.6 SQL shape (`SqlTumbleTableFunction`
    * etc.), routed through [[graft.WindowTvfSql]]'s rewriter. Each
    * reuses its DataFrame-API twin's oracle VERBATIM: the SQL route
    * must produce the same rows as `window()` / `CumulateWindows`.
    */
  def windowSqlTumble(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT window_start AS wstart, window_end AS wend, event_type,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY 1, 2, 3 ORDER BY wstart, event_type""".stripMargin)

  def windowSqlHop(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT window_start AS wstart, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
        |               INTERVAL '30' MINUTE, INTERVAL '1' HOUR))
        |GROUP BY 1 ORDER BY wstart""".stripMargin)

  def windowSqlCumulate(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT window_start AS wstart, window_end AS wend,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
        |                    INTERVAL '15' MINUTE, INTERVAL '60' MINUTE))
        |GROUP BY 1, 2 ORDER BY wstart, wend""".stripMargin)

  /** SESSION windowing TVF statement (ref: SqlSessionTableFunction —
    * `SESSION(TABLE t PARTITION BY k, DESCRIPTOR(ts), gap)`), routed
    * through [[graft.WindowTvfSql]]'s island lowering: bounds are
    * data-dependent (start = first element, end = last element + gap),
    * so unlike TUMBLE/HOP the rewrite is three analytic passes over one
    * key-ordered exchange rather than a per-row closed form. Groups by
    * BOTH bounds to exercise the window_end formula.
    */
  def windowSqlSession(s: SparkSession, dir: String): DataFrame =
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT user_id, window_start AS sstart, window_end AS send,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
        |                   DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        |GROUP BY 1, 2, 3 ORDER BY user_id, sstart""".stripMargin)

  val windowSqlSessionSql: String =
    Tables.eventsCte +
      """
        |, marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS sstart,
        |  max(ts) + INTERVAL '30 minutes' AS send,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM sessions GROUP BY user_id, sid ORDER BY user_id, sstart""".stripMargin

  /** Session windows with a DYNAMIC gap (ref: SessionWindowTimeGapExtractor
    * / EventTimeSessionWindows.withDynamicGap): each event extends its
    * session by its own gap — purchases keep sessions alive 60 minutes,
    * everything else 15. The oracle replays the merge rule directly: a
    * new session starts when an event's time reaches the running max of
    * (prior ts + prior gap), in exact microseconds.
    */
  def windowSessionDynamic(s: SparkSession, dir: String): DataFrame = {
    // gap must be CalendarIntervalType: string forms, not DayTimeInterval
    val gap = when(col("event_type") === "purchase", lit("60 minutes"))
      .otherwise(lit("15 minutes"))
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("sstart"), col("cnt"))
      .orderBy("user_id", "sstart")
  }

  val windowSessionDynamicSql: String =
    Tables.eventsCte +
      """
        |, g AS (SELECT *, CASE WHEN event_type = 'purchase' THEN 3600000000 ELSE 900000000 END AS gap_us FROM ev),
        |m AS (SELECT *,
        |    max(epoch_us(ts) + gap_us) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS reach
        |  FROM g),
        |s AS (SELECT *, CASE WHEN reach IS NULL OR epoch_us(ts) >= reach THEN 1 ELSE 0 END AS brk FROM m),
        |i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s)
        |SELECT user_id, min(ts) AS sstart, count(*) AS cnt
        |FROM i GROUP BY user_id, sid ORDER BY user_id, sstart""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_window_session_dynamic", windowSessionDynamic, Some(windowSessionDynamicSql)),
    Q("q_window_cumulate", windowCumulate, Some(windowCumulateSql)),
    Q("q_window_tumble", windowTumble, Some(windowTumbleSql)),
    Q("q_window_tumble_offset", windowTumbleOffset, Some(windowTumbleOffsetSql)),
    Q("q_window_sql_tumble", windowSqlTumble, Some(windowTumbleSql)),
    Q("q_window_sql_hop", windowSqlHop, Some(windowHopSql)),
    Q("q_window_sql_cumulate", windowSqlCumulate, Some(windowCumulateSql)),
    Q("q_window_sql_session", windowSqlSession, Some(windowSqlSessionSql)),
    Q("q_window_hop", windowHop, Some(windowHopSql)),
    Q("q_window_session", windowSession, Some(windowSessionSql)),
    Q("q_join_interval", joinInterval, Some(joinIntervalSql)),
    Q("q_join_asof", joinAsof, Some(joinAsofSql)),
    Q("q_join_asof_sql", joinAsofSqlRoute, Some(joinAsofSqlRouteSql)),
    Q("q_join_temporal_fn", joinTemporalFn, Some(joinAsofSqlRouteSql))
  )
}
