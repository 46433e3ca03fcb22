package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Event

/** The TableEnvironment facade surface: the watermark-DDL analog
  * (createStreamingView) and the sqlQuery MATCH_RECOGNIZE routing
  * predicate. End-to-end oracle coverage: q_stream_tumble (declared
  * watermark) and q_match_sql (SQL route).
  */
class TableEnvSpec extends SparkSpec {
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("createStreamingView: registered view carries the declared watermark") {
    import spark.implicits._
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    val input = MemoryStream[Event]
    env.createStreamingView("tenv_wm_view", input.toDF(), "ts", "7 minutes")
    val fromView = spark.table("tenv_wm_view")
    assert(fromView.isStreaming)
    // the bound must live in the VIEW's plan — a downstream query that
    // never calls withWatermark inherits it (the per-table WatermarkSpec
    // posture); EventTimeWatermark carries the declared 7-minute delay
    val analyzed = fromView.groupBy(window(col("ts"), "1 hour")).count()
      .queryExecution.analyzed
    val wm = analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => w
    }
    assert(wm.nonEmpty, s"no EventTimeWatermark in the view-consumer plan:\n$analyzed")
    assert(wm.head.delay.toString.contains("7 minutes"))
  }

  test("createStreamingView rejects batch inputs loudly") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    val e = intercept[IllegalArgumentException] {
      env.createStreamingView("tenv_batch", spark.range(3).toDF(), "id", "1 minute")
    }
    assert(e.getMessage.contains("batch DataFrame"))
  }

  test("explainSql surfaces the three-layer formatted plan") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    val plan = env.explainSql(
      "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("HashAggregate"))
  }

  test("sqlQuery routes MATCH_RECOGNIZE statements and plain SQL correctly") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    // plain SQL goes straight to Catalyst
    assert(env.sqlQuery("SELECT count(*) AS n FROM nation").head().getLong(0) === 25L)
    // the MR route produces rows through the NFA (smoke: flagship shape)
    val mr = env.sqlQuery(
      """SELECT user_id, n FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES COUNT(P.*) AS n
        |  PATTERN (S P+)
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
    assert(mr.columns.toSeq === Seq("user_id", "n"))
    assert(mr.count() >= 0L) // parses, lowers, and executes
  }

  test("join-strategy hints flip the physical join through the SQL route") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    def planFor(hint: String): String = env.sqlQuery(
      s"""SELECT $hint c_nationkey, count(*) AS n
         |FROM customer c JOIN orders o ON o_custkey = c_custkey
         |GROUP BY c_nationkey""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(planFor("/*+ SHUFFLE_MERGE(c) */").contains("SortMergeJoin"))
    assert(planFor("/*+ SHUFFLE_HASH(c) */").contains("ShuffledHashJoin"))
    assert(planFor("/*+ BROADCAST(c) */").contains("BroadcastHashJoin"))
  }

  test("FOR SYSTEM_TIME AS OF: LEFT keeps unmatched probes, tails pass through, misuse fails loudly") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("tj_purchases")
    env.createVersionedView("tj_clicks",
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id")),
      versionTimeCol = "click_ts", tieBreak = Some("click_id"))
    val inner = env.sqlQuery(
      """SELECT p.event_id, v.click_id FROM tj_purchases p
        |JOIN tj_clicks FOR SYSTEM_TIME AS OF p.ts AS v ON v.user_id = p.user_id""".stripMargin)
    val left = env.sqlQuery(
      """SELECT p.event_id, v.click_id FROM tj_purchases p
        |LEFT JOIN tj_clicks FOR SYSTEM_TIME AS OF p.ts AS v ON v.user_id = p.user_id""".stripMargin)
    val nProbe = spark.table("tj_purchases").count()
    assert(left.count() === nProbe) // LEFT keeps every probe row
    assert(inner.count() === left.filter(col("click_id").isNotNull).count())
    assert(inner.count() < nProbe) // fixture has purchases before any click
    // WHERE/ORDER tail passes through to Catalyst over the joined view
    val tail = env.sqlQuery(
      """SELECT p.event_id, v.click_id FROM tj_purchases p
        |JOIN tj_clicks FOR SYSTEM_TIME AS OF p.ts AS v ON v.user_id = p.user_id
        |WHERE p.user_id % 2 = 0 ORDER BY event_id LIMIT 5""".stripMargin)
    assert(tail.count() <= 5)
    // misuse: undeclared versioned view; AS OF from the version side
    intercept[IllegalArgumentException](env.sqlQuery(
      "SELECT p.event_id FROM tj_purchases p JOIN tj_purchases FOR SYSTEM_TIME AS OF p.ts AS v ON v.user_id = p.user_id"))
    intercept[IllegalArgumentException](env.sqlQuery(
      "SELECT p.event_id FROM tj_purchases p JOIN tj_clicks FOR SYSTEM_TIME AS OF v.click_ts AS v ON v.user_id = p.user_id"))
  }

  test("LATERAL TABLE temporal function: inner semantics, residual WHERE, misuse fails loudly") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("tfn_p")
    env.createTemporalTableFunction("tfn_clicks",
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid")),
      timeAttr = "cts", primaryKeys = Seq("user_id"), tieBreak = Some("cid"))
    val viaFn = env.sqlQuery(
      """SELECT p.event_id, r.cid FROM tfn_p p, LATERAL TABLE (tfn_clicks(p.ts)) r
        |WHERE r.user_id = p.user_id""".stripMargin)
    // must EQUAL the FOR SYSTEM_TIME route on the same frames
    env.createVersionedView("tfn_clicks_v",
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid")),
      versionTimeCol = "cts", tieBreak = Some("cid"))
    val viaAsOf = env.sqlQuery(
      """SELECT p.event_id, v.cid FROM tfn_p p
        |JOIN tfn_clicks_v FOR SYSTEM_TIME AS OF p.ts AS v ON v.user_id = p.user_id""".stripMargin)
    assert(viaFn.exceptAll(viaAsOf).isEmpty && viaAsOf.exceptAll(viaFn).isEmpty)
    // residual WHERE conjunct filters through
    val filtered = env.sqlQuery(
      """SELECT p.event_id, r.cid FROM tfn_p p, LATERAL TABLE (tfn_clicks(p.ts)) r
        |WHERE r.user_id = p.user_id AND p.user_id % 2 = 0""".stripMargin)
    assert(filtered.count() === viaFn.count() -
      env.sqlQuery("""SELECT p.event_id, r.cid FROM tfn_p p, LATERAL TABLE (tfn_clicks(p.ts)) r
        |WHERE r.user_id = p.user_id AND p.user_id % 2 = 1""".stripMargin).count())
    // misuse: unregistered function; missing pk equality; time from version side
    val e1 = intercept[IllegalArgumentException](env.sqlQuery(
      "SELECT p.event_id FROM tfn_p p, LATERAL TABLE (nope(p.ts)) r WHERE r.user_id = p.user_id"))
    assert(e1.getMessage.contains("not a registered temporal table function"))
    val e2 = intercept[IllegalArgumentException](env.sqlQuery(
      "SELECT p.event_id FROM tfn_p p, LATERAL TABLE (tfn_clicks(p.ts)) r WHERE p.user_id % 2 = 0"))
    assert(e2.getMessage.contains("every declared primary key"))
    val e3 = intercept[IllegalArgumentException](env.sqlQuery(
      "SELECT p.event_id FROM tfn_p p, LATERAL TABLE (tfn_clicks(r.cts)) r WHERE r.user_id = p.user_id"))
    assert(e3.getMessage.contains("probe side"))
  }

  test("SqlLex.splitTopAnd: literal- and paren-aware conjunct boundaries") {
    assert(SqlLex.splitTopAnd("a = 'x AND y' AND b = 1") ===
      Seq("a = 'x AND y'", "b = 1"))
    assert(SqlLex.splitTopAnd("(a AND b) AND c") === Seq("(a AND b)", "c"))
    // boundary char straight after AND still participates in paren depth
    assert(SqlLex.splitTopAnd("a = 1 AND(b = 2 AND c = 3)") ===
      Seq("a = 1", "(b = 2 AND c = 3)"))
    // word-bounded: column names containing "and" are not boundaries
    assert(SqlLex.splitTopAnd("brand = 1 AND android = 2") ===
      Seq("brand = 1", "android = 2"))
    // the temporal-fn route must not shear a literal containing AND +
    // a key-shaped fragment (the r10 review's corruption case)
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        lit("x AND r.user_id = p.user_id AND y").as("note"))
      .createOrReplaceTempView("lex_p")
    env.createTemporalTableFunction("lex_clicks",
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid")),
      timeAttr = "cts", primaryKeys = Seq("user_id"), tieBreak = Some("cid"))
    val out = env.sqlQuery(
      """SELECT p.event_id, r.cid FROM lex_p p, LATERAL TABLE (lex_clicks(p.ts)) r
        |WHERE r.user_id = p.user_id AND p.note = 'x AND r.user_id = p.user_id AND y'""".stripMargin)
    // the literal predicate is TRUE for every row — the result must
    // equal the unfiltered join, not a corrupted residual
    val base = env.sqlQuery(
      """SELECT p.event_id, r.cid FROM lex_p p, LATERAL TABLE (lex_clicks(p.ts)) r
        |WHERE r.user_id = p.user_id""".stripMargin)
    assert(out.count() === base.count())
  }

  test("WindowTvfSql: rewrite shapes, reference arg order, cumulate validation") {
    assert(!WindowTvfSql.applies("SELECT window(ts, '1 hour') FROM t"))
    val t = WindowTvfSql.rewrite(
      "SELECT * FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))")
    assert(t.contains("window(ts, '1 hour')") && t.contains("window_start")
      && t.contains("window_time"))
    // HOP: reference order is (slide, size); Spark window() wants (size, slide)
    val h = WindowTvfSql.rewrite(
      "SELECT * FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '30' MINUTE, INTERVAL '1' HOUR))")
    assert(h.contains("window(ts, '1 hour', '30 minute')"))
    val c = WindowTvfSql.rewrite(
      "SELECT * FROM TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '60' MINUTE))")
    assert(c.contains("sequence(1, 4)") && c.contains("timestampadd(MINUTE, 15 * __k"))
    intercept[IllegalArgumentException](WindowTvfSql.rewrite(
      "SELECT * FROM TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '7' MINUTE, INTERVAL '60' MINUTE))"))
    // streaming lowering: aggregate shape folds onto GROUP BY window(...)
    val sa = WindowTvfSql.rewriteStreamingAgg(
      """SELECT window_start AS w, event_type, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start, event_type ORDER BY w""".stripMargin).get
    assert(sa.contains("GROUP BY window(ts, '1 hour'), event_type"))
    assert(sa.contains("window.start AS w") && !sa.contains("TUMBLE"))
    // non-aggregate shape: no lowering — caller falls back
    assert(WindowTvfSql.rewriteStreamingAgg(
      "SELECT * FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))").isEmpty)
  }

  test("SESSION TVF: island lowering equals Spark's session_window, keys optional") {
    // rewrite shape: lag breaks, running-sum island ids, per-island bounds
    val s = WindowTvfSql.rewrite(
      "SELECT * FROM TABLE(SESSION(TABLE ev PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTE))")
    assert(s.contains("PARTITION BY user_id ORDER BY ts") && s.contains("__sid")
      && s.contains("INTERVAL 30 MINUTE") && s.contains("window_time") && !s.contains("SESSION("))
    // keyless form: global ordering, island-only bounds partition
    val g = WindowTvfSql.rewrite(
      "SELECT * FROM TABLE(SESSION(TABLE ev, DESCRIPTOR(ts), INTERVAL '5' MINUTE))")
    assert(g.contains("(ORDER BY ts") && g.contains("PARTITION BY __sid"))
    // streaming lowering: folds onto GROUP BY session_window(...), and
    // refuses a GROUP BY that widens the per-key merge scope
    val sl = WindowTvfSql.rewriteStreamingAgg(
      """SELECT user_id, window_start AS a, window_end AS b, count(*) AS cnt
        |FROM TABLE(SESSION(TABLE ev PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        |GROUP BY window_start, window_end, user_id""".stripMargin).get
    assert(sl.contains("GROUP BY session_window(ts, '30 minute'), user_id")
      && sl.contains("session_window.start AS a") && sl.contains("session_window.end AS b"))
    intercept[IllegalArgumentException](WindowTvfSql.rewriteStreamingAgg(
      """SELECT window_start AS a, count(*) AS cnt
        |FROM TABLE(SESSION(TABLE ev PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        |GROUP BY window_start""".stripMargin))
    // semantics: TVF aggregate == Spark's own session_window aggregate
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    val viaSql = env.sqlQuery(
      """SELECT user_id, window_start AS sstart, window_end AS send, count(*) AS cnt
        |FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        |GROUP BY 1, 2, 3""".stripMargin)
    val viaApi = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("sstart"), col("w.end").as("send"), col("cnt"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("window-TVF SQL route equals the DataFrame API result") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    val viaSql = env.sqlQuery(
      """SELECT window_start AS wstart, event_type, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY 1, 2""".stripMargin)
    val viaApi = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("executeSql DDL: CREATE TABLE registers schema+path, WATERMARK makes a streaming view") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    // batch source table over an existing warehouse path
    val st = env.executeSql(
      s"""CREATE TABLE ddlspec_nation (n_nationkey BIGINT, n_name STRING,
         |  n_regionkey BIGINT, n_comment STRING)
         |WITH ('connector'='filesystem', 'path'='$dir/nation.parquet', 'format'='parquet')""".stripMargin)
    assert(st.collect().head.getString(2) === "OK")
    assert(env.executeSql("SELECT count(*) AS n FROM ddlspec_nation").head().getLong(0) === 25L)
    // WATERMARK clause → the registered view is STREAMING and carries the bound
    val wmDir = java.nio.file.Files.createTempDirectory("ddlspec-wm").toString
    env.executeSql(
      s"""CREATE TABLE ddlspec_stream (id BIGINT, ts TIMESTAMP(3), v DOUBLE,
         |  WATERMARK FOR ts AS ts - INTERVAL '7' MINUTE)
         |WITH ('connector'='filesystem', 'path'='$wmDir', 'format'='parquet')""".stripMargin)
    val view = spark.table("ddlspec_stream")
    assert(view.isStreaming)
    val wm = view.groupBy(window(col("ts"), "1 hour")).count()
      .queryExecution.analyzed.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => w
      }
    assert(wm.nonEmpty && wm.head.delay.toString.contains("7 minutes"))
  }

  test("executeSql DML: INSERT aligns positionally with casts; OVERWRITE replaces; VIEW routes") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("ddlspec-sink").toString
    env.executeSql(
      s"""CREATE TABLE ddlspec_sink (k STRING, n BIGINT)
         |WITH ('connector'='filesystem', 'path'='$out', 'format'='parquet')""".stripMargin)
    // a not-yet-written sink reads as the declared empty schema
    assert(env.executeSql("SELECT * FROM ddlspec_sink").count() === 0L)
    assert(spark.table("ddlspec_sink").schema.map(_.name) === Seq("k", "n"))
    env.executeSql(
      s"""CREATE VIEW ddlspec_v AS SELECT n_name, n_nationkey FROM nation WHERE n_regionkey = 0""")
    // positional alignment: n_nationkey (BIGINT) lands in n, n_name in k
    env.executeSql("INSERT INTO ddlspec_sink SELECT n_name, n_nationkey FROM ddlspec_v")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_sink").head().getLong(0) === 5L)
    // INTO appends, OVERWRITE replaces
    env.executeSql("INSERT INTO ddlspec_sink SELECT n_name, n_nationkey FROM ddlspec_v")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_sink").head().getLong(0) === 10L)
    env.executeSql("INSERT OVERWRITE ddlspec_sink SELECT n_name, n_nationkey FROM ddlspec_v")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_sink").head().getLong(0) === 5L)
    // StatementSet: N inserts through one execute()
    val out2 = java.nio.file.Files.createTempDirectory("ddlspec-sink2").toString
    env.executeSql(
      s"""CREATE TABLE ddlspec_sink2 (k STRING, n BIGINT)
         |WITH ('connector'='filesystem', 'path'='$out2', 'format'='parquet')""".stripMargin)
    env.createStatementSet()
      .addInsertSql("INSERT INTO ddlspec_sink2 SELECT n_name, n_nationkey FROM ddlspec_v")
      .addInsertSql("INSERT INTO ddlspec_sink2 SELECT r_name, r_regionkey FROM region")
      .execute()
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_sink2").head().getLong(0) === 10L)
  }

  test("executeSql DDL: csv and json formats round-trip; EXPLAIN statement returns the plan") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val outCsv = java.nio.file.Files.createTempDirectory("ddlspec-csv").toString
    val outJson = java.nio.file.Files.createTempDirectory("ddlspec-json").toString
    env.executeSql(
      s"""CREATE TABLE ddlspec_csv (k STRING, n BIGINT)
         |WITH ('connector'='filesystem', 'path'='$outCsv', 'format'='csv')""".stripMargin)
    env.executeSql(
      s"""CREATE TABLE ddlspec_json (k STRING, n BIGINT)
         |WITH ('connector'='filesystem', 'path'='$outJson', 'format'='json')""".stripMargin)
    env.executeSql(
      "INSERT INTO ddlspec_csv SELECT n_name, n_nationkey FROM nation WHERE n_regionkey = 1")
    env.executeSql(
      "INSERT INTO ddlspec_json SELECT n_name, n_nationkey FROM nation WHERE n_regionkey = 1")
    val viaCsv = env.executeSql("SELECT k, n FROM ddlspec_csv ORDER BY k")
    val viaJson = env.executeSql("SELECT k, n FROM ddlspec_json ORDER BY k")
    assert(viaCsv.collect().toSeq === viaJson.collect().toSeq)
    assert(viaCsv.count() === 5L)
    assert(viaCsv.schema.map(_.dataType.typeName) === Seq("string", "long"))
    val plan = env.executeSql("EXPLAIN SELECT count(*) FROM nation").head().getString(0)
    assert(plan.contains("Physical Plan"))
  }

  test("executeSql DDL: out-of-subset shapes fail loudly, never silently ignore") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    // unknown WITH option
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE bad1 (a BIGINT) WITH ('path'='/tmp/x', 'bucket'='s3://nope')"))
    assert(e1.getMessage.contains("unsupported WITH options"))
    // non-filesystem connector
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE bad2 (a BIGINT) WITH ('connector'='kafka', 'path'='/tmp/x')"))
    assert(e2.getMessage.contains("filesystem"))
    // missing path
    val e3 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE bad3 (a BIGINT) WITH ('connector'='filesystem')"))
    assert(e3.getMessage.contains("'path'"))
    // malformed watermark bound
    val e4 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE bad4 (a BIGINT, ts TIMESTAMP(3), WATERMARK FOR ts AS ts - INTERVAL '1' FORTNIGHT) WITH ('path'='/tmp/x')"))
    assert(e4.getMessage.contains("WATERMARK"))
    // watermark over a different column than it subtracts from
    val e5 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE bad5 (a BIGINT, ts TIMESTAMP(3), t2 TIMESTAMP(3), WATERMARK FOR ts AS t2 - INTERVAL '1' MINUTE) WITH ('path'='/tmp/x')"))
    assert(e5.getMessage.contains("same column"))
    // unsupported column type
    val e6 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE bad6 (a MULTISET<STRING>) WITH ('path'='/tmp/x')"))
    assert(e6.getMessage.contains("unsupported column type"))
    // INSERT into an undeclared table
    val e7 = intercept[IllegalArgumentException](env.executeSql(
      "INSERT INTO never_declared SELECT 1"))
    assert(e7.getMessage.contains("not a DDL-declared table"))
    // StatementSet rejects non-INSERT statements
    val e8 = intercept[IllegalArgumentException](
      env.createStatementSet().addInsertSql("SELECT 1 AS one"))
    assert(e8.getMessage.contains("not an INSERT"))
  }

  test("executeSql DDL: computed columns project in declared order, PROCTIME lowers, misuse fails loudly") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    env.executeSql(
      s"""CREATE TABLE ddlspec_comp (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT,
         |  n_comment STRING,
         |  keyx2 AS n_nationkey * 2,
         |  keyx4 AS keyx2 * 2,
         |  p AS PROCTIME())
         |WITH ('connector'='filesystem', 'path'='$dir/nation.parquet', 'format'='parquet')""".stripMargin)
    val view = spark.table("ddlspec_comp")
    // declared order: physical first here, then the three computed
    assert(view.schema.map(_.name) ===
      Seq("n_nationkey", "n_name", "n_regionkey", "n_comment", "keyx2", "keyx4", "p"))
    // chained computed-from-computed evaluates through the projection
    val r = env.executeSql(
      "SELECT n_nationkey, keyx2, keyx4 FROM ddlspec_comp WHERE n_nationkey = 3").head()
    assert(r.getLong(1) === 6L && r.getLong(2) === 12L)
    // PROCTIME() is a usable timestamp attribute
    assert(view.schema("p").dataType.typeName === "timestamp")
    assert(env.executeSql(
      "SELECT count(*) AS c FROM ddlspec_comp WHERE p IS NOT NULL").head().getLong(0) === 25L)
    // subquery in a computed column: rejected at parse time
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      s"CREATE TABLE badc1 (a BIGINT, b AS (SELECT max(a) FROM t)) WITH ('path'='/tmp/x')"))
    assert(e1.getMessage.contains("subqueries"))
    // unknown column in a computed expression: Catalyst fails loudly at registration
    intercept[Exception](env.executeSql(
      s"CREATE TABLE badc2 (a BIGINT, b AS nope + 1) WITH ('path'='$dir/nation.parquet')"))
    // forward reference to a later computed column: loud
    intercept[Exception](env.executeSql(
      s"CREATE TABLE badc3 (n_nationkey BIGINT, b AS c + 1, c AS n_nationkey * 2) " +
        s"WITH ('path'='$dir/nation.parquet')"))
    // a table of ONLY computed columns has nothing to read
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE badc4 (b AS 1 + 1) WITH ('path'='/tmp/x')"))
    assert(e2.getMessage.contains("no physical columns"))
  }

  test("executeSql DDL: WATERMARK on a COMPUTED rowtime column (the reference's canonical shape)") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    val wmDir = java.nio.file.Files.createTempDirectory("ddlspec-cwm").toString
    // nearly every reference DDL example declares a computed rowtime
    // and hangs the watermark off it — the projection must run BEFORE
    // the watermark so the bound sits on the derived column
    env.executeSql(
      s"""CREATE TABLE ddlspec_cwm (id BIGINT, raw_ts TIMESTAMP(3), v DOUBLE,
         |  rt AS raw_ts - INTERVAL 1 SECOND,
         |  WATERMARK FOR rt AS rt - INTERVAL '3' MINUTE)
         |WITH ('connector'='filesystem', 'path'='$wmDir', 'format'='parquet')""".stripMargin)
    val view = spark.table("ddlspec_cwm")
    assert(view.isStreaming)
    assert(view.schema.map(_.name) === Seq("id", "raw_ts", "v", "rt"))
    val wm = view.groupBy(window(col("rt"), "1 hour")).count()
      .queryExecution.analyzed.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => w
      }
    assert(wm.nonEmpty && wm.head.delay.toString.contains("3 minutes"))
  }

  test("executeSql DDL: PARTITIONED BY lays out partition dirs and the read-back prunes") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("ddlspec-part").toString
    env.executeSql(
      s"""CREATE TABLE ddlspec_psink (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
         |PARTITIONED BY (n_regionkey)
         |WITH ('connector'='filesystem', 'path'='$out', 'format'='parquet')""".stripMargin)
    env.executeSql(
      "INSERT OVERWRITE ddlspec_psink SELECT n_nationkey, n_name, n_regionkey FROM nation")
    // files land under partition directories
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === (0 to 4).map(r => s"n_regionkey=$r"))
    // read-back sees all rows with the declared schema
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_psink").head().getLong(0) === 25L)
    // PLAN LOCK: a partition-column filter must prune at the scan —
    // PartitionFilters carries the predicate, and the data filter list
    // does NOT re-apply it as a row-level filter over file contents
    val plan = spark.table("ddlspec_psink")
      .filter(org.apache.spark.sql.functions.col("n_regionkey") === 2)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse(
      fail(s"no PartitionFilters in the scan:\n$plan"))
    assert(scanLine.contains("n_regionkey"),
      s"partition filter not pushed to the partition layer:\n$plan")
    assert(env.executeSql(
      "SELECT count(*) AS c FROM ddlspec_psink WHERE n_regionkey = 2").head().getLong(0) === 5L)
    // partition column must be a declared physical column
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE badp1 (a BIGINT) PARTITIONED BY (b) WITH ('path'='/tmp/x')"))
    assert(e1.getMessage.contains("PARTITIONED BY b"))
    // computed columns cannot partition the layout
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE badp2 (a BIGINT, c AS a * 2) PARTITIONED BY (c) WITH ('path'='/tmp/x')"))
    assert(e2.getMessage.contains("computed columns cannot partition"))
  }

  test("executeSql: DROP TABLE/VIEW unregister, IF EXISTS swallows only not-found") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    env.executeSql(
      s"""CREATE TABLE ddlspec_drop (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT,
         |  n_comment STRING)
         |WITH ('connector'='filesystem', 'path'='$dir/nation.parquet', 'format'='parquet')""".stripMargin)
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_drop").head().getLong(0) === 25L)
    assert(env.executeSql("DROP TABLE ddlspec_drop").head().getString(2) === "OK")
    // the view is gone AND the DDL catalog entry is gone (INSERT refuses)
    intercept[Exception](env.executeSql("SELECT count(*) FROM ddlspec_drop"))
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "INSERT INTO ddlspec_drop SELECT n_name, n_nationkey FROM nation"))
    assert(e1.getMessage.contains("not a DDL-declared table"))
    // IF EXISTS: not-found is OK; without it, loud
    assert(env.executeSql("DROP TABLE IF EXISTS ddlspec_drop").head().getString(2) === "OK")
    val e2 = intercept[IllegalArgumentException](env.executeSql("DROP TABLE ddlspec_drop"))
    assert(e2.getMessage.contains("no such table"))
    // DROP VIEW over a CREATE VIEW registration
    env.executeSql("CREATE VIEW ddlspec_dropv AS SELECT n_name FROM nation")
    assert(env.executeSql("DROP VIEW ddlspec_dropv").head().getString(2) === "OK")
    intercept[Exception](env.executeSql("SELECT * FROM ddlspec_dropv"))
    // other DROP shapes fail loudly (never silently ignored)
    val e3 = intercept[IllegalArgumentException](env.executeSql("DROP TABLE a.b.c"))
    assert(e3.getMessage.contains("unsupported DROP shape"))
  }

  test("executeSql: DROP kind must match the catalog entry (ref SqlDropTable/SqlDropView)") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    env.executeSql(
      s"""CREATE TABLE ddlspec_kindt (n_nationkey BIGINT, n_name STRING)
         |WITH ('connector'='filesystem', 'path'='$dir/nation.parquet', 'format'='parquet')""".stripMargin)
    // DROP VIEW on a DDL-declared TABLE: rejected, entry stays usable
    val e1 = intercept[IllegalArgumentException](env.executeSql("DROP VIEW ddlspec_kindt"))
    assert(e1.getMessage.contains("is a table"))
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_kindt").head().getLong(0) === 25L)
    assert(env.executeSql("DROP TABLE ddlspec_kindt").head().getString(2) === "OK")
    // DROP TABLE on a plain view: rejected, view stays usable
    env.executeSql("CREATE VIEW ddlspec_kindv AS SELECT n_name FROM nation")
    val e2 = intercept[IllegalArgumentException](env.executeSql("DROP TABLE ddlspec_kindv"))
    assert(e2.getMessage.contains("is a view"))
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_kindv").head().getLong(0) === 25L)
    assert(env.executeSql("DROP VIEW ddlspec_kindv").head().getString(2) === "OK")
  }

  test("executeSql: SHOW DATABASES / SHOW FUNCTIONS / USE statement routes") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    // ref TableEnvironmentImpl.listDatabases: the single default database
    val dbs = env.executeSql("SHOW DATABASES").collect().map(_.getString(0)).toSeq
    assert(dbs === Seq("default_database"))
    // ref listFunctions: built-ins, the graft library, and CREATE
    // FUNCTION aliases share the registry the listing dumps
    env.executeSql("CREATE FUNCTION ddlspec_showfn AS 'upper'")
    val fns = env.executeSql("SHOW FUNCTIONS").collect().map(_.getString(0)).toSet
    assert(fns.contains("ddlspec_showfn"), "CREATE FUNCTION alias missing from SHOW FUNCTIONS")
    assert(fns.contains("upper"), "built-in missing from SHOW FUNCTIONS")
    assert(fns.contains("cosine_sim"), "graft library function missing from SHOW FUNCTIONS")
    // ref SqlUseDatabase/SqlUseCatalog: valid names re-select, unknown is LOUD
    assert(env.executeSql("USE default_database").head().getString(2) === "OK")
    assert(env.executeSql("USE CATALOG default_catalog").head().getString(2) === "OK")
    val e1 = intercept[IllegalArgumentException](env.executeSql("USE nope"))
    assert(e1.getMessage.contains("no database named nope"))
    val e2 = intercept[IllegalArgumentException](env.executeSql("USE CATALOG nope"))
    assert(e2.getMessage.contains("no catalog named nope"))
    // ref SqlUseDatabase.fullDatabaseName(): the database identifier
    // may be compound — catalog part validates against default_catalog
    assert(env.executeSql("USE default_catalog.default_database").head().getString(2) === "OK")
    val e3 = intercept[IllegalArgumentException](env.executeSql("USE a.b"))
    assert(e3.getMessage.contains("no catalog named a"))
    // USE CATALOG takes a SIMPLE name (ref SqlUseCatalog)
    val e4 = intercept[IllegalArgumentException](env.executeSql("USE CATALOG a.b"))
    assert(e4.getMessage.contains("simple name"))
  }

  test("executeSql: DROP TABLE accepts env-registered base and versioned tables (r12 ADVICE)") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    // base warehouse tables are catalog TABLES in the reference
    // (SqlDropTable accepts them) — the kind test must not call them views
    val e1 = intercept[IllegalArgumentException](env.executeSql("DROP VIEW events"))
    assert(e1.getMessage.contains("is a table"))
    assert(env.executeSql("DROP TABLE events").head().getString(2) === "OK")
    intercept[Exception](env.executeSql("SELECT count(*) FROM events"))
    // versioned views register table-like: DROP TABLE, not DROP VIEW
    env.createVersionedView("ddlspec_vv",
      env.sqlQuery("SELECT n_nationkey, n_name, DATE '2020-01-01' AS vt FROM nation"), "vt")
    val e2 = intercept[IllegalArgumentException](env.executeSql("DROP VIEW ddlspec_vv"))
    assert(e2.getMessage.contains("is a table"))
    assert(env.executeSql("DROP TABLE ddlspec_vv").head().getString(2) === "OK")
    // a CREATE VIEW registration still classifies as a VIEW
    env.executeSql("CREATE VIEW ddlspec_vv2 AS SELECT n_name FROM nation")
    val e3 = intercept[IllegalArgumentException](env.executeSql("DROP TABLE ddlspec_vv2"))
    assert(e3.getMessage.contains("is a view"))
    assert(env.executeSql("DROP VIEW ddlspec_vv2").head().getString(2) === "OK")
  }

  test("executeSql: SHOW CATALOGS / DESCRIBE CATALOG / DESCRIBE DATABASE routes") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    // ref dql/SqlShowCatalogs.java: the one default catalog
    assert(env.executeSql("SHOW CATALOGS").collect().map(_.getString(0)).toSeq
      === Seq("default_catalog"))
    // ref dql/SqlDescribeCatalog.java: info rows; unknown is LOUD
    val dc = env.executeSql("DESCRIBE CATALOG default_catalog").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(dc("catalog name") === "default_catalog")
    assert(dc("default database") === "default_database")
    val e1 = intercept[IllegalArgumentException](env.executeSql("DESCRIBE CATALOG nope"))
    assert(e1.getMessage.contains("no catalog named nope"))
    // ref dql/SqlDescribeDatabase.java: plain + EXTENDED + compound name
    val dd = env.executeSql("DESCRIBE DATABASE default_database").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(dd("database name") === "default_database")
    env.executeSql("ALTER DATABASE default_database SET ('owner'='graft')")
    val de = env.executeSql(
      "DESCRIBE DATABASE EXTENDED default_catalog.default_database").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(de("property owner") === "graft")
    val e2 = intercept[IllegalArgumentException](env.executeSql("DESCRIBE DATABASE nope"))
    assert(e2.getMessage.contains("no database named nope"))
    val e3 = intercept[IllegalArgumentException](
      env.executeSql("DESCRIBE DATABASE bad_cat.default_database"))
    assert(e3.getMessage.contains("no catalog named bad_cat"))
  }

  test("executeSql: CREATE/DROP/ALTER DATABASE with loud single-database semantics") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    // re-creating the one database: loud unless IF NOT EXISTS (ref
    // DatabaseAlreadyExistException)
    assert(env.executeSql("CREATE DATABASE IF NOT EXISTS default_database")
      .head().getString(2) === "OK")
    val e1 = intercept[IllegalArgumentException](
      env.executeSql("CREATE DATABASE default_database"))
    assert(e1.getMessage.contains("already exists"))
    // new databases are not supported — LOUD, never silently ignored
    val e2 = intercept[IllegalArgumentException](env.executeSql("CREATE DATABASE fresh"))
    assert(e2.getMessage.contains("single-database"))
    // dropping the current database is refused; missing names need IF EXISTS
    val e3 = intercept[IllegalArgumentException](
      env.executeSql("DROP DATABASE default_database"))
    assert(e3.getMessage.contains("cannot drop the current database"))
    val e4 = intercept[IllegalArgumentException](env.executeSql("DROP DATABASE nope"))
    assert(e4.getMessage.contains("no such database"))
    assert(env.executeSql("DROP DATABASE IF EXISTS nope RESTRICT").head().getString(2) === "OK")
    // ALTER DATABASE SET: only the existing database; bad shape is loud
    assert(env.executeSql("ALTER DATABASE default_database SET ('k1'='v1')")
      .head().getString(2) === "OK")
    val e5 = intercept[IllegalArgumentException](
      env.executeSql("ALTER DATABASE nope SET ('k'='v')"))
    assert(e5.getMessage.contains("no database named nope"))
    val e6 = intercept[IllegalArgumentException](
      env.executeSql("ALTER DATABASE default_database RENAME TO x"))
    assert(e6.getMessage.contains("unsupported ALTER DATABASE shape"))
  }

  test("executeSql: DROP FUNCTION unregisters CREATE FUNCTION aliases only") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    env.executeSql("CREATE FUNCTION ddlspec_dropfn AS 'upper'")
    assert(env.sqlQuery("SELECT ddlspec_dropfn('ok') AS u").head().getString(0) === "OK")
    assert(env.executeSql("DROP FUNCTION ddlspec_dropfn").head().getString(2) === "OK")
    intercept[Exception](env.sqlQuery("SELECT ddlspec_dropfn('ok') AS u").collect())
    // gone from SHOW FUNCTIONS too
    assert(!env.executeSql("SHOW FUNCTIONS").collect().map(_.getString(0))
      .contains("ddlspec_dropfn"))
    // not-found: loud without IF EXISTS, swallowed with it (ref SqlDropFunction)
    val e1 = intercept[IllegalArgumentException](env.executeSql("DROP FUNCTION ddlspec_dropfn"))
    assert(e1.getMessage.contains("no such function"))
    assert(env.executeSql("DROP TEMPORARY FUNCTION IF EXISTS ddlspec_dropfn")
      .head().getString(2) === "OK")
    // built-in / library tier is not droppable
    val e2 = intercept[IllegalArgumentException](env.executeSql("DROP FUNCTION upper"))
    assert(e2.getMessage.contains("cannot be dropped"))
    val e3 = intercept[IllegalArgumentException](env.executeSql("DROP FUNCTION cosine_sim"))
    assert(e3.getMessage.contains("cannot be dropped"))
  }

  test("executeSql: ALTER TABLE SET mutates the WITH options in place (ref SqlAlterTableProperties)") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("ddlspec-altset").toString
    env.executeSql(
      s"CREATE TABLE ddlspec_set (k STRING, n BIGINT) WITH ('path'='$out/a', 'format'='parquet')")
    env.executeSql("INSERT INTO ddlspec_set SELECT n_name, n_nationkey FROM nation")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_set").head().getLong(0) === 25L)
    // repoint the path: the view re-registers against the new location
    // (empty until written), the old files stay where they were
    assert(env.executeSql(s"ALTER TABLE ddlspec_set SET ('path'='$out/b', 'format'='json')")
      .head().getString(2) === "OK")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_set").head().getLong(0) === 0L)
    env.executeSql("INSERT INTO ddlspec_set SELECT n_name, n_nationkey FROM nation WHERE n_nationkey < 5")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_set").head().getLong(0) === 5L)
    assert(new java.io.File(s"$out/b").listFiles().exists(_.getName.endsWith(".json")))
    // misuse: unknown table, unknown option, bad connector/format
    val e1 = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE nope SET ('path'='/tmp/x')"))
    assert(e1.getMessage.contains("not a DDL-declared table"))
    val e2 = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE ddlspec_set SET ('zebra'='1')"))
    assert(e2.getMessage.contains("unsupported options zebra"))
    val e3 = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE ddlspec_set SET ('connector'='kafka')"))
    assert(e3.getMessage.contains("filesystem"))
    val e4 = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE ddlspec_set SET ('format'='orc')"))
    assert(e4.getMessage.contains("unsupported format orc"))
  }

  test("executeSql: ALTER TABLE RENAME moves the catalog entry; other ALTER shapes fail loudly") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    env.executeSql(
      s"""CREATE TABLE ddlspec_ren_a (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT,
         |  n_comment STRING)
         |WITH ('connector'='filesystem', 'path'='$dir/nation.parquet', 'format'='parquet')""".stripMargin)
    env.executeSql("ALTER TABLE ddlspec_ren_a RENAME TO ddlspec_ren_b")
    // old name gone, new name queryable AND still a DDL table (INSERT resolves)
    intercept[Exception](env.executeSql("SELECT count(*) FROM ddlspec_ren_a"))
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_ren_b").head().getLong(0) === 25L)
    val out = java.nio.file.Files.createTempDirectory("ddlspec-ren-sink").toString
    env.executeSql(
      s"CREATE TABLE ddlspec_ren_sink (k STRING, n BIGINT) WITH ('path'='$out')")
    env.executeSql("ALTER TABLE ddlspec_ren_sink RENAME TO ddlspec_ren_sink2")
    env.executeSql("INSERT INTO ddlspec_ren_sink2 SELECT n_name, n_nationkey FROM ddlspec_ren_b")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_ren_sink2").head().getLong(0) === 25L)
    // misuse: unknown source, occupied target, unsupported ALTER verb
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "ALTER TABLE nope RENAME TO x"))
    assert(e1.getMessage.contains("not a DDL-declared table"))
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      "ALTER TABLE ddlspec_ren_b RENAME TO nation"))
    assert(e2.getMessage.contains("already exists"))
    val e3 = intercept[IllegalArgumentException](env.executeSql(
      "ALTER TABLE ddlspec_ren_b ADD COLUMN x BIGINT"))
    assert(e3.getMessage.contains("unsupported ALTER TABLE shape"))
  }

  test("executeSql: CREATE FUNCTION binds an alias to a registered function; unknown fails loudly") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    // alias a graft library function and call it through SQL
    env.executeSql("CREATE TEMPORARY FUNCTION jw2 AS 'jaro_winkler'")
    val viaAlias = env.sqlQuery("SELECT jw2(n_name, 'CANADA') AS s FROM nation ORDER BY s DESC LIMIT 1")
    val direct = env.sqlQuery("SELECT jaro_winkler(n_name, 'CANADA') AS s FROM nation ORDER BY s DESC LIMIT 1")
    assert(viaAlias.head().getDouble(0) === direct.head().getDouble(0))
    // alias a Spark built-in
    env.executeSql("CREATE FUNCTION my_upper AS 'upper'")
    assert(env.sqlQuery("SELECT my_upper('ok') AS u").head().getString(0) === "OK")
    // unknown target fails loudly
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE FUNCTION f AS 'no_such_function_anywhere'"))
    assert(e1.getMessage.contains("unknown function"))
    // class-path shapes are out of scope and the message says what IS supported
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE FUNCTION f AS com.example.MyFunction"))
    assert(e2.getMessage.contains("unsupported CREATE FUNCTION shape"))
  }

  test("executeSql: SHOW TABLES lists the environment's tables; DESCRIBE surfaces DDL annotations") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    env.executeSql(
      s"""CREATE TABLE ddlspec_show (id BIGINT, ts TIMESTAMP(3),
         |  v2 AS id * 2,
         |  WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE)
         |WITH ('connector'='filesystem', 'path'='${java.nio.file.Files.createTempDirectory("ddlspec-show")}',
         |  'format'='parquet')""".stripMargin)
    val names = env.executeSql("SHOW TABLES").collect().map(_.getString(0)).toSet
    assert(names.contains("ddlspec_show") && names.contains("nation"))
    // DESCRIBE on the DDL table: declared order, computed expr, watermark bound
    val desc = env.executeSql("DESCRIBE ddlspec_show").collect()
    assert(desc.map(_.getString(0)).toSeq === Seq("id", "ts", "v2"))
    val tsRow = desc.find(_.getString(0) == "ts").get
    assert(tsRow.getString(3).contains("5 minutes"))
    val v2Row = desc.find(_.getString(0) == "v2").get
    assert(v2Row.getString(2) === "AS id * 2")
    // DESCRIBE on a plain registered view: Catalyst schema, empty extras
    val descN = env.executeSql("DESC nation").collect()
    assert(descN.map(_.getString(0)).toSeq ===
      Seq("n_nationkey", "n_name", "n_regionkey"))
    // unknown relation fails loudly
    val e = intercept[IllegalArgumentException](env.executeSql("DESCRIBE nope"))
    assert(e.getMessage.contains("no such table"))
  }

  test("executeSql DML: column-list INSERT aligns named columns and null-fills the rest") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("ddlspec-collist").toString
    env.executeSql(
      s"""CREATE TABLE ddlspec_cl (k STRING, n BIGINT, extra DOUBLE)
         |WITH ('connector'='filesystem', 'path'='$out', 'format'='parquet')""".stripMargin)
    env.executeSql(
      "INSERT INTO ddlspec_cl (n, k) SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2")
    val rows = env.executeSql(
      "SELECT k, n, extra FROM ddlspec_cl ORDER BY n").collect()
    assert(rows.length === 5)
    assert(rows.forall(r => r.isNullAt(2))) // unnamed column null-fills
    assert(rows.forall(r => r.getString(0).nonEmpty && !r.isNullAt(1)))
    // misuse: unknown column, arity mismatch, duplicate in the list
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "INSERT INTO ddlspec_cl (nope) SELECT n_name FROM nation"))
    assert(e1.getMessage.contains("not a declared physical column"))
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      "INSERT INTO ddlspec_cl (k, n) SELECT n_name FROM nation"))
    assert(e2.getMessage.contains("insert list names"))
    val e3 = intercept[IllegalArgumentException](env.executeSql(
      "INSERT INTO ddlspec_cl (k, k) SELECT n_name, n_name FROM nation"))
    assert(e3.getMessage.contains("duplicate columns"))
  }

  test("executeSql DDL: CREATE TABLE LIKE inherits schema and overrides options") {
    val dir = "/root/testdata/sf0.001"
    val env = TableEnv(spark, dir)
    env.executeSql(
      s"""CREATE TABLE ddlspec_like_src (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT,
         |  keyx2 AS n_nationkey * 2)
         |WITH ('connector'='filesystem', 'path'='$dir/nation.parquet', 'format'='parquet')""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("ddlspec-like").toString
    env.executeSql(s"CREATE TABLE ddlspec_like_sink WITH ('path'='$out') LIKE ddlspec_like_src")
    // inherited: physical + computed columns in declared order
    assert(spark.table("ddlspec_like_sink").schema.map(_.name) ===
      Seq("n_nationkey", "n_name", "n_regionkey", "keyx2"))
    // new path: the sink starts empty, insert lands there, source untouched
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_like_sink").head().getLong(0) === 0L)
    env.executeSql(
      "INSERT INTO ddlspec_like_sink SELECT n_nationkey, n_name, n_regionkey FROM ddlspec_like_src WHERE n_regionkey = 0")
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_like_sink").head().getLong(0) === 5L)
    assert(env.executeSql("SELECT count(*) AS c FROM ddlspec_like_src").head().getLong(0) === 25L)
    // the computed column re-derives over the sink's own rows
    assert(env.executeSql(
      "SELECT max(keyx2) AS m FROM ddlspec_like_sink").head().getLong(0) ===
      env.executeSql(
        "SELECT max(n_nationkey) * 2 AS m FROM ddlspec_like_sink").head().getLong(0))
    // misuse: unknown source, unsupported option
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE x WITH ('path'='/tmp/x') LIKE never_there"))
    assert(e1.getMessage.contains("not a DDL-declared table"))
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      s"CREATE TABLE x WITH ('bucket'='nope') LIKE ddlspec_like_src"))
    assert(e2.getMessage.contains("unsupported WITH options"))
  }

  test("rank-pattern SQL route: batch passthrough equals Catalyst; misuse fails loudly") {
    val env = TableEnv(spark, "/root/testdata/sf0.001")
    val stmt =
      """SELECT event_type, event_id, round(value, 4) AS v, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY value DESC, event_id ASC) AS rn
        |      FROM events) WHERE rn <= 3""".stripMargin
    assert(RankSql.applies(stmt))
    // batch table: the route must hand the statement to Catalyst verbatim
    val viaRoute = env.sqlQuery(stmt)
    val direct = spark.sql(stmt)
    assert(viaRoute.exceptAll(direct).isEmpty && direct.exceptAll(viaRoute).isEmpty)
    // on a batch table any predicate Catalyst accepts passes through —
    // the "= requires 1" guard protects only the streaming lowering
    assert(env.sqlQuery(stmt.replace("WHERE rn <= 3", "WHERE rn = 3")).count() ===
      spark.sql(stmt.replace("WHERE rn <= 3", "WHERE rn = 3")).count())
    assert(!RankSql.applies("SELECT 1 AS one"))
    // RANK()/DENSE_RANK() are not ROW_NUMBER — the route must not claim them
    assert(!RankSql.applies(stmt.replace("ROW_NUMBER()", "RANK()")))
  }
}
