package graft.queries

import graft.Tables
import graft.cep.{AfterMatch, CEP, MatchRecognize, Pattern}
import graft.streaming.{Event, StreamingOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** REAL Structured Streaming executions inside driver-verifiable query
  * entries: each builds a file-source stream over events.parquet, runs
  * with Trigger.AvailableNow into a memory sink, and returns the sink
  * table. Watermark-gated emission makes the results deterministic, so
  * they get DuckDB oracles with the watermark filter spelled out
  * (final watermark = max event time − delay; Spark's no-data final
  * micro-batch flushes state once the watermark advances).
  */
object StreamingQueries {

  private def eventsSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of events normalized to µs TimestampType. The
    * file source requires a DIRECTORY; the testdata dir mixes all
    * tables, so we expose events.parquet alone through a symlink under
    * /tmp. The physical ts encoding varies with the generator's pandas
    * version — TIMESTAMP(NANOS) (read as long via nanosAsLong, ÷1000)
    * or TIMESTAMP(MICROS) (read as NTZ, reinterpreted as a UTC
    * instant) — so the stream schema is probed from the footer like
    * [[Tables.events]].
    */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val streamDir = Paths.get("/tmp/graft-stream-src",
      dir.replaceAll("[^A-Za-z0-9.]", "_"), "events")
    Files.createDirectories(streamDir)
    val link = streamDir.resolve("events.parquet")
    if (!Files.exists(link))
      Files.createSymbolicLink(link, Paths.get(s"$dir/events.parquet"))
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet").schema("ts").dataType match {
      case LongType =>
        s.readStream
          .schema(eventsSchema(LongType))
          .parquet(streamDir.toString)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case ntz =>
        s.readStream
          .schema(eventsSchema(ntz))
          .parquet(streamDir.toString)
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Fresh per-(sfDir, name) output directory under /tmp — cleaned before
    * each run so reruns are deterministic.
    */
  private def freshDir(dir: String, name: String): String = {
    import java.nio.file.{Files, Paths}
    import java.util.Comparator
    val p = Paths.get("/tmp/graft-stream-out",
      dir.replaceAll("[^A-Za-z0-9.]", "_"), name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    Files.createDirectories(p.getParent)
    p.toString
  }

  /** Stage each `parts(i)` as one single-file micro-batch source under a
    * fresh directory — explicit names AND strictly increasing mtimes so
    * the file source replays b0 < b1 < … regardless of its (mtime, path)
    * tie rules. This is the replay fixture every multi-batch maintainer
    * query drives `readStream.option("maxFilesPerTrigger", 1)` from; the
    * whole staging runs inside [[graft.BenchMeters.fixture]] so the
    * bench stamps fixture time separately from measured maintenance.
    */
  private def stageBatchFiles(dir: String, name: String, parts: Seq[DataFrame]): String =
    graft.BenchMeters.fixture {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      import java.nio.file.attribute.FileTime
      val srcDir = freshDir(dir, s"${name}_src")
      Files.createDirectories(Paths.get(srcDir))
      // Stage the per-batch files CONCURRENTLY (guide §2.6 — overlap
      // independent jobs): each part is an independent single-file
      // write to its own tmp dir, so submitting them from a small
      // thread pool lets the next write's tasks back-fill the tail of
      // the previous one instead of serializing three mostly-idle
      // jobs. Move + mtime stamping stay per-future (each touches only
      // its own b<i>.parquet); the staged REPLAY ORDER is carried by
      // the deterministic mtimes, not by staging completion order.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val staged = parts.zipWithIndex.map { case (df, b) =>
        Future {
          val tmp = freshDir(dir, s"${name}_tmp$b")
          df.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = Files.list(Paths.get(tmp))
            .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
          val dst = Paths.get(srcDir, s"b$b.parquet")
          Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + b * 60000L))
        }
      }
      staged.foreach(f => Await.result(f, Duration.Inf))
      srcDir
    }

  /** Run independent per-batch store actions CONCURRENTLY (guide §2.6;
    * r14 opt): a foreachBatch body that appends a result AND merges a
    * store pays two sequential jobs whose tails leave the executor idle —
    * submitting them from futures lets the second job's tasks back-fill
    * the first's stragglers, so the batch's wall tracks the slower job,
    * not the sum. ONLY for actions with no mutual dependence (different
    * output paths/stores; shared INPUT frames are safe — concurrent first
    * consumers of a lazy checkpoint compute each block once under the
    * block manager's lock). Failures propagate (Await rethrows).
    */
  private def inParallel(tasks: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    tasks.map(t => Future(t())).foreach(f => Await.result(f, Duration.Inf))
  }

  /** The last batch id a [[stageBatchFiles]] directory will replay —
    * derived from the ACTUAL staged file count, never hard-coded: with
    * `maxFilesPerTrigger=1` under AvailableNow the file source assigns
    * batch ids 0..nFiles-1, and a literal `2L` silently skips the
    * end-of-stream flush (and reads a missing store version) the moment
    * a split changes shape (r7 advice).
    */
  private def lastBatchId(srcDir: String): Long = {
    import java.nio.file.{Files, Paths}
    Files.list(Paths.get(srcDir))
      .filter(p => p.toString.endsWith(".parquet")).count() - 1
  }

  /** Split `df` into `n` COMPLETE, time-ordered batches by date
    * boundaries derived from the actual min/max of `dcol` — a total
    * order over the data's real time range, replacing the old
    * hard-coded `dayofmonth between (10b+1, 10b+10)` windows that
    * silently dropped a day-31 row and assumed single-month data
    * (r7 advice). Every row lands in exactly one batch; all of batch
    * i's dates strictly precede batch i+1's, which is the
    * time-ordered-arrival contract the per-user continuity state
    * downstream depends on. The last batch is open-ended so ceil
    * rounding can never orphan the tail. On the driver's Jan-1..30
    * fixture the boundaries reduce to the original 1-10/11-20/21-30
    * split, so the shared batch oracles are unchanged.
    */
  private def daySplits(df: DataFrame, dcol: org.apache.spark.sql.Column, n: Int): Seq[DataFrame] =
    graft.BenchMeters.fixture {
      val d = dcol.cast("date")
      val row = df.agg(min(d).as("d0"), max(d).as("d1")).head()
      if (row.isNullAt(0)) Seq.fill(n)(df) // empty frame: n empty batches
      else {
        val (d0, d1) = (row.getDate(0), row.getDate(1))
        val span = java.time.temporal.ChronoUnit.DAYS
          .between(d0.toLocalDate, d1.toLocalDate) + 1
        val width = math.max(1L, (span + n - 1) / n)
        (0 until n).map { b =>
          val lo = b * width
          if (b == n - 1) df.filter(datediff(d, lit(d0)) >= lo)
          else df.filter(datediff(d, lit(d0)).between(lo, lo + width - 1))
        }
      }
    }

  private def runToTable(name: String, out: DataFrame, mode: String): DataFrame = {
    val spark = out.sparkSession
    // Stateful operators pay a per-partition state-store commit each
    // micro-batch; 32 shuffle partitions is pure overhead at local test
    // scale (4 beat 8 by ~15-20% on the stream-stream joins at sf0.1).
    // Scope the smaller setting to the streaming run — on a cluster this
    // maps to sizing state partitions to executor count.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val qname = s"mem_$name"
      val q = out.writeStream
        .format("memory")
        .queryName(qname)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(qname)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Streaming tumbling-window aggregate with a 10-minute watermark,
    * append mode (ref: StreamExecGroupWindowAggregate.scala:33 +
    * WatermarkAssigner). Emitted ⇔ window end <= final watermark.
    */
  def streamTumble(s: SparkSession, dir: String): DataFrame = {
    // declared-watermark flow: the view carries the bound (TableEnv
    // watermark-DDL analog), the query itself is plain SQL over it —
    // the reference's per-table WatermarkSpec posture
    val env = graft.TableEnv(s, dir)
    env.createStreamingView("events_wm", eventStream(s, dir), "ts", "10 minutes")
    val out = env.sqlQuery(
      """SELECT window.start AS wstart, event_type,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM events_wm
        |GROUP BY window(ts, '1 hour'), event_type""".stripMargin)
    runToTable("stream_tumble", out, "append").orderBy("wstart", "event_type")
  }

  val streamTumbleSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM ev
        |GROUP BY 1, 2
        |HAVING wstart + INTERVAL '1 hour' <= (SELECT w FROM wm)
        |ORDER BY wstart, event_type""".stripMargin

  /** The windowing-TVF SQL statement on a STREAM — the reference's
    * full declarative posture in one flow: watermark declared once on
    * the view (`createStreamingView`, the WATERMARK-DDL analog), the
    * query text the reference's own
    * `FROM TABLE(TUMBLE(TABLE …, DESCRIPTOR(…), …))` shape
    * ([[graft.WindowTvfSql]] route), append emission gated by the
    * declared bound. Oracle = [[streamTumbleSql]] verbatim: the TVF
    * route must equal the `GROUP BY window(...)` route on the same
    * stream.
    */
  def streamSqlTumble(s: SparkSession, dir: String): DataFrame = {
    val env = graft.TableEnv(s, dir)
    env.createStreamingView("events_wm_tvf", eventStream(s, dir), "ts", "10 minutes")
    val out = env.sqlQuery(
      """SELECT window_start AS wstart, event_type,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM TABLE(TUMBLE(TABLE events_wm_tvf, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start, event_type""".stripMargin)
    runToTable("stream_sql_tumble", out, "append").orderBy("wstart", "event_type")
  }

  /** The full DDL-declared streaming pipeline through SQL TEXT (ref:
    * SqlCreateTable.java + SqlWatermark.java +
    * TableEnvironmentImpl.java:605): CREATE TABLE over the 3-batch
    * day-split replay directory with a WATERMARK clause — the bound is
    * declared ONCE, in DDL, and the windowed INSERT inherits it (the
    * reference's WatermarkSpec posture, now via statement text instead
    * of `createStreamingView`) — then CREATE TABLE a parquet sink and
    * INSERT INTO it from a windowed aggregate; the sink is read back by
    * a final SELECT statement. Values aggregate in integer cents so the
    * write/read roundtrip is exact. Oracle = the batch hourly aggregate
    * gated at the declared watermark.
    */
  def streamSqlDdl(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val srcDir = stageBatchFiles(dir, "sqlddl", daySplits(ev, col("ts"), 3))
    val outDir = freshDir(dir, "sqlddl_sink")
    val env = graft.TableEnv(s, dir)
    env.executeSql(
      s"""CREATE TABLE ddl_ev (
         |  event_id BIGINT, ts TIMESTAMP(3), user_id BIGINT,
         |  event_type STRING, value DOUBLE,
         |  WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE
         |) WITH ('connector'='filesystem', 'path'='$srcDir',
         |  'format'='parquet', 'source.max-files-per-trigger'='1')""".stripMargin)
    env.executeSql(
      s"""CREATE TABLE ddl_hourly (wstart TIMESTAMP(3), event_type STRING, cnt BIGINT, sv BIGINT)
         |WITH ('connector'='filesystem', 'path'='$outDir', 'format'='parquet')""".stripMargin)
    // same state-partition scoping as runToTable: 32 shuffle partitions
    // is pure state-store-commit overhead at local replay scale
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try env.executeSql(
      """INSERT INTO ddl_hourly
        |SELECT window.start, event_type, count(*),
        |  sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |FROM ddl_ev GROUP BY window(ts, '1 hour'), event_type""".stripMargin)
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
    env.executeSql("SELECT wstart, event_type, cnt, sv FROM ddl_hourly ORDER BY wstart, event_type")
  }

  val streamSqlDdlSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  count(*)::BIGINT AS cnt,
        |  (sum(CAST(floor(value * 100 + 0.5) AS BIGINT)))::BIGINT AS sv
        |FROM ev
        |GROUP BY 1, 2
        |HAVING wstart + INTERVAL '1 hour' <= (SELECT w FROM wm)
        |ORDER BY wstart, event_type""".stripMargin

  /** The streaming DEDUPLICATE SQL statement (ref:
    * `StreamExecDeduplicate.scala` — the reference planner subsumes the
    * `ROW_NUMBER() … WHERE rn = 1` pattern into an incremental
    * keep-last operator; here [[graft.RankSql]] performs the same
    * subsumption through `TableEnv.sqlQuery`): the statement runs over
    * a 3-batch day-split stream, per-key state is ONE row (N = 1), and
    * the outer projection is Catalyst's over the drained state. Oracle
    * = the builder-API dedup's whole-corpus SQL verbatim.
    */
  def streamSqlDedup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val srcDir = stageBatchFiles(dir, "sqldedup", daySplits(ev, col("ts"), 3))
    s.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(srcDir)
      .createOrReplaceTempView("sev_dedup")
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT user_id, event_id, unix_micros(ts) AS ts_us
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM sev_dedup) WHERE rn = 1""".stripMargin)
      .orderBy("user_id")
  }

  // lazy: streamDedupLastSql is declared later in the file
  lazy val streamSqlDedupSql: String = streamDedupLastSql

  /** The streaming TOP-N SQL statement (ref: `StreamExecRank.scala` /
    * `UpdatableTopNFunction.java` — `rn <= N` subsumed into the N-best
    * per-key state): top-3 events by value per type through the same
    * [[graft.RankSql]] route, state = 3 rows per event type.
    */
  def streamSqlTopn(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val srcDir = stageBatchFiles(dir, "sqltopn", daySplits(ev, col("ts"), 3))
    s.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(srcDir)
      .createOrReplaceTempView("sev_topn")
    graft.TableEnv(s, dir).sqlQuery(
      """SELECT event_type, event_id, round(value, 4) AS v, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY value DESC, event_id ASC) AS rn
        |      FROM sev_topn) WHERE rn <= 3""".stripMargin)
      .orderBy("event_type", "rn")
  }

  val streamSqlTopnSql: String =
    Tables.eventsCte +
      """
        |SELECT event_type, event_id, round(value, 4) AS v, rn::BIGINT AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY value DESC, event_id ASC) AS rn
        |      FROM ev) t WHERE rn <= 3
        |ORDER BY event_type, rn""".stripMargin

  /** SESSION TVF statement on a STREAM (ref SqlSessionTableFunction on
    * a watermarked table): the [[graft.WindowTvfSql]] streaming
    * lowering folds the statement onto `GROUP BY
    * session_window(ts, gap), user_id` — Spark's merging session
    * aggregate, watermark semantics intact, which is exactly the
    * operator the reference's planner picks
    * (StreamExecWindowAggregate over a session spec). Oracle = the
    * batch island construction gated on session end ≤ final watermark,
    * with both bounds exercised (end = last element + gap).
    */
  def streamSqlSession(s: SparkSession, dir: String): DataFrame = {
    val env = graft.TableEnv(s, dir)
    env.createStreamingView("events_wm_stvf", eventStream(s, dir), "ts", "10 minutes")
    val out = env.sqlQuery(
      """SELECT user_id, window_start AS sstart, window_end AS send, count(*) AS cnt
        |FROM TABLE(SESSION(TABLE events_wm_stvf PARTITION BY user_id,
        |                   DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        |GROUP BY window_start, window_end, user_id""".stripMargin)
    runToTable("stream_sql_session", out, "append").orderBy("user_id", "sstart")
  }

  val streamSqlSessionSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS sstart,
        |  max(ts) + INTERVAL '30 minutes' AS send, count(*) AS cnt
        |FROM sessions GROUP BY user_id, sid
        |HAVING max(ts) + INTERVAL '30 minutes' <= (SELECT w FROM wm)
        |ORDER BY user_id, sstart""".stripMargin

  /** Streaming session windows per user (ref: EventTimeSessionWindows),
    * append mode: emitted ⇔ session end (last ts + gap) <= final
    * watermark.
    */
  def streamSession(s: SparkSession, dir: String): DataFrame = {
    val out = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("sstart"), col("cnt"))
    runToTable("stream_session", out, "append").orderBy("user_id", "sstart")
  }

  val streamSessionSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS sstart, count(*) AS cnt
        |FROM sessions GROUP BY user_id, sid
        |HAVING max(ts) + INTERVAL '30 minutes' <= (SELECT w FROM wm)
        |ORDER BY user_id, sstart""".stripMargin

  /** Connected-streams match-or-timeout (ref: CoProcessFunction +
    * event-time timer — the canonical "order matched by payment within
    * T, else alert"): per (user, day), the first view anchors the
    * decision; the first purchase inside the 2-hour window matches,
    * otherwise a timeout row fires when the watermark passes the
    * deadline ([[StreamingOps.matchWithTimeout]]). Oracle: the same
    * decision computed from the batch min-view/min-purchase per key,
    * gated on deadline ≤ final watermark.
    */
  def streamCoMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.matchWithTimeout[Event, String](
      ev,
      // UTC epoch-day arithmetic, not java.sql.Date.toString (which
      // renders in the JVM default zone — tz-dependent keys would
      // silently split days)
      keyFn = e => s"${e.user_id}|${java.time.LocalDate.ofEpochDay(Math.floorDiv(e.tsUs, 86400000000L))}",
      isLeftFn = _.event_type == "view",
      tsUsFn = _.tsUs,
      withinUs = 2L * 3600L * 1000000L)
    runToTable("stream_comatch", out.toDF(), "append")
      .select(split(col("key"), "\\|").getItem(0).cast("long").as("user_id"),
        split(col("key"), "\\|").getItem(1).as("day"),
        col("status"), col("left_ts"), col("right_ts"))
      .orderBy("user_id", "day")
  }

  val streamCoMatchSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |f AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type, epoch_us(ts) AS tu
        |      FROM ev WHERE event_type IN ('view', 'purchase')),
        |k AS (SELECT user_id, day,
        |        min(CASE WHEN event_type = 'view' THEN tu END) AS l
        |      FROM f GROUP BY 1, 2),
        |d AS (SELECT k.user_id, k.day, k.l,
        |        (SELECT min(tu) FROM f r
        |         WHERE r.user_id = k.user_id AND r.day = k.day
        |           AND r.event_type = 'purchase'
        |           AND r.tu >= k.l AND r.tu <= k.l + 7200000000) AS r
        |      FROM k WHERE k.l IS NOT NULL)
        |SELECT user_id, day::VARCHAR AS day,
        |  CASE WHEN r IS NOT NULL THEN 'matched' ELSE 'timeout' END AS status,
        |  l AS left_ts, r AS right_ts
        |FROM d
        |WHERE l + 7200000000 <= epoch_us((SELECT w FROM wm))
        |ORDER BY user_id, day""".stripMargin

  /** DYNAMIC-gap session windows (ref: EventTimeSessionWindows
    * .withDynamicGap / SessionWindowTimeGapExtractor — the gap is a
    * per-ELEMENT function, here 45 min after a purchase vs 20 min
    * otherwise): Spark's session_window accepts a gap COLUMN, so the
    * declarative form carries over; sessions merge while an event lands
    * inside the running max(ts + gap(event)) end. The oracle rebuilds
    * the islands with the same running-max break rule and gates on
    * session end ≤ final watermark.
    */
  def streamSessionDynamic(s: SparkSession, dir: String): DataFrame = {
    val gap = when(col("event_type") === "purchase", "45 minutes")
      .otherwise("20 minutes")
    val out = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("sstart"), col("cnt"))
    runToTable("stream_session_dyn", out, "append").orderBy("user_id", "sstart")
  }

  val streamSessionDynamicSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |g AS (SELECT user_id, ts,
        |    CASE WHEN event_type = 'purchase' THEN 2700 ELSE 1200 END AS gap_s
        |  FROM ev),
        |m AS (SELECT user_id, ts, gap_s,
        |    max(ts + gap_s * INTERVAL '1 second')
        |      OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM g),
        |b AS (SELECT user_id, ts, gap_s,
        |    CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |sess AS (SELECT user_id, ts, gap_s,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b)
        |SELECT user_id, min(ts) AS sstart, count(*) AS cnt
        |FROM sess GROUP BY user_id, sid
        |HAVING max(ts + gap_s * INTERVAL '1 second') <= (SELECT w FROM wm)
        |ORDER BY user_id, sstart""".stripMargin

  /** Custom-state gap sessionization ([[StreamingOps.sessionizeByGap]],
    * the KeyedProcessFunction sessionizing pattern): sessions are
    * emitted exactly once, CLOSED by the first event beyond the 30-min
    * gap; each key's trailing session stays open in state, unemitted —
    * so the oracle is every session except each user's last.
    */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .select(col("user_id"), col("ts").cast("long").as("ts_s"), col("value"))
      .as[(Long, Long, Double)]
    val out = StreamingOps.sessionizeByGap[(Long, Long, Double), Long](
      ev, _._1, _._2, _._3, gapS = 1800L)
    runToTable("stream_sessionize", out.toDF(), "append")
      .select(col("key").as("user_id"), col("start_s"), col("duration_s"),
        col("n_events"), round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id", "start_s")
  }

  val streamSessionizeSql: String =
    Tables.eventsCte +
      """
        |, t AS (SELECT user_id, (epoch_us(ts) // 1000000) AS tss, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR (epoch_us(ts) // 1000000)
        |              - (epoch_us(lag(ts) OVER w) // 1000000) > 1800
        |         THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tss, value
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM t),
        |g AS (SELECT user_id, sid, min(tss)::BIGINT AS start_s,
        |        (max(tss) - min(tss))::BIGINT AS duration_s,
        |        count(*)::BIGINT AS n_events, round(sum(value), 2) AS total_value,
        |        max(sid) OVER (PARTITION BY user_id) AS max_sid
        |      FROM s GROUP BY user_id, sid)
        |SELECT user_id, start_s, duration_s, n_events, total_value
        |FROM g WHERE sid < max_sid ORDER BY user_id, start_s""".stripMargin

  /** Stream-stream interval join (ref: TimeBoundedStreamJoin.java:52):
    * signup ⋈ purchase within 1h, inner append — all pairs emitted.
    */
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val out = a.join(b,
      col("a_user") === col("b_user")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
      .select("a_id", "b_id")
    runToTable("stream_ij", out, "append").orderBy("a_id", "b_id")
  }

  val streamIntervalJoinSql: String =
    Tables.eventsCte +
      """
        |SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a_id, b_id""".stripMargin

  /** WINDOW join (ref: DataStream `join(...).where(...).equalTo(...)
    * .window(TumblingEventTimeWindows)` — JoinedStreams.java: pairs
    * co-located in the SAME tumbling window, a distinct API from the
    * interval join's relative bound): views join purchases of the same
    * user inside the same 1-hour tumble. Spark mapping: both sides
    * project their `window(ts)` bucket and equi-join on (user, bucket);
    * the redundant relative-time bound (implied by bucket equality)
    * gives Structured Streaming the watermark-based state eviction it
    * requires for stream-stream joins.
    */
  def streamWindowJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
    val a = ev.filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"), window(col("ts"), "1 hour").getField("start").as("a_w"))
    val b = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"), window(col("ts"), "1 hour").getField("start").as("b_w"))
    val out = a.join(b,
      col("a_user") === col("b_user")
        && col("a_w") === col("b_w")
        && col("b_ts") >= col("a_ts") - expr("INTERVAL 1 HOUR")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
      .select("a_id", "b_id")
    runToTable("stream_wj", out, "append").orderBy("a_id", "b_id")
  }

  val streamWindowJoinSql: String =
    Tables.eventsCte +
      """
        |SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM (SELECT * FROM ev WHERE event_type = 'view') a
        |JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id
        | AND time_bucket(INTERVAL '1 hour', a.ts) = time_bucket(INTERVAL '1 hour', b.ts)
        |ORDER BY a_id, b_id""".stripMargin

  /** WINDOW coGroup (ref: CoGroupedStreams.java `coGroup(...).where(…)
    * .equalTo(…).window(…)` — unlike the window JOIN, one-sided groups
    * fire too): views and purchases of the same user in the same 1-hour
    * tumble, aggregated per group. Spark mapping: the tagged union
    * flows through ONE windowed aggregate — the cogroup iterables
    * collapse to their aggregates map-side, no join state at all (the
    * shape Flink users reach cogroup for when one side may be absent).
    */
  def streamWindowCoGroup(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .withWatermark("ts", "10 minutes")
    val out = ev
      .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 4)
          .as("revenue"))
      .select(col("user_id"), col("w.start").as("wstart"),
        col("n_views"), col("n_purchases"), col("revenue"))
    runToTable("stream_wcg", out, "append").orderBy("user_id", "wstart")
  }

  val streamWindowCoGroupSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |f AS (SELECT * FROM ev WHERE event_type IN ('view', 'purchase'))
        |SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS wstart,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_views,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchases,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS revenue
        |FROM f GROUP BY 1, 2
        |HAVING wstart + INTERVAL '1 hour' <= (SELECT w FROM wm)
        |ORDER BY user_id, wstart""".stripMargin

  /** Streaming top-N per user via flatMapGroupsWithState (ref:
    * UpdatableTopNFunction.java), update mode. Single-batch AvailableNow
    * ⇒ exactly one (final) ranking emission per user.
    */
  def streamTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.topNByKey[Event, Long](ev, _.user_id, _.event_id, _.value, n = 3)
    runToTable("stream_topn", out.toDF(), "update")
      .select(col("key").as("user_id"), col("rank"), col("id").as("event_id"),
        col("score").as("value"))
      .orderBy("user_id", "rank")
  }

  val streamTopNSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id, rank, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
        |  FROM ev)
        |WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin

  /** Streaming CEP (ref: CepOperator.java:83): signup followed by a
    * purchase within 1 hour per user, NoSkip after-match. Emitted ⇔
    * start ts + within <= final watermark.
    */
  def streamCep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("signup").where(_.event_type == "signup")
      .followedBy("purchase").where(_.event_type == "purchase")
      .within(scala.concurrent.duration.Duration(1, "hour"))
    val out = CEP.streaming[Event, Long, (Long, Long, Long)](
      ev, _.user_id, _.tsUs, pattern,
      (key, m) => (key, m.bindings("signup").head.event_id, m.bindings("purchase").head.event_id),
      tieFn = _.event_id)
      .toDF("user_id", "signup_id", "purchase_id")
    runToTable("stream_cep", out, "append").orderBy("signup_id")
  }

  val streamCepSql: String =
    Tables.eventsCte +
      """
        |-- watermark universe = the filtered signup/purchase stream (the
        |-- watermark node sits after the filter in the streaming plan)
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev
        |         WHERE event_type IN ('signup', 'purchase'))
        |SELECT user_id, signup_id, purchase_id FROM (
        |  SELECT a.user_id, a.event_id AS signup_id, b.event_id AS purchase_id,
        |    row_number() OVER (PARTITION BY a.event_id ORDER BY b.ts, b.event_id) AS rn
        |  FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |  JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |    ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |  WHERE a.ts + INTERVAL 1 HOUR <= (SELECT w FROM wm))
        |WHERE rn = 1 ORDER BY signup_id""".stripMargin

  /** Streaming CEP with the TIMEOUT side output (ref: flink-cep
    * PatternStream.select(timeoutTag), CepOperator#
    * processTimedOutSequences): same signup→purchase-within-1h pattern
    * as [[streamCep]], but stalled runs also emit — exactly once, with
    * NULL purchase_id, in the batch where the watermark passes their
    * window. Match rows and timeout rows share one state-buffer replay.
    */
  def streamCepTimeout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("signup").where(_.event_type == "signup")
      .followedBy("purchase").where(_.event_type == "purchase")
      .within(scala.concurrent.duration.Duration(1, "hour"))
    val out = CEP.streamingWithTimeouts[Event, Long, (Long, Long, Option[Long])](
      ev, _.user_id, _.tsUs, pattern,
      (key, m) => (key, m.bindings("signup").head.event_id,
        Some(m.bindings("purchase").head.event_id)),
      (key, m) => (key, m.bindings("signup").head.event_id, None),
      tieFn = _.event_id)
      .toDF("user_id", "signup_id", "purchase_id")
    runToTable("stream_cep_timeout", out, "append").orderBy("signup_id")
  }

  val streamCepTimeoutSql: String =
    Tables.eventsCte +
      """
        |-- the watermark tracks the FILTERED stream: the pattern input is
        |-- signup/purchase only, so max(ts) is over those rows, not all events
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev
        |         WHERE event_type IN ('signup', 'purchase')),
        |m AS (SELECT user_id, signup_id, purchase_id FROM (
        |  SELECT a.user_id, a.event_id AS signup_id, b.event_id AS purchase_id,
        |    row_number() OVER (PARTITION BY a.event_id ORDER BY b.ts, b.event_id) AS rn
        |  FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |  JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |    ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |  WHERE a.ts + INTERVAL 1 HOUR <= (SELECT w FROM wm))
        |  WHERE rn = 1),
        |t AS (SELECT a.user_id, a.event_id AS signup_id, NULL::BIGINT AS purchase_id
        |  FROM ev a WHERE a.event_type = 'signup'
        |    AND a.ts + INTERVAL 1 HOUR <= (SELECT w FROM wm)
        |    AND NOT EXISTS (SELECT 1 FROM ev b WHERE b.user_id = a.user_id
        |      AND b.event_type = 'purchase' AND b.ts > a.ts
        |      AND b.ts <= a.ts + INTERVAL 1 HOUR))
        |SELECT * FROM (SELECT * FROM m UNION ALL SELECT * FROM t)
        |ORDER BY signup_id""".stripMargin

  /** Stream-stream LEFT OUTER interval join (ref: StreamExecJoin
    * .scala:49 outer variants, OuterJoinRecordStateViews.java): matched
    * pairs emit immediately; unmatched signups emit with NULLs once the
    * watermark passes their join window (a_ts + 1h).
    */
  def streamLeftJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val out = a.join(b,
      col("a_user") === col("b_user")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select("a_id", "b_id")
    runToTable("stream_loj", out, "append").orderBy("a_id", "b_id")
  }

  val streamLeftJoinSql: String =
    Tables.eventsCte +
      """
        |, a AS (SELECT event_id AS a_id, user_id, ts AS a_ts FROM ev WHERE event_type = 'signup'),
        |b AS (SELECT event_id AS b_id, user_id, ts AS b_ts FROM ev WHERE event_type = 'purchase'),
        |-- global watermark = MIN over the two watermarked source streams
        |wm AS (SELECT least((SELECT max(a_ts) FROM a), (SELECT max(b_ts) FROM b))
        |         - INTERVAL 10 MINUTE AS w),
        |matched AS (
        |  SELECT a_id, b_id FROM a JOIN b USING (user_id)
        |  WHERE b_ts > a_ts AND b_ts <= a_ts + INTERVAL 1 HOUR),
        |unmatched AS (
        |  SELECT a_id, NULL::BIGINT AS b_id FROM a
        |  WHERE a_id NOT IN (SELECT a_id FROM matched)
        |    AND a_ts + INTERVAL 1 HOUR <= (SELECT w FROM wm))
        |SELECT a_id, b_id FROM matched UNION ALL SELECT a_id, b_id FROM unmatched
        |ORDER BY a_id, b_id""".stripMargin

  /** Stream-stream FULL OUTER join (ref: StreamingJoinOperator.java
    * FullOuterJoin paths, JoinITCase full outer): both sides watermarked,
    * matched pairs emit on arrival; an unmatched signup emits with NULL
    * purchase once the watermark proves no purchase can still arrive in
    * its (a_ts, a_ts + 1h] window; an unmatched purchase emits with NULL
    * signup once the watermark passes b_ts (no future signup can have
    * a_ts < b_ts). State outliving the final watermark never emits —
    * same replay convention as the left join's oracle.
    */
  def streamFullJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val out = a.join(b,
      col("a_user") === col("b_user")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"),
      "full_outer")
      .select("a_id", "b_id")
    runToTable("stream_foj", out, "append").orderBy("a_id", "b_id")
  }

  val streamFullJoinSql: String =
    Tables.eventsCte +
      """
        |, a AS (SELECT event_id AS a_id, user_id, ts AS a_ts FROM ev WHERE event_type = 'signup'),
        |b AS (SELECT event_id AS b_id, user_id, ts AS b_ts FROM ev WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(a_ts) FROM a), (SELECT max(b_ts) FROM b))
        |         - INTERVAL 10 MINUTE AS w),
        |matched AS (
        |  SELECT a_id, b_id FROM a JOIN b USING (user_id)
        |  WHERE b_ts > a_ts AND b_ts <= a_ts + INTERVAL 1 HOUR),
        |unmatched_a AS (
        |  SELECT a_id, NULL::BIGINT AS b_id FROM a
        |  WHERE a_id NOT IN (SELECT a_id FROM matched)
        |    AND a_ts + INTERVAL 1 HOUR <= (SELECT w FROM wm)),
        |unmatched_b AS (
        |  SELECT NULL::BIGINT AS a_id, b_id FROM b
        |  WHERE b_id NOT IN (SELECT b_id FROM matched)
        |    AND b_ts <= (SELECT w FROM wm))
        |SELECT a_id, b_id FROM matched
        |UNION ALL SELECT a_id, b_id FROM unmatched_a
        |UNION ALL SELECT a_id, b_id FROM unmatched_b
        |ORDER BY a_id, b_id""".stripMargin

  /** Stream-stream RIGHT OUTER join — completes the outer family with
    * [[streamLeftJoin]] and [[streamFullJoin]]: matched pairs emit on
    * arrival; an unmatched purchase emits with NULL signup once the
    * watermark passes b_ts (same bound as the full join's right side).
    */
  def streamRightJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val out = a.join(b,
      col("a_user") === col("b_user")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"),
      "right_outer")
      .select("a_id", "b_id")
    runToTable("stream_roj", out, "append").orderBy("a_id", "b_id")
  }

  val streamRightJoinSql: String =
    Tables.eventsCte +
      """
        |, a AS (SELECT event_id AS a_id, user_id, ts AS a_ts FROM ev WHERE event_type = 'signup'),
        |b AS (SELECT event_id AS b_id, user_id, ts AS b_ts FROM ev WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(a_ts) FROM a), (SELECT max(b_ts) FROM b))
        |         - INTERVAL 10 MINUTE AS w),
        |matched AS (
        |  SELECT a_id, b_id FROM a JOIN b USING (user_id)
        |  WHERE b_ts > a_ts AND b_ts <= a_ts + INTERVAL 1 HOUR),
        |unmatched_b AS (
        |  SELECT NULL::BIGINT AS a_id, b_id FROM b
        |  WHERE b_id NOT IN (SELECT b_id FROM matched)
        |    AND b_ts <= (SELECT w FROM wm))
        |SELECT a_id, b_id FROM matched
        |UNION ALL SELECT a_id, b_id FROM unmatched_b
        |ORDER BY a_id, b_id""".stripMargin

  /** Stream-stream LEFT SEMI join (ref: StreamingSemiAntiJoinOperator
    * .java:35, SemiAntiJoinStreamITCase): signups with at least one
    * purchase in (a_ts, a_ts + 1h]. A matched left row emits exactly once
    * as soon as its first match arrives (no watermark wait); unmatched
    * rows are silently dropped at state eviction — so the oracle is a
    * plain EXISTS with no watermark gate.
    */
  def streamSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    val out = a.join(b,
      col("a_user") === col("b_user")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"),
      "left_semi")
      .select("a_id")
    runToTable("stream_sj", out, "append").orderBy("a_id")
  }

  val streamSemiJoinSql: String =
    Tables.eventsCte +
      """
        |SELECT a.event_id AS a_id
        |FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |WHERE EXISTS (
        |  SELECT 1 FROM ev b WHERE b.event_type = 'purchase'
        |    AND b.user_id = a.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
        |ORDER BY a_id""".stripMargin

  /** Stream-stream ANTI join (ref: StreamingSemiAntiJoinOperator.java:35
    * anti path). Spark's stream-stream joins have no native left_anti —
    * the supported composition is LEFT OUTER + IS NULL filter: an
    * unmatched signup emits with NULLs once the watermark passes its join
    * window, and the filter keeps exactly those. Emission ⇔ a_ts + 1h <=
    * final min-watermark, mirrored in the oracle.
    */
  def streamAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val out = a.join(b,
      col("a_user") === col("b_user")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .filter(col("b_id").isNull)
      .select("a_id")
    runToTable("stream_aj", out, "append").orderBy("a_id")
  }

  val streamAntiJoinSql: String =
    Tables.eventsCte +
      """
        |, a AS (SELECT event_id AS a_id, user_id, ts AS a_ts FROM ev WHERE event_type = 'signup'),
        |b AS (SELECT user_id, ts AS b_ts FROM ev WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(a_ts) FROM a), (SELECT max(b_ts) FROM b))
        |         - INTERVAL 10 MINUTE AS w)
        |SELECT a_id FROM a
        |WHERE NOT EXISTS (
        |    SELECT 1 FROM b WHERE b.user_id = a.user_id
        |      AND b.b_ts > a.a_ts AND b.b_ts <= a.a_ts + INTERVAL 1 HOUR)
        |  AND a.a_ts + INTERVAL 1 HOUR <= (SELECT w FROM wm)
        |ORDER BY a_id""".stripMargin

  /** Streaming keep-LAST dedup per key (ref:
    * DeduplicateKeepLastRowFunction.java, DeduplicateITCase), update
    * mode: the latest event per user wins; single-batch AvailableNow ⇒
    * exactly one (final) upsert per user = the batch keep-last answer.
    */
  def streamDedupLast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.dedupKeepLast[Event, Long](ev, _.user_id, _.event_id, _.tsUs)
      .toDF("user_id", "event_id", "ts_us")
    runToTable("stream_dedup_last", out, "update").orderBy("user_id")
  }

  val streamDedupLastSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM (
        |  SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Streaming dedup with BOUNDED state via
    * `dropDuplicatesWithinWatermark` (ref: Flink's deduplication with
    * state-TTL retention, `DeduplicateFunctionBase` — state for a key
    * is dropped once the watermark passes, so unbounded streams dedup
    * in bounded memory; plain dropDuplicates state grows forever).
    * Only the dedup key columns are emitted: which physical row
    * represents a key within a micro-batch is partition-order-
    * dependent, the key set itself is deterministic.
    */
  def streamDedupWm(s: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_type"), col("ts"))
    val out = ev.dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    runToTable("stream_dedup_wm", out, "append")
      .orderBy("user_id", "event_type")
  }

  // FIXTURE INVARIANT: SELECT DISTINCT is only equivalent to
  // dropDuplicatesWithinWatermark while every duplicate of a
  // (user_id, event_type) key arrives within the 10-minute watermark
  // delay — duplicates spaced further apart in event time re-emit the
  // key on the streaming side and would diverge from this oracle. The
  // driver's events fixture satisfies it (each user's events span well
  // under the delay); revisit this oracle before changing the fixture
  // or the delay.
  val streamDedupWmSql: String =
    Tables.eventsCte +
      """
        |SELECT DISTINCT user_id, event_type FROM ev
        |ORDER BY user_id, event_type""".stripMargin

  /** Streaming BOUNDED-frame row-time OVER (ref:
    * RowTimeRowsBoundedPrecedingFunction.java:301, OverWindowITCase):
    * ROWS BETWEEN 2 PRECEDING AND CURRENT ROW per user, each event
    * emitted once when the watermark passes it.
    */
  def streamOverBounded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.overRowsBounded[Event, Long](
      ev, _.user_id, _.event_id, _.tsUs, _.value, nPreceding = 2)
    runToTable("stream_over_bounded", out.toDF(), "append")
      .select(col("key").as("user_id"), col("id").as("event_id"),
        round(col("running_sum"), 4).as("rsum3"), col("running_cnt").as("rcnt3"))
      .orderBy("user_id", "event_id")
  }

  val streamOverBoundedSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rsum3,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rcnt3
        |FROM ev
        |QUALIFY ts <= (SELECT w FROM wm)
        |ORDER BY user_id, event_id""".stripMargin

  /** Streaming OVER with a bounded time-RANGE frame — the trailing-6-hour
    * running sum/count per user at each event (ref:
    * RowTimeRangeBoundedPrecedingFunction.java — the one §2.7 streaming
    * variant previously missing). Emitted ⇔ watermark passed the row;
    * peers (same timestamp) share one frame, which is what the SQL RANGE
    * oracle computes too.
    */
  def streamOverRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.overRangeBounded[Event, Long](
      ev, _.user_id, _.event_id, _.tsUs, _.value,
      precedingUs = 6L * 3600L * 1000000L)
    runToTable("stream_over_range", out.toDF(), "append")
      .select(col("key").as("user_id"), col("id").as("event_id"),
        round(col("running_sum"), 4).as("rsum6h"), col("running_cnt").as("rcnt6h"))
      .orderBy("user_id", "event_id")
  }

  val streamOverRangeSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW), 4) AS rsum6h,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW) AS rcnt6h
        |FROM ev
        |QUALIFY ts <= (SELECT w FROM wm)
        |ORDER BY user_id, event_id""".stripMargin

  /** PROC-time temporal join (ref: TemporalProcessTimeJoinOperator.java,
    * TemporalJoinITCase proc-time cases): purchases join the customer
    * dimension snapshot taken when their micro-batch executes. Under
    * AvailableNow the snapshot is static, so the oracle is a plain
    * left join — what varies in production is WHICH snapshot each batch
    * sees, not the join shape.
    */
  def streamTemporalProcJoin(s: SparkSession, dir: String): DataFrame = {
    val probes = eventStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"))
    val out = freshDir(dir, "tproc")
    val q = graft.streaming.TemporalJoin.procTime(
      probes,
      () => Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
      col("user_id") === col("c_custkey"), "left_outer", out)
    q.awaitTermination()
    s.read.parquet(out)
      .select(col("event_id"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .orderBy("event_id")
  }

  val streamTemporalProcJoinSql: String =
    Tables.eventsCte +
      """
        |SELECT event_id, coalesce(c_mktsegment, 'UNKNOWN') AS segment
        |FROM ev LEFT JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin

  /** Streaming file sink (ref: StreamingFileSink / FileSystem table sink
    * with partitioned commit): the stream lands as parquet files with
    * checkpointed exactly-once commit semantics, then is read back for
    * the deterministic summary the oracle checks.
    */
  def streamFileSink(s: SparkSession, dir: String): DataFrame = {
    val out = freshDir(dir, "filesink")
    val ckpt = freshDir(dir, "filesink_ckpt")
    val q = eventStream(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .orderBy("event_type")
  }

  val streamFileSinkSql: String =
    Tables.eventsCte +
      """
        |SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Streaming UNBOUNDED group aggregate, update mode (ref:
    * StreamExecGroupAggregate.scala:52 / GroupAggFunction.java): per-key
    * running aggregates emitted as upserts. Single-batch AvailableNow ⇒
    * the final upsert per key, which equals the batch aggregate.
    */
  def streamGroupAgg(s: SparkSession, dir: String): DataFrame = {
    val out = eventStream(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"),
        round(avg("value"), 6).as("av"))
    runToTable("stream_groupagg", out, "update").orderBy("user_id", "event_type")
  }

  val streamGroupAggSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id, event_type, count(*) AS cnt,
        |  round(sum(value), 4) AS sv, round(avg(value), 6) AS av
        |FROM ev GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin

  /** Retraction through an aggregate-of-aggregate chain (ref: RowKind
    * .java:32-55 UPDATE_BEFORE/AFTER flowing between chained
    * StreamExecGroupAggregates): Spark cannot retract between two
    * streaming aggregates, so the chain is cut at the sink — the inner
    * unbounded per-user aggregate runs in Update mode and lands its
    * upsert stream in the executor-parallel ParquetUpsertSink; the
    * outer aggregate (users per event-count) runs over the collapsed
    * snapshot, in which every superseded per-user count has been
    * retracted by last-writer-wins. The source is split into 3
    * micro-batches so later batches REALLY retract counts the outer
    * aggregate would otherwise double-count: the final answer equals
    * the batch aggregate-of-aggregate, which is the oracle.
    */
  /** Streaming INCREMENTAL curation — the continuous-ingestion path the
    * batch funnel implies (ref: Flink's continuous dedup keeps per-key
    * state with TTL, `DeduplicateFunctionBase`; here the keeper state
    * lives in a mergeable store instead of operator memory): the corpus
    * arrives as 3 micro-batches; each batch is quality-filtered
    * (n_tokens ≥ 20), PRE-DEDUPED within the batch (per-fingerprint
    * `min_by` keeper — the map-side-combine of the incremental world:
    * state writes are bounded by batch cardinality, not batch rows),
    * and appended to the keeper store; compaction happens on read with
    * the same `min_by` merge. Because min is associative/commutative,
    * the final keeper set is EXACTLY batch exact-dedup no matter how
    * the stream was batched or ordered — which is what the oracle
    * replays. At scale the store-side merge is the standard LSM shape:
    * appends stay cheap, the merge rides the read.
    */
  def streamCurate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val splits = freshDir(dir, "curate_src")
    Tables.documents(s, dir).select("doc_id", "source", "text")
      .repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(splits)
    val store = freshDir(dir, "curate_store")
    val batches = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("source", StringType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1") // one batch per range split
      .parquet(splits)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .filter(col("n_tokens") >= 20)
          .groupBy("fp")
          .agg(min_by(struct(col("doc_id"), col("source"), col("n_tokens")),
            col("doc_id")).as("r"))
          .select(col("fp"), col("r.doc_id").as("doc_id"),
            col("r.source").as("source"), col("r.n_tokens").as("n_tokens"))
          .write.mode("append").parquet(store)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(store)
      .groupBy("fp")
      .agg(min_by(struct(col("doc_id"), col("source"), col("n_tokens")), col("doc_id")).as("r"))
      .groupBy(col("r.source").as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("r.n_tokens")).as("n_tokens_total"))
      .orderBy("source")
  }

  val streamCurateSql: String =
    """WITH m AS (SELECT doc_id, source,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))::BIGINT AS n_tokens
      |  FROM documents),
      |f AS (SELECT * FROM m WHERE n_tokens >= 20),
      |k AS (SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY 1),
      |kept AS (SELECT f.* FROM f JOIN k ON f.fp = k.fp AND f.doc_id = k.doc_id)
      |SELECT source, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens_total
      |FROM kept GROUP BY source ORDER BY source""".stripMargin

  /** Broadcast-state rules application
    * ([[graft.streaming.BroadcastState.withBatchRules]], ref:
    * `DataStream.broadcast(stateDesc)` / BroadcastProcessFunction):
    * events arrive as 3 micro-batches (batch b = event_id mod 3, file
    * order forced by ascending mtimes); each batch is joined with the
    * RULES SNAPSHOT AS OF ITS OWN BATCH — a per-event-type value
    * multiplier that changes with every version — via a per-batch
    * broadcast refresh. Rule updates apply from the next batch on,
    * never retroactively (the reference's broadcast-state
    * consistency), which is exactly what the oracle replays:
    * multiplier = len(event_type) + (event_id mod 3).
    */
  def streamRules(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val srcDir = stageBatchFiles(dir, "rules",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    // versioned rules snapshots: the "slowly-changing dimension" the
    // pattern refreshes — multiplier drifts by +1 per version
    val rulesDir = freshDir(dir, "rules_dim")
    val types = ev.select(col("event_type")).distinct()
    graft.BenchMeters.fixture {
      for (v <- 0 until 3)
        types.select(col("event_type"),
            (length(col("event_type")) + lit(v)).cast("double").as("mult"))
          .coalesce(1).write.mode("overwrite").parquet(s"$rulesDir/v$v")
    }
    val store = freshDir(dir, "rules_out")
    graft.BenchMeters.fixture {
      ev.filter(lit(false)).withColumn("adj", lit(0.0))
        .write.mode("overwrite").parquet(store)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = graft.streaming.BroadcastState.withBatchRules(
      batches, v => s.read.parquet(s"$rulesDir/v$v"), store) { (batch, rules) =>
      batch.join(rules, Seq("event_type"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          (col("value") * col("mult")).as("adj"))
    }
    q.awaitTermination()
    s.read.parquet(store)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("adj"), 2).as("adj_total"))
      .orderBy("event_type")
  }

  val streamRulesSql: String =
    Tables.eventsCte +
      """
        |, t AS (SELECT event_type, value * (len(event_type) + (event_id % 3)) AS adj FROM ev)
        |SELECT event_type, count(*)::BIGINT AS cnt, round(sum(adj), 2) AS adj_total
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** TIME TRAVEL over the changelog store
    * ([[graft.streaming.ChangelogSink.ParquetUpsertSink]] `asOfBatch`):
    * a running per-user aggregate lands its update stream batch-by-
    * batch; reading the store AS OF each batch id reproduces the
    * aggregate state exactly as it stood after that batch committed —
    * the batch partitioning IS the version history, and each as-of
    * read prunes to the partitions ≤ its id. The oracle replays every
    * version from the batch assignment (batch b = event_id mod 3, file
    * order forced by mtimes): as-of b equals the batch aggregate over
    * events with id mod 3 ≤ b.
    */
  def streamTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("value"))
    val srcDir = stageBatchFiles(dir, "tt",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = freshDir(dir, "tt_store")
    val src = s.readStream
      .schema(StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val agg = src.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val q = graft.streaming.ChangelogSink.ParquetUpsertSink.writer(agg, store)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (0 until 3).map { b =>
      graft.streaming.ChangelogSink.ParquetUpsertSink
        .snapshot(s, store, Seq("user_id"), asOfBatch = Some(b.toLong))
        .withColumn("as_of", lit(b.toLong))
    }.reduce(_ unionByName _)
      .select(col("as_of"), col("user_id"), col("n"), round(col("sv"), 2).as("sv"))
      .orderBy("as_of", "user_id")
  }

  val streamTimeTravelSql: String =
    Tables.eventsCte +
      """
        |, v AS (SELECT b.b AS as_of, user_id, count(*)::BIGINT AS n,
        |          round(sum(value), 2) AS sv
        |        FROM ev, range(0, 3) b(b) WHERE event_id % 3 <= b.b
        |        GROUP BY 1, 2)
        |SELECT as_of::BIGINT AS as_of, user_id, n, sv
        |FROM v ORDER BY as_of, user_id""".stripMargin

  /** Streaming INCREMENTAL MinHash near-dup — the continuous-ingestion
    * analog of [[PipelineQueries.docDeltaMinhash]] and the sketch-level
    * upgrade of [[streamCurate]]'s exact dedup: the corpus (plus
    * planted re-crawls) arrives as 3 micro-batches; each batch probes
    * the accumulated doc store DIRECTIONALLY with
    * [[graft.operators.Dedup.deltaMinHashKeepers]] (band-key candidate
    * join, Jaccard ≥ 0.9 verify, min-keeper) and is THEN appended —
    * probe-before-append, so a doc can only match strictly earlier
    * batches, which is exactly what the oracle replays (batch id =
    * doc_id mod 3; match requires db's batch < da's batch). Batch files
    * carry forced ascending mtimes so the file source replays arrival
    * order deterministically. The band INDEX is itself persisted — an
    * append-only (id, key) store probed via
    * [[graft.operators.Dedup.deltaMinHashKeepersWithIndex]] and
    * appended after, so a batch never recomputes signatures over the
    * accumulated corpus and per-increment cost tracks the increment;
    * the doc store serves only the verify phase of actual candidates.
    */
  def streamDeltaMinhash(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val recrawl = docs
      .filter(col("doc_id") % 100 === 1 && col("doc_id") % 3 === 1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val all = docs.unionByName(recrawl)
    val srcDir = stageBatchFiles(dir, "dmh",
      (0 until 3).map(b => all.filter(col("doc_id") % 3 === b)))
    val docStore = freshDir(dir, "dmh_docs")
    val keyStore = freshDir(dir, "dmh_keys")
    val resDir = freshDir(dir, "dmh_res")
    // pre-seed the stores so the first batch reads valid empty tables
    graft.BenchMeters.fixture {
      all.filter(lit(false)).write.mode("overwrite").parquet(docStore)
      graft.operators.Dedup.bandIndex(all.filter(lit(false)))
        .write.mode("overwrite").parquet(keyStore)
      s.range(0).select(col("id"), col("id").as("keeper"),
        lit(0.0).as("jacc")).write.mode("overwrite").parquet(resDir)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the PERSISTED band index is read, never recomputed — a
        // batch's probe cost tracks the batch, not the store; the
        // batch's OWN index is materialized once and serves both the
        // probe and the store append (one minhash pass per batch).
        // Appends are coalesced: each batch lands ONE file per store
        // (the compaction discipline any streaming-ingest store needs —
        // 32-way tiny appends would strangle the re-reads with file
        // overhead long before data volume matters)
        // lazy boundary (r13 opt): the batch index fans out to the probe
        // and the store append; persist() materializes it inside the
        // probe write instead of paying a dedicated localCheckpoint job
        val idx = graft.operators.Dedup.bandIndex(batch).localCheckpoint(eager = false)
        // the probe result and the two store appends write DISJOINT
        // directories, and the probe's store reads pinned their file
        // lists at construction (before any append lands) — overlap the
        // three jobs so the tiny appends back-fill the probe join's
        // tail (guide §2.6, r14 opt; probe-before-append semantics are
        // preserved by the pinned listings)
        val probe = graft.operators.Dedup.deltaMinHashKeepersWithIndex(
          s.read.parquet(keyStore), s.read.parquet(docStore), batch,
          deltaIndex = Some(idx))
        inParallel(
          () => probe.coalesce(1).write.mode("append").parquet(resDir),
          () => idx.coalesce(1).write.mode("append").parquet(keyStore),
          () => batch.coalesce(1).write.mode("append").parquet(docStore))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(resDir).orderBy("id")
  }

  /** Streaming INCREMENTAL k-means — continuous centroid maintenance
    * (the streaming form of [[graft.operators.Similarity
    * .kmeansCentroids]]; mini-batch k-means, Sculley 2010, with
    * cumulative counts): embeddings arrive as 3 micro-batches; each
    * batch is assigned against the centroids AFTER the previous batch,
    * then folds its per-cluster (sum, count) into the persisted
    * accumulator store — so centroids are the running mean of
    * everything assigned so far and the model never re-reads old
    * vectors (the store is k·dim rows, corpus-independent). Seeds
    * (vec_id < k) enter the accumulator with unit weight so no cluster
    * can vanish before its first assignment. The store is versioned
    * per batch (read v(b−1), write v(b)) like [[streamBoilerplate]]'s
    * line store; determinism discipline matches the batch trainer:
    * centroids materialize with round(mean, 6), assignment by
    * (rounded cosine, smaller cid).
    */
  def streamKmeans(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import graft.functions.GraftFunctions.cosine_double
    val k = 8
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val srcDir = stageBatchFiles(dir, "skm",
      (0 until 3).map(b => emb.filter(col("vec_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "skm_store"))
    val resBase = freshDir(dir, "skm_res")
    // accumulator seed: vec_id < k enters with unit weight (a prior at
    // the seed point — keeps every cluster alive until first assignment)
    store.init(emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "s")))
      .withColumn("n", lit(1L)))
    val batches = s.readStream
      .schema(StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val acc = store.prior(batchId)
        val cent = acc
          .groupBy("cid")
          .agg(sort_array(collect_list(struct(col("i"),
            round(col("s") / col("n"), 6).as("c")))).as("pc"))
          .select(col("cid"), transform(col("pc"), x => x.getField("c")).as("ce"))
        val assigned = batch
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
          .join(broadcast(cent))
          .select(col("vec_id"), col("e"), col("cid"),
            round(cosine_double(col("e"), col("ce")), 6).as("cd"))
          .groupBy("vec_id")
          .agg(expr("max_by(cid, struct(cd, -cid))").as("cid"), first(col("e")).as("e"))
          .localCheckpoint(eager = false)
        val deltas = assigned
          .select(col("cid"), posexplode(col("e")).as(Seq("i", "v")))
          .groupBy("cid", "i").agg(sum("v").as("ds"), count(lit(1)).as("dn"))
        // results versioned-OVERWRITE per batchId like the store, so a
        // foreachBatch retry rewrites the same batch's rows instead of
        // appending duplicates — the whole job is retry-idempotent; the
        // two writes share only read-side frames and land on disjoint
        // paths, so they overlap (guide §2.6, r14 opt)
        inParallel(
          () => store.write(batchId, acc.join(deltas, Seq("cid", "i"), "left")
            .select(col("cid"), col("i"),
              (col("s") + coalesce(col("ds"), lit(0.0))).as("s"),
              (col("n") + coalesce(col("dn"), lit(0L))).as("n"))),
          () => assigned.select(col("vec_id"), lit(batchId).as("bat"), col("cid"))
            .coalesce(1).write.mode("overwrite").parquet(s"$resBase/b$batchId"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$resBase/b0", s"$resBase/b1", s"$resBase/b2")
      .select(col("vec_id"), col("bat").cast("long").as("bat"), col("cid").cast("int").as("cid"))
      .orderBy("vec_id")
  }

  val streamKmeansSql: String = {
    val cos = (e: String, c: String) =>
      s"round(list_dot_product($e, $c) / sqrt(list_dot_product($e, $e) * list_dot_product($c, $c)), 6)"
    val step = (b: Int) =>
      s"""c$b AS (SELECT cid, list(round(s / n, 6) ORDER BY i) AS ce FROM acc$b GROUP BY 1),
         |b$b AS (SELECT * FROM emb WHERE vec_id % 3 = $b),
         |a$b AS (SELECT vid, cid FROM (
         |  SELECT m.vec_id AS vid, c.cid,
         |    row_number() OVER (PARTITION BY m.vec_id
         |      ORDER BY ${cos("m.e", "c.ce")} DESC, c.cid) AS rn
         |  FROM b$b m, c$b c) WHERE rn = 1),
         |d$b AS (SELECT cid, i, sum(e[i + 1]) AS ds, count(*)::BIGINT AS dn
         |        FROM a$b JOIN emb ON vec_id = vid, range(0, 64) t(i) GROUP BY 1, 2),
         |acc${b + 1} AS (SELECT a.cid, a.i, a.s + coalesce(d.ds, 0) AS s,
         |                 a.n + coalesce(d.dn, 0) AS n
         |               FROM acc$b a LEFT JOIN d$b d ON d.cid = a.cid AND d.i = a.i)""".stripMargin
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |acc0 AS (SELECT vec_id::INTEGER AS cid, i, e[i + 1] AS s, 1::BIGINT AS n
       |         FROM emb, range(0, 64) t(i) WHERE vec_id < 8),
       |${(0 to 2).map(step).mkString(",\n")}
       |SELECT vec_id, bat, cid FROM (
       |  SELECT vid AS vec_id, 0::BIGINT AS bat, cid FROM a0
       |  UNION ALL SELECT vid, 1, cid FROM a1
       |  UNION ALL SELECT vid, 2, cid FROM a2)
       |ORDER BY vec_id""".stripMargin
  }

  /** Streaming INCREMENTAL connected components — continuous graph
    * maintenance over arriving edge batches (the streaming form of
    * [[GraphQueries.graphComponents]]; ref: flink-gelly
    * ConnectedComponents over the delta-iteration runtime, here as
    * incremental state): the persisted state is the star-contraction
    * FOREST ([[graft.operators.Components.starForest]] — |nodes| rows,
    * depth 1, connectivity-equivalent to everything seen), each batch
    * unions its edges and re-contracts (cheap: the prior state is
    * already depth 1, so rounds track the NEW edges' structure). Edges
    * are split across batches by `a % 3` — an arbitrary interleave, and
    * that is the point: the final labeling must equal the one-shot
    * batch CC regardless of arrival order, which is exactly what the
    * shared oracle asserts.
    */
  def streamComponents(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = Tables.events(s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val edges = ev
      .select(col("event_id").as("a"), lag("event_id", 1).over(w).as("b"))
      .filter(col("b").isNotNull)
    val srcDir = stageBatchFiles(dir, "scc",
      (0 until 3).map(b => edges.filter(col("a") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "scc_store"))
    store.init(s.range(0).select(col("id").as("da"), col("id").as("db")))
    val batches = s.readStream
      .schema(StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // delta-cost maintenance: the batch relabels into root space and
        // only THAT contracts — history is one rewrite join, never a
        // re-contraction (Components.incrementalForest)
        store.write(batchId, graft.operators.Components.incrementalForest(
          store.prior(batchId),
          batch.select(col("a").as("da"), col("b").as("db"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val forest = store.version(lastBatchId(srcDir))
    ev.select(col("event_id").as("id"))
      .join(forest.select(col("da").as("id"), col("db").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("lbl"))
      .groupBy("lbl").agg(count(lit(1)).cast("long").as("size"))
      .select(col("lbl").as("component"), col("size"))
      .orderBy("component")
  }

  /** Same oracle as the one-shot batch CC — incremental maintenance
    * must be arrival-order-invisible.
    */
  val streamComponentsSql: String = GraphQueries.graphComponentsSql

  /** Streaming metrics-and-alerts: events arrive as 3 micro-batches
    * whose HOURS OVERLAP (split by event_id, not time), each batch
    * sum-merges its (event_type, hour) counts into the persisted
    * metric store — the count leg of the windowable sketch algebra —
    * and the trailing-24h z-score alert rule
    * ([[AnalyticsQueries.evtAnomaly]]) evaluates over the merged
    * store. The oracle IS the batch alert query: cumulative
    * count-merge must be arrival-split-invisible.
    */
  def streamAnomaly(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sano",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sano_store"))
    store.init(s.range(0).select(col("id").cast("string").as("event_type"),
      col("id").cast("timestamp").as("h"), col("id").as("cnt")))
    val batches = s.readStream
      .schema(StructType(Seq(StructField("event_type", StringType),
        StructField("h", TimestampType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId)
          .unionByName(batch.groupBy("event_type", "h").agg(count(lit(1)).as("cnt")))
          .groupBy("event_type", "h").agg(sum("cnt").as("cnt")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val hc = store.version(lastBatchId(srcDir))
      .select(col("event_type"), col("h"), col("cnt").cast("long").as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    hc.select(col("event_type"), col("h").cast("string").as("hr"), col("cnt"),
        round((col("cnt") - avg("cnt").over(w))
          / when(stddev_samp(col("cnt")).over(w) > 0, stddev_samp(col("cnt")).over(w)), 3)
          .as("z"),
        (count(lit(1)).over(w) === 24).as("warm"))
      .select(col("event_type"), col("hr"), col("cnt"),
        when(col("warm"), col("z")).as("z"),
        (col("warm") && abs(coalesce(when(col("warm"), col("z")), lit(0.0))) >= 2.0)
          .as("anomaly"))
      .orderBy("event_type", "hr")
  }

  /** The batch alert query's oracle verbatim — the merged metric store
    * must reproduce the one-shot hourly counts exactly.
    */
  val streamAnomalySql: String = AnalyticsQueries.evtAnomalySql

  /** Streaming behavior-flow transitions — the continuity-state form of
    * [[AnalyticsQueries.evtTransitions]]: events arrive as 3
    * TIME-ORDERED micro-batches (day ranges, so per-user order across
    * batches holds — the file-source analog of watermark order); the
    * state is each user's LAST event (the streaming lag/lead carry,
    * a per-key last-value store — a different shape from the
    * count-merge stores), so the boundary transition between a user's
    * last event of batch b−1 and first of batch b is counted exactly
    * once. Counts sum-merge; the oracle is the batch transition
    * matrix verbatim.
    */
  def streamTransitions(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val srcDir = stageBatchFiles(dir, "str", daySplits(ev, col("ts"), 3))
    val countStore = graft.streaming.VersionedStore(s, freshDir(dir, "str_store_c"))
    val lastStore = graft.streaming.VersionedStore(s, freshDir(dir, "str_store_l"))
    countStore.init(s.range(0).select(col("id").cast("string").as("from_type"),
      col("id").cast("string").as("to_type"), col("id").as("n")))
    lastStore.init(ev.limit(0))
    val batches = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorC = countStore.prior(batchId)
        val priorL = lastStore.prior(batchId)
        // prior last-events join the sequence so each boundary pair
        // counts exactly once; they have no predecessor in this batch
        val all = batch.unionByName(priorL).localCheckpoint(eager = false)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val trans = all
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        inParallel(
          () => countStore.write(batchId, priorC.unionByName(trans)
            .groupBy("from_type", "to_type").agg(sum("n").as("n"))),
          () => lastStore.write(batchId, all
            .groupBy("user_id")
            .agg(expr("max_by(struct(ts, event_id, event_type), struct(ts, event_id))").as("m"))
            .select(col("user_id"), col("m.ts").as("ts"),
              col("m.event_id").as("event_id"), col("m.event_type").as("event_type"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    countStore.version(lastBatchId(srcDir))
      .withColumn("n", col("n").cast("long"))
      .withColumn("p", round(col("n").cast("double")
        / sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  /** The batch transition matrix verbatim — boundary transitions must
    * be counted exactly once across the batch split.
    */
  val streamTransitionsSql: String = AnalyticsQueries.evtTransitionsSql

  /** Streaming trigram path mining — the 2-deep continuity extension
    * of [[streamTransitions]]'s last-event state: the store carries
    * each user's last TWO events, so every boundary-spanning trigram
    * is completed exactly once (a carried row's trigram was not
    * countable before — its r+2 successor had not arrived — and rows
    * whose trigram WAS counted are never carried). Counts sum-merge;
    * state is ≤2 rows per user. Oracle = the batch top-25 journey
    * query verbatim.
    */
  def streamPaths(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val srcDir = stageBatchFiles(dir, "spath", daySplits(ev, col("ts"), 3))
    val countStore = graft.streaming.VersionedStore(s, freshDir(dir, "spath_store_c"))
    val lastStore = graft.streaming.VersionedStore(s, freshDir(dir, "spath_store_l"))
    countStore.init(s.range(0).select(col("id").cast("string").as("path"), col("id").as("n")))
    lastStore.init(ev.limit(0))
    val batches = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorC = countStore.prior(batchId)
        val priorL = lastStore.prior(batchId)
        val all = batch.unionByName(priorL).localCheckpoint(eager = false)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val tri = all
          .withColumn("t2", lead("event_type", 1).over(w))
          .withColumn("t3", lead("event_type", 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
          .agg(count(lit(1)).as("n"))
        val wDesc = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        inParallel(
          () => countStore.write(batchId, priorC.unionByName(tri)
            .groupBy("path").agg(sum("n").as("n"))),
          () => lastStore.write(batchId, all
            .withColumn("rn", row_number().over(wDesc))
            .filter(col("rn") <= 2).drop("rn")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    countStore.version(lastBatchId(srcDir))
      .orderBy(col("n").desc, col("path"))
      .limit(25)
      .select(col("path"), col("n").cast("long").as("n"))
  }

  /** The batch top-25 trigram journeys verbatim — boundary-spanning
    * paths must count exactly once across the split.
    */
  val streamPathsSql: String = AnalyticsQueries.evtPathsSql

  /** Streaming step funnel — the conditional-min chain as MONOTONE
    * per-user state: (t1, t2, t3) = first view / first click after t1 /
    * first purchase after t2, each min-merged per batch (under
    * time-ordered arrival an earlier-set milestone can never move, and
    * a later batch can only fill the next missing step). The final
    * conversion table derives from the state alone; oracle = the batch
    * funnel verbatim.
    */
  def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .filter(col("event_type").isin("view", "click", "purchase"))
    val srcDir = stageBatchFiles(dir, "sfun", daySplits(ev, col("ts"), 3))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sfun_store"))
    store.init(s.range(0).select(col("id").as("user_id"),
      lit(null).cast("timestamp").as("t1"), lit(null).cast("timestamp").as("t2"),
      lit(null).cast("timestamp").as("t3")))
    val batches = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    def mergeMin(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      coalesce(least(a, b), a, b)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = store.prior(batchId)
        val bt = batch.localCheckpoint(eager = false)
        val pv = bt.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("bv"))
        val m1 = prior.join(pv, Seq("user_id"), "full")
          .select(col("user_id"), mergeMin(col("t1"), col("bv")).as("t1"),
            col("t2"), col("t3")).localCheckpoint(eager = false)
        val pc = bt.filter(col("event_type") === "click")
          .join(m1.filter(col("t1").isNotNull).select("user_id", "t1"), "user_id")
          .filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("bc"))
        val m2 = m1.join(pc, Seq("user_id"), "left")
          .select(col("user_id"), col("t1"), mergeMin(col("t2"), col("bc")).as("t2"),
            col("t3")).localCheckpoint(eager = false)
        val pp = bt.filter(col("event_type") === "purchase")
          .join(m2.filter(col("t2").isNotNull).select("user_id", "t2"), "user_id")
          .filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("bp"))
        store.write(batchId, m2.join(pp, Seq("user_id"), "left")
          .select(col("user_id"), col("t1"), col("t2"),
            mergeMin(col("t3"), col("bp")).as("t3")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val st = store.version(lastBatchId(srcDir))
    val counts = st.agg(count(col("t1")).as("n"))
      .select(lit(1).as("step"), lit("view").as("name"), col("n"))
      .unionAll(st.agg(count(col("t2")).as("n"))
        .select(lit(2).as("step"), lit("click").as("name"), col("n")))
      .unionAll(st.agg(count(col("t3")).as("n"))
        .select(lit(3).as("step"), lit("purchase").as("name"), col("n")))
    val w = org.apache.spark.sql.expressions.Window.orderBy("step")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val base = coalesce(last("n").over(w), col("n"))
    counts
      .withColumn("conv", when(base > 0, round(col("n") / base, 4)))
      .orderBy("step")
  }

  /** The batch funnel verbatim. */
  val streamFunnelSql: String = AnalyticsQueries.evtFunnelSql

  /** Streaming last-touch attribution — the carry-forward state form
    * of [[AnalyticsQueries.evtAttribution]]: the state is each user's
    * most recent NON-purchase event (their open marketing touch);
    * each batch's purchases credit the carry-forward (or 'direct'),
    * per-channel revenue sum-merges, and the touch store advances to
    * the batch's latest non-purchase event. Prior touches join the
    * sequence with their original timestamps, so in-batch touches
    * override them exactly as the batch window would. Oracle = the
    * batch attribution verbatim.
    */
  def streamAttribution(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val srcDir = stageBatchFiles(dir, "satt", daySplits(ev, col("ts"), 3))
    val revStore = graft.streaming.VersionedStore(s, freshDir(dir, "satt_store_r"))
    val touchStore = graft.streaming.VersionedStore(s, freshDir(dir, "satt_store_t"))
    revStore.init(s.range(0).select(col("id").cast("string").as("channel"),
      col("id").as("n_purchases"), col("id").cast("double").as("revenue")))
    touchStore.init(ev.limit(0))
    val batches = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorR = revStore.prior(batchId)
        val priorT = touchStore.prior(batchId)
        val all = batch.withColumn("carry", lit(false))
          .unionByName(priorT.withColumn("carry", lit(true)))
          .localCheckpoint(eager = false)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val credited = all
          .withColumn("channel", coalesce(
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w),
            lit("direct")))
          .filter(!col("carry") && col("event_type") === "purchase")
          .groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"), sum("value").as("revenue"))
        inParallel(
          () => revStore.write(batchId, priorR.unionByName(credited)
            .groupBy("channel")
            .agg(sum("n_purchases").as("n_purchases"), sum("revenue").as("revenue"))),
          () => touchStore.write(batchId, all
            .filter(col("event_type") =!= "purchase")
            .groupBy("user_id")
            .agg(expr("max_by(struct(ts, event_id, event_type, value), struct(ts, event_id))").as("m"))
            .select(col("user_id"), col("m.ts").as("ts"), col("m.event_id").as("event_id"),
              col("m.event_type").as("event_type"), col("m.value").as("value"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    revStore.version(lastBatchId(srcDir))
      .select(col("channel"), col("n_purchases").cast("long").as("n_purchases"),
        round(col("revenue"), 2).as("revenue"))
      .orderBy("channel")
  }

  /** The batch last-touch attribution verbatim. */
  val streamAttributionSql: String = AnalyticsQueries.evtAttributionSql

  /** Streaming cohort retention — two state shapes compose: each
    * user's FIRST active day (min-merge; with time-ordered batches the
    * first sighting IS the cohort) and the set of (user, week_offset)
    * pairs already counted (the exact-distinct store, so a user active
    * twice in one week across batches counts once). The final
    * (cohort, week) matrix aggregates the pair store against the
    * cohort table; oracle = the batch retention query verbatim.
    */
  def streamRetention(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val srcDir = stageBatchFiles(dir, "sret", daySplits(days, col("d"), 3))
    val firstStore = graft.streaming.VersionedStore(s, freshDir(dir, "sret_store_f"))
    val pairStore = graft.streaming.VersionedStore(s, freshDir(dir, "sret_store_p"))
    firstStore.init(s.range(0).select(col("id").as("user_id"),
      lit(null).cast("date").as("d0")))
    pairStore.init(s.range(0).select(col("id").as("user_id"), col("id").as("week_offset")))
    val batches = s.readStream.schema(days.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorF = firstStore.prior(batchId)
        val priorP = pairStore.prior(batchId)
        // cohort = stored first day, else the batch's own min (a user's
        // first-ever sighting, since batches arrive in time order)
        val firsts = priorF
          .unionByName(batch.groupBy("user_id").agg(min("d").as("d0")))
          .groupBy("user_id").agg(min("d0").as("d0"))
          .localCheckpoint(eager = false)
        val pairs = batch.join(firsts, "user_id")
          .select(col("user_id"),
            expr("datediff(d, d0) div 7").as("week_offset"))
        inParallel(
          () => pairStore.write(batchId, priorP.unionByName(pairs).distinct()),
          () => firstStore.write(batchId, firsts))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    pairStore.version(lastBatchId(srcDir))
      .join(firstStore.version(lastBatchId(srcDir)), "user_id")
      .groupBy(col("d0").cast("string").as("cohort_start"),
        col("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_start", "week_offset")
  }

  /** The batch cohort-retention query verbatim. */
  val streamRetentionSql: String = AnalyticsQueries.evtRetentionSql

  /** Streaming growth accounting — the continuity-state form of
    * [[AnalyticsQueries.evtGrowth]]: day-range batches arrive in
    * order; the state is each user's last active day, so every
    * arrival classifies as new / retained / resurrected against it,
    * and a CHURN event lands on prev+1 the moment a gap becomes
    * visible (either an arrival after a gap, or the END-OF-STREAM
    * flush — the batch analog of the event-time timer that closes
    * quiet keys' sessions). Per-day state counts sum-merge; the
    * oracle is the batch decomposition verbatim, so the split into
    * batches and the deferred churn emission must be invisible.
    */
  def streamGrowth(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val srcDir = stageBatchFiles(dir, "sgr", daySplits(days, col("d"), 3))
    val lastBatch = lastBatchId(srcDir)
    val countStore = graft.streaming.VersionedStore(s, freshDir(dir, "sgr_store_c"))
    val lastStore = graft.streaming.VersionedStore(s, freshDir(dir, "sgr_store_l"))
    countStore.init(s.range(0).select(lit(null).cast("date").as("day"),
      col("id").cast("string").as("state"), col("id").as("n")))
    lastStore.init(days.limit(0))
    val batches = s.readStream.schema(days.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorC = countStore.prior(batchId)
        val priorL = lastStore.prior(batchId)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("d")
        // prior last-day joins the per-user sequence (flagged so it does
        // not re-classify itself) — each arrival sees its true prev
        val all = batch.withColumn("carry", lit(false))
          .unionByName(priorL.withColumn("carry", lit(true)))
          .localCheckpoint(eager = false)
        val seq0 = all.withColumn("prev", lag("d", 1).over(w))
        val states = seq0.filter(!col("carry"))
          .select(col("d").as("day"),
            when(col("prev").isNull, "new_users")
              .when(datediff(col("d"), col("prev")) === 1, "retained")
              .otherwise("resurrected").as("state"))
        // churn surfaces at prev+1 the moment an arrival exposes a gap
        val churnSeen = seq0.filter(!col("carry") && col("prev").isNotNull
            && datediff(col("d"), col("prev")) > 1)
          .select(date_add(col("prev"), 1).as("day"), lit("churned").as("state"))
        val newLast = all.groupBy("user_id").agg(max("d").as("d")).localCheckpoint(eager = false)
        // end-of-stream flush: every user churns the day after their
        // final activity (the batch query's `nxt IS NULL` leg)
        val churnFlush =
          if (batchId == lastBatch)
            newLast.select(date_add(col("d"), 1).as("day"), lit("churned").as("state"))
          else s.range(0).select(lit(null).cast("date").as("day"),
            col("id").cast("string").as("state"))
        val delta = states.unionByName(churnSeen).unionByName(churnFlush)
          .groupBy("day", "state").agg(count(lit(1)).as("n"))
        inParallel(
          () => countStore.write(batchId, priorC.unionByName(delta)
            .groupBy("day", "state").agg(sum("n").as("n"))),
          () => lastStore.write(batchId, newLast))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    countStore.version(lastBatchId(srcDir))
      .groupBy("day")
      .pivot("state", Seq("new_users", "retained", "resurrected", "churned"))
      .agg(coalesce(sum("n"), lit(0L)))
      .select(col("day").cast("string").as("day"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        coalesce(col("resurrected"), lit(0L)).as("resurrected"),
        coalesce(col("churned"), lit(0L)).as("churned"))
      .orderBy("day")
  }

  /** The batch growth decomposition verbatim — batch splits and
    * deferred churn emission must be invisible.
    */
  val streamGrowthSql: String = AnalyticsQueries.evtGrowthSql

  /** Streaming data-quality monitor — the cumulative form of
    * [[PipelineQueries.docExpect]]'s expectation gate: documents arrive
    * as 3 micro-batches; row-rule violation counts SUM-MERGE into a
    * tiny per-rule report store (the simplest member of the windowable
    * sketch algebra), while EXACT uniqueness keeps the seen-key set as
    * its state (the honest cost of exactness — swap in the Bloom store
    * when probabilistic membership suffices) and counts each batch's
    * in-batch excess plus its distinct collisions with already-seen
    * keys. Re-crawl duplicates (doc_id % 25 == 3, appended to the LAST
    * batch) exercise the cross-batch collision path; the oracle is the
    * ONE-SHOT batch gate over the same corpus-with-duplicates, so
    * incremental must equal one-shot.
    */
  /** Streaming incremental EXACT-substring dedup — the maintainer
    * counterpart of `q_doc_substr_spans` (same posture as the
    * incremental MinHash band index): documents arrive as 3
    * micro-batches; each batch computes its own rolling-hash window
    * table ONCE (the increment, never the corpus) and appends it to the
    * persisted window index; the per-window df store sum-merges the
    * batch's hash counts. Span extraction is one final read: probe the
    * window index against the final hot set (df ≥ 2) and island-merge —
    * arrival-order-invariant by construction, so the oracle is the
    * batch md5 pipeline VERBATIM (the rolling hash marks identical
    * windows identically).
    */
  def streamSubstr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val minLen = 40
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "ssub",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val winStore = freshDir(dir, "ssub_wins")
    val dfStore = graft.streaming.VersionedStore(s, freshDir(dir, "ssub_store"))
    dfStore.init(s.range(0).select(col("id").as("h"), col("id").as("c")))
    graft.BenchMeters.fixture {
      s.range(0).select(col("id").as("doc_id"), col("id").cast("int").as("pos"),
        col("id").as("h")).write.mode("overwrite").parquet(winStore)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val hashes = ColumnBridge.column(graft.functions.RollingWindowHashes(
          ColumnBridge.expression(col("text")), minLen))
        // increment-only work: the batch's windows, computed once
        val wins = batch.filter(length(col("text")) >= minLen)
          .select(col("doc_id"), posexplode(hashes).as(Seq("pos", "h")))
          .localCheckpoint(eager = false)
        inParallel(
          () => wins.coalesce(1).write.mode("append").parquet(winStore),
          () => dfStore.write(batchId, dfStore.prior(batchId)
            .unionByName(wins.groupBy("h").agg(count(lit(1)).as("c")))
            .groupBy("h").agg(sum("c").as("c"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // final read: probe the persisted index against the final hot set
    val hot = dfStore.version(lastBatchId(srcDir))
      .filter(col("c") >= 2).select("h")
    val dup = s.read.parquet(winStore).join(hot, "h").select("doc_id", "pos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    dup
      .withColumn("pme", max(col("pos") + minLen)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("ni", (col("pme").isNull || col("pos") > col("pme")).cast("int"))
      .withColumn("isl", sum("ni").over(w))
      .groupBy("doc_id", "isl")
      .agg(min("pos").as("span_start"), (max(col("pos")) + minLen).as("span_end"))
      .select(col("doc_id"), col("span_start").cast("long"), col("span_end").cast("long"))
      .orderBy("doc_id", "span_start")
  }

  /** The batch exact-substring oracle verbatim — incremental index
    * maintenance must be arrival-order-invisible.
    */
  val streamSubstrSql: String = PipelineQueries.docSubstrSpansSql

  /** The CDC replays fold per batch then merge, which equals the
    * one-shot fold only if the log offset is MONOTONE across the staged
    * batches (batch i's offsets all precede batch i+1's). The fixture
    * satisfies it (event ids are assigned in timestamp order and the
    * splits are time-ranged) — but that is a FIXTURE invariant, so
    * assert it at staging instead of documenting it away: a regenerated
    * fixture that breaks it must fail loudly here, not hash-mismatch
    * downstream.
    */
  private def requireOffsetMonotone(s: SparkSession, srcDir: String, seqCol: String): Unit =
    graft.BenchMeters.fixture {
      val bounds = (0L to lastBatchId(srcDir)).map { b =>
        val r = s.read.parquet(s"$srcDir/b$b.parquet")
          .agg(min(col(seqCol)), max(col(seqCol))).head()
        (if (r.isNullAt(0)) Long.MinValue else r.getLong(0),
          if (r.isNullAt(1)) Long.MinValue else r.getLong(1))
      }
      bounds.sliding(2).foreach {
        case Seq((_, hi), (lo, _)) =>
          require(hi < lo || lo == Long.MinValue,
            s"staged CDC batches are not offset-monotone: max $hi >= next min $lo " +
              "(per-batch fold + merge no longer equals the one-shot fold)")
        case _ => ()
      }
    }

  /** Changelog-SOURCE ingestion (ref: StreamTableEnvironment
    * .fromChangelogStream + RowKind.java — SURVEY §7 hard part #1): a
    * kind-tagged CDC log (`+I -U +U -D`, offset = event_id, which the
    * fixture assigns in timestamp order — asserted by the shared
    * daySplits batches being offset-monotone) arrives as 3 time-split
    * micro-batches; each batch FOLDS into the keyed materialized table
    * ([[graft.streaming.Changelog.foldCdc]]: last op per key wins,
    * delete on `-D`/`-U`, upsert otherwise). The oracle is the one-shot
    * fold of the whole log — per-batch folding + cross-batch merge must
    * be associative, which is the property that makes CDC ingestion
    * split-invariant.
    */
  def streamCdc(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val log = ev.select(
      when(col("event_id") % 13 === 0, graft.streaming.Changelog.Delete)
        .when(col("event_id") % 13 === 1, graft.streaming.Changelog.UpdateBefore)
        .when(col("event_id") % 13 < 7, graft.streaming.Changelog.UpdateAfter)
        .otherwise(graft.streaming.Changelog.Insert).as("kind"),
      col("event_id").as("seq"), col("user_id"),
      round(col("value"), 2).as("value"), col("ts"))
    val srcDir = stageBatchFiles(dir, "scdc",
      daySplits(log, col("ts"), 3).map(_.drop("ts")))
    requireOffsetMonotone(s, srcDir, "seq")
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "scdc_store"))
    store.init(s.range(0).select(col("id").as("user_id"),
      col("id").cast("double").as("value")))
    val batches = s.readStream
      .schema(StructType(Seq(StructField("kind", StringType),
        StructField("seq", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, graft.streaming.Changelog.foldCdc(
          store.prior(batchId), batch, "user_id", "seq", "kind"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store.version(lastBatchId(srcDir)).orderBy("user_id")
  }

  /** The one-shot fold of the same log: last op per key (by offset),
    * present iff it asserts presence.
    */
  val streamCdcSql: String =
    Tables.eventsCte +
      """
        |, log AS (SELECT event_id AS seq, user_id, round(value, 2) AS value,
        |    CASE WHEN event_id % 13 = 0 THEN '-D'
        |         WHEN event_id % 13 = 1 THEN '-U'
        |         WHEN event_id % 13 < 7 THEN '+U' ELSE '+I' END AS kind
        |  FROM ev),
        |last AS (SELECT user_id, max_by(kind, seq) AS kind, max_by(value, seq) AS value
        |         FROM log GROUP BY 1)
        |SELECT user_id, value FROM last WHERE kind IN ('+I', '+U')
        |ORDER BY user_id""".stripMargin

  /** Retract-AWARE aggregation over a changelog source (ref: the
    * reference's AggregateFunction.retract() hook — needed exactly when
    * the input is a changelog, SURVEY §2.10/§7: a `-D` must SUBTRACT
    * from the running sum). Spark has no retract hook; the equivalent
    * posture is aggregating the MATERIALIZED CDC table per batch — the
    * fold absorbs inserts/updates/deletes, so the aggregate is always
    * retract-correct by construction. Emission: (batch, n_users, total)
    * after each CDC batch; the oracle folds every prefix of the same
    * log and aggregates it.
    */
  def streamCdcAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val log = ev.select(
      when(col("event_id") % 13 === 0, graft.streaming.Changelog.Delete)
        .when(col("event_id") % 13 === 1, graft.streaming.Changelog.UpdateBefore)
        .when(col("event_id") % 13 < 7, graft.streaming.Changelog.UpdateAfter)
        .otherwise(graft.streaming.Changelog.Insert).as("kind"),
      col("event_id").as("seq"), col("user_id"),
      round(col("value"), 2).as("value"), col("ts"))
    val srcDir = stageBatchFiles(dir, "scag",
      daySplits(log, col("ts"), 3).map(_.drop("ts")))
    requireOffsetMonotone(s, srcDir, "seq")
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "scag_store"))
    store.init(s.range(0).select(col("id").as("user_id"),
      col("id").cast("double").as("value")))
    val resDir = freshDir(dir, "scag_res")
    graft.BenchMeters.fixture {
      s.range(0).select(lit(0L).as("batch"), col("id").as("n_users"),
        col("id").cast("double").as("total"))
        .write.mode("overwrite").parquet(resDir)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("kind", StringType),
        StructField("seq", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cur = graft.streaming.Changelog.foldCdc(
          store.prior(batchId), batch, "user_id", "seq", "kind")
          .localCheckpoint(eager = false)
        inParallel(
          () => cur.agg(count(lit(1)).as("n_users"), round(sum("value"), 2).as("total"))
            .select(lit(batchId).as("batch"), col("n_users"), col("total"))
            .coalesce(1).write.mode("append").parquet(resDir),
          () => store.write(batchId, cur))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(resDir).orderBy("batch")
  }

  /** Aggregate of every prefix fold of the same CDC log. */
  val streamCdcAggSql: String =
    Tables.eventsCte +
      """
        |, bounds AS (SELECT min(CAST(ts AS DATE)) AS d0,
        |    ((datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1 + 2) // 3) AS w
        |  FROM ev),
        |log AS (SELECT event_id AS seq, user_id, round(value, 2) AS value,
        |    CASE WHEN event_id % 13 = 0 THEN '-D'
        |         WHEN event_id % 13 = 1 THEN '-U'
        |         WHEN event_id % 13 < 7 THEN '+U' ELSE '+I' END AS kind,
        |    least(datediff('day', (SELECT d0 FROM bounds), CAST(ts AS DATE))
        |          // greatest((SELECT w FROM bounds), 1), 2) AS b
        |  FROM ev),
        |pre AS (SELECT bb.b, user_id, max_by(kind, seq) AS kind,
        |    max_by(value, seq) AS value
        |  FROM log JOIN (VALUES (0), (1), (2)) AS bb(b) ON log.b <= bb.b
        |  GROUP BY 1, 2)
        |SELECT b::BIGINT AS batch, count(*) FILTER (kind IN ('+I', '+U'))::BIGINT AS n_users,
        |  round(sum(value) FILTER (kind IN ('+I', '+U')), 2) AS total
        |FROM pre GROUP BY 1 ORDER BY batch""".stripMargin

  /** RETRACT-stream emission (ref: toRetractStream / GroupAggFunction's
    * `+I -U +U` output — the survey's "retract emission differs" row
    * made first-class): a per-user streaming count maintains its
    * snapshot per batch, and [[graft.streaming.Changelog.retractDiff]]
    * emits the kind-tagged delta rows between consecutive snapshots —
    * `+I` the first time a key appears, the `-U old / +U new` PAIR when
    * its count changes. The full ordered change LOG is the query
    * output, and the oracle recomputes it from the cumulative per-batch
    * prefix counts — so a missing retraction, a wrong old-value, or an
    * extra emission all break the hash.
    */
  def streamRetract(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val srcDir = stageBatchFiles(dir, "srtr",
      daySplits(ev, col("ts"), 3).map(_.drop("ts")))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "srtr_store"))
    store.init(s.range(0).select(col("id").as("user_id"), col("id").as("cnt")))
    val resDir = freshDir(dir, "srtr_res")
    graft.BenchMeters.fixture {
      s.range(0).select(lit(0L).as("batch"), lit("").as("kind"),
        col("id").as("user_id"), col("id").as("cnt"))
        .write.mode("overwrite").parquet(resDir)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("user_id", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = store.prior(batchId).localCheckpoint(eager = false)
        val cur = prior
          .unionByName(batch.groupBy("user_id").agg(count(lit(1)).as("cnt")))
          .groupBy("user_id").agg(sum("cnt").as("cnt"))
          .localCheckpoint(eager = false)
        inParallel(
          () => graft.streaming.Changelog.retractDiff(prior, cur, "user_id")
            .select(lit(batchId).as("batch"), col("kind"), col("user_id"), col("cnt"))
            .coalesce(1).write.mode("append").parquet(resDir),
          () => store.write(batchId, cur))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(resDir).orderBy("batch", "user_id", "kind")
  }

  /** The change log recomputed from cumulative prefix counts over the
    * same derived day-batch boundaries.
    */
  val streamRetractSql: String =
    Tables.eventsCte +
      """
        |, bounds AS (SELECT min(CAST(ts AS DATE)) AS d0,
        |    ((datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1 + 2) // 3) AS w
        |  FROM ev),
        |d AS (SELECT user_id,
        |    least(datediff('day', (SELECT d0 FROM bounds), CAST(ts AS DATE))
        |          // greatest((SELECT w FROM bounds), 1), 2) AS b
        |  FROM ev),
        |hits AS (SELECT user_id, b, count(*) AS n FROM d GROUP BY 1, 2),
        |cum AS (SELECT user_id, b, sum(n) OVER (PARTITION BY user_id ORDER BY b) AS cnt
        |        FROM hits),
        |ch AS (SELECT user_id, b, cnt,
        |         lag(cnt) OVER (PARTITION BY user_id ORDER BY b) AS prev FROM cum)
        |SELECT b::BIGINT AS batch, '+I' AS kind, user_id, cnt::BIGINT AS cnt
        |  FROM ch WHERE prev IS NULL
        |UNION ALL
        |SELECT b::BIGINT, '-U', user_id, prev::BIGINT FROM ch WHERE prev IS NOT NULL
        |UNION ALL
        |SELECT b::BIGINT, '+U', user_id, cnt::BIGINT FROM ch WHERE prev IS NOT NULL
        |ORDER BY batch, user_id, kind""".stripMargin

  /** RETRACTABLE streaming top-N (ref: RetractableTopNFunction.java:440
    * — the survey's "hard" §2.8 variant: the ranked SCORE is itself an
    * update stream, so a user's old score must be retracted from the
    * ranking, not just superseded): the score is each user's LAST event
    * value per event_type — genuinely non-monotone, it moves down as
    * often as up. Per batch: the last-value table merges (max_by over
    * the log offset), [[graft.streaming.Changelog.retractDiff]] derives
    * the changed keys, and ONLY changed event_types re-rank — the
    * reference's touch-changed-keys-only discipline; state is the full
    * (type, user) score table, exactly the reference's sorted-map state
    * size. Emission: the refreshed top-3 per changed type per batch;
    * the oracle rebuilds every batch's prefix last-value table, change
    * set, and ranking.
    */
  def streamTopnRetract(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), col("value"),
        col("event_id").as("seq"), col("ts"))
    val srcDir = stageBatchFiles(dir, "strn",
      daySplits(ev, col("ts"), 3).map(_.drop("ts")))
    requireOffsetMonotone(s, srcDir, "seq")
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "strn_store"))
    store.init(s.range(0).select(col("id").cast("string").as("event_type"),
      col("id").as("user_id"), col("id").cast("double").as("score"),
      col("id").as("seq")))
    val resDir = freshDir(dir, "strn_res")
    graft.BenchMeters.fixture {
      s.range(0).select(lit(0L).as("batch"), col("id").cast("string").as("event_type"),
        col("id").as("rank"), col("id").as("user_id"), col("id").cast("double").as("score"))
        .write.mode("overwrite").parquet(resDir)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("event_type", StringType),
        StructField("user_id", LongType), StructField("value", DoubleType),
        StructField("seq", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = store.prior(batchId).localCheckpoint(eager = false)
        // last value per (type, user): max_by over the offset, merged
        // against the prior table the same way (associative)
        val cur = prior
          .unionByName(batch.select(col("event_type"), col("user_id"),
            col("value").as("score"), col("seq")))
          .groupBy("event_type", "user_id")
          .agg(max_by(struct(col("score"), col("seq")), col("seq")).as("m"))
          .select(col("event_type"), col("user_id"),
            col("m.score").as("score"), col("m.seq").as("seq"))
          .localCheckpoint(eager = false)
        // retraction-aware: only types whose (user, score) set changed
        // re-rank — the ranking state of untouched keys is never read
        val changedTypes = graft.streaming.Changelog
          .retractDiff(prior.drop("seq"), cur.drop("seq"), Seq("event_type", "user_id"))
          .select("event_type").distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("score").desc, col("user_id"))
        inParallel(
          () => cur.join(changedTypes, "event_type")
            .withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 3)
            .select(lit(batchId).as("batch"), col("event_type"),
              col("rank").cast("long"), col("user_id"), col("score"))
            .coalesce(1).write.mode("append").parquet(resDir),
          () => store.write(batchId, cur))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(resDir)
      .select(col("batch"), col("event_type"), col("rank"), col("user_id"),
        round(col("score"), 2).as("score"))
      .orderBy("batch", "event_type", "rank")
  }

  /** Every batch's prefix last-value table, change set, and top-3
    * reconstructed over the same derived day-batch boundaries.
    */
  val streamTopnRetractSql: String =
    Tables.eventsCte +
      """
        |, bounds AS (SELECT min(CAST(ts AS DATE)) AS d0,
        |    ((datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1 + 2) // 3) AS w
        |  FROM ev),
        |e2 AS (SELECT event_type, user_id, value, event_id AS seq,
        |    least(datediff('day', (SELECT d0 FROM bounds), CAST(ts AS DATE))
        |          // greatest((SELECT w FROM bounds), 1), 2) AS b
        |  FROM ev),
        |pre AS (SELECT bb.b, event_type, user_id,
        |    max_by(value, seq) AS score
        |  FROM e2 JOIN (VALUES (0), (1), (2)) AS bb(b) ON e2.b <= bb.b
        |  GROUP BY 1, 2, 3),
        |ch AS (SELECT b, event_type, user_id, score,
        |    lag(score) OVER (PARTITION BY event_type, user_id ORDER BY b) AS prev
        |  FROM pre),
        |changed AS (SELECT DISTINCT b, event_type FROM ch
        |            WHERE prev IS NULL OR score <> prev),
        |ranked AS (SELECT pre.b, pre.event_type, user_id, score,
        |    row_number() OVER (PARTITION BY pre.b, pre.event_type
        |                       ORDER BY score DESC, user_id) AS rnk
        |  FROM pre JOIN changed ON pre.b = changed.b AND pre.event_type = changed.event_type)
        |SELECT b::BIGINT AS batch, event_type, rnk::BIGINT AS rank, user_id,
        |  round(score, 2) AS score
        |FROM ranked WHERE rnk <= 3
        |ORDER BY batch, event_type, rank""".stripMargin

  /** Streaming OLS — the sufficient-statistics regression
    * ([[AnalyticsQueries.evtOls]]) maintained incrementally: the 10
    * statistics are PURELY ADDITIVE, so state is literally ONE row
    * summed per batch, and the end-of-stream Cramer solve must equal
    * the batch fit over everything ingested (oracle = the batch OLS
    * SQL verbatim). The sufficient-statistics model family's whole
    * point at scale: training state that merges like a counter.
    */
  /** Shapley attribution maintained on a stream
    * ([[AnalyticsQueries.evtShapley]] as a live credit monitor): state
    * = the per-user journey table (conv flag + touched channel set
    * BEFORE the first purchase). Day-split batches arrive in time
    * order, so the journey folds: an unconverted user's set
    * array_unions the batch's pre-first-purchase touches and freezes
    * the moment a purchase appears (within a batch, the first
    * purchase's (ts, event_id) bounds which touches count); a
    * converted user's row passes through untouched. The end-of-stream
    * solve runs the shared bounded coalition algebra, so the batch
    * oracle pins fold ≡ whole-corpus-window exactly. State is one row
    * per user — the dimension table, not the event volume.
    */
  def streamShapley(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val srcDir = stageBatchFiles(dir, "sshap", daySplits(ev, col("ts"), 3))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sshap_store"))
    store.init(AQ.shapleyJourneys(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = store.prior(batchId)
        val inc = AQ.shapleyJourneys(batch)
        store.write(batchId,
          prior.select(col("user_id"), col("conv").as("pc"), col("touched").as("pt"))
            .join(inc.select(col("user_id"), col("conv").as("ic"), col("touched").as("it")),
              Seq("user_id"), "full_outer")
            .select(col("user_id"),
              greatest(coalesce(col("pc"), lit(0L)), coalesce(col("ic"), lit(0L))).as("conv"),
              when(coalesce(col("pc"), lit(0L)) === 1L, col("pt"))
                .otherwise(array_sort(array_union(
                  coalesce(col("pt"), array().cast("array<string>")),
                  coalesce(col("it"), array().cast("array<string>")))))
                .as("touched")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.shapleySolve(s, store.version(lastBatchId(srcDir)))
  }

  /** k-anonymity audit maintained on a stream
    * ([[AnalyticsQueries.evtKanon]] as a continuous privacy gate —
    * the QI classes shift as profiles accrue, so the release gate
    * must re-audit per increment): two ADDITIVE state tables — per
    * (user, type) counts (key-sum merge) and per (user, day) presence
    * (distinct-union merge) — and the end-of-stream audit runs the
    * shared QI/class tail. Both stores are dimension-bounded
    * (|users|·|types| and |users|·|days| rows); equality with the
    * batch oracle is by construction.
    */
  def streamKanon(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "skanon",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    def tcOf(df: DataFrame): DataFrame =
      df.select(col("user_id"), col("event_type"))
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    def daysOf(df: DataFrame): DataFrame =
      df.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val tcStore = graft.streaming.VersionedStore(s, freshDir(dir, "skanon_tc"))
    val dayStore = graft.streaming.VersionedStore(s, freshDir(dir, "skanon_days"))
    tcStore.init(tcOf(ev.limit(0)))
    dayStore.init(daysOf(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        inParallel(
          () => tcStore.write(batchId,
            tcStore.prior(batchId).unionByName(tcOf(batch))
              .groupBy("user_id", "event_type").agg(sum("cnt").as("cnt"))),
          () => dayStore.write(batchId,
            dayStore.prior(batchId).unionByName(daysOf(batch)).distinct()))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.kanonSolve(tcStore.version(lastBatchId(srcDir)),
      dayStore.version(lastBatchId(srcDir)))
  }

  /** Seasonal decomposition maintained on a stream
    * ([[AnalyticsQueries.evtStl]] as a continuously-refreshed
    * trend/seasonal/residual monitor): state = the ADDITIVE
    * (event_type, day, cnt) grid, key-sum merged per batch — the
    * [[streamAnomaly]] hour-grid contract at the daily grain, so
    * batches may split ARBITRARILY (no time-order assumption; counts
    * commute). The end-of-stream solve runs the shared decomposition
    * tail; the batch oracle pins merge ≡ one-shot exactly. State is
    * ≤ |types|·|days| rows — the report grid itself.
    */
  /** Shared additive daily-grid maintainer: stage the 3-batch %3
    * split, key-sum merge the (event_type, day) counts per batch on a
    * VersionedStore, return the end-of-stream grid. The whole-sequence
    * solvers (STL, Holt–Winters, bursts) all feed from this ONE loop —
    * a merge-posture fix lands in every family member (r10 review:
    * was three verbatim copies).
    */
  private def maintainDailyGrid(s: SparkSession, dir: String, name: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, name,
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    def dailyOf(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, s"${name}_store"))
    store.init(dailyOf(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(dailyOf(batch))
          .groupBy("event_type", "d").agg(sum("cnt").as("cnt")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store.version(lastBatchId(srcDir))
      .select(col("event_type"), col("d"), col("cnt").cast("long").as("cnt"))
  }

  def streamStl(s: SparkSession, dir: String): DataFrame =
    AnalyticsQueries.stlFromDaily(maintainDailyGrid(s, dir, "sstl"))

  /** Incremental kNN label classification on an embedding stream — the
    * production shape of [[graft.operators.Similarity.knnLabelProbe]]:
    * each micro-batch's NEW vectors classify against the corpus
    * accumulated from PRIOR batches (majority of 5 cosine neighbors,
    * ties to the smallest label), then append to it. Candidates route
    * through the persisted IVF index (r10 review: was brute-force
    * batch × corpus): the coarse quantizer (k=8 centroids, 2 Lloyd
    * rounds) trains ONCE on the base split — ids renumbered dense so
    * [[graft.operators.Similarity.kmeansCentroids]]'s id<k seeding
    * holds — and every corpus vector stores its cell id at APPEND
    * time, so a batch probes only its nprobe=3 nearest cells through
    * a cid equi-join: delta cost ∝ |batch| × probed-cell mass,
    * independent of total corpus size ([[streamDeltaMinhash]]'s
    * index posture for embeddings). State = the cell-annotated corpus
    * + the appended prediction log; batch 0 has no prior and predicts
    * nothing. Oracle: replay training on the base split, the global
    * cell assignment (fixed centroids make it batch-independent), and
    * the prior-batches restriction (batches are vec_id % 3 splits).
    */
  def streamKnnProbe(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.cosine_double
    val Sim = graft.operators.Similarity
    val emb = Tables.embeddings(s, dir)
    val srcDir = stageBatchFiles(dir, "sknn",
      (0 until 3).map(b => emb.filter(col("vec_id") % 3 === b)))
    // coarse quantizer trained offline on the base split (the dense
    // renumber predates r12's order-position seeding and is now
    // semantically a no-op — kept only because the ORACLE replays
    // training over the same renumbered ids; AutoNlistSpec pins that
    // a sparse-id base trains identically without it)
    val base = emb.filter(col("vec_id") % 3 === 0)
      .withColumn("vec_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")).cast("long") - 1)
    val cent = graft.operators.Funnel.stageLazy(
      Sim.kmeansCentroids(base, k = 8, iters = 2), "sknn_centroids")
    def withCell(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("label"), col("embedding"),
          col("embedding").cast("array<double>").as("ed"))
        .join(broadcast(cent))
        .select(col("vec_id"), col("label"), col("embedding"), col("cid"),
          round(cosine_double(col("ed"), col("ce")), 6).as("cd"))
        .groupBy("vec_id")
        .agg(first("label").as("label"), first("embedding").as("embedding"),
          max_by(col("cid"), struct(col("cd"), -col("cid"))).as("cid"))
    val corpus = graft.streaming.VersionedStore(s, freshDir(dir, "sknn_corpus"))
    corpus.init(withCell(emb.limit(0)))
    val preds = graft.streaming.VersionedStore(s, freshDir(dir, "sknn_preds"))
    preds.init(emb.limit(0)
      .select(col("vec_id"), col("label").cast("long"), col("label").cast("long").as("pred")))
    val q = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = corpus.prior(batchId)
        // nprobe nearest cells per probe vector, then a cid equi-join
        // against the stored index — never a corpus-side broadcast
        val wProbe = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("qd").desc, col("cid"))
        val probes = batch
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("embedding").cast("array<double>").as("ed"))
          .join(broadcast(cent))
          .select(col("qid"), col("qe"), col("cid"),
            round(cosine_double(col("ed"), col("ce")), 6).as("qd"))
          .withColumn("rn", row_number().over(wProbe))
          .filter(col("rn") <= 3)
          .select("qid", "qe", "cid")
        val scored = probes.join(prior, Seq("cid"))
          .select(col("qid"), col("vec_id").as("nid"), col("label").as("nlabel"),
            graft.functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("c"))
        val knn = scored
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(round(col("c"), 6).desc, col("nid"))))
          .filter(col("rn") <= 5)
        val votes = knn.groupBy("qid", "nlabel").agg(count(lit(1)).as("votes"))
        val p = votes
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(col("votes").desc, col("nlabel"))))
          .filter(col("rk") === 1)
          .select(col("qid").as("vec_id"), col("nlabel").cast("long").as("pred"))
          .join(batch.select(col("vec_id"), col("label").cast("long")), "vec_id")
          .select(col("vec_id"), col("label"), col("pred"))
        inParallel(
          () => preds.write(batchId, preds.prior(batchId).unionByName(p)),
          () => corpus.write(batchId, prior.unionByName(withCell(batch))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    preds.version(lastBatchId(srcDir)).orderBy("vec_id")
  }

  val streamKnnProbeSql: String = {
    val trainSrc = "SELECT row_number() OVER (ORDER BY vec_id) - 1 AS vec_id, " +
      "embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id % 3 = 0"
    s"""${PipelineQueries.lloydCtes(8, 2, trainSrc)},
      |alle AS (SELECT vec_id, label, embedding::DOUBLE[] AS e, vec_id % 3 AS b FROM embeddings),
      |assigned AS (SELECT vec_id, label, e, b, cid FROM (
      |  SELECT a.vec_id, a.label, a.e, a.b, c.cid,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY ${PipelineQueries.cosRound6("a.e", "c.ce")} DESC, c.cid) AS rn
      |  FROM alle a, c2 c) WHERE rn = 1),
      |probes AS (SELECT qid, label, qe, b, cid FROM (
      |  SELECT t.vec_id AS qid, t.label, t.e AS qe, t.b, c.cid,
      |    row_number() OVER (PARTITION BY t.vec_id
      |      ORDER BY ${PipelineQueries.cosRound6("t.e", "c.ce")} DESC, c.cid) AS rn
      |  FROM alle t, c2 c WHERE t.b >= 1) WHERE rn <= 3),
      |s AS (SELECT p.qid, p.label, a.vec_id AS nid, a.label AS nlabel,
      |        list_cosine_similarity(p.qe, a.e) AS c
      |      FROM probes p JOIN assigned a ON a.cid = p.cid AND a.b < p.b),
      |knn AS (SELECT qid, label, nid, nlabel,
      |          row_number() OVER (PARTITION BY qid ORDER BY round(c, 6) DESC, nid) AS rn
      |        FROM s QUALIFY rn <= 5),
      |votes AS (SELECT qid, label, nlabel, count(*) AS votes FROM knn GROUP BY 1, 2, 3)
      |SELECT qid AS vec_id, label::BIGINT AS label, nlabel::BIGINT AS pred
      |FROM votes
      |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY votes DESC, nlabel) = 1
      |ORDER BY vec_id""".stripMargin
  }

  /** Holt–Winters maintained on a stream: state = the additive
    * (event_type, day, cnt) grid, key-sum merged per batch under
    * arbitrary splits (the [[streamStl]] posture — the smoothing
    * recursion is day-sequential and model-coupled, so the maintainer
    * appends the ADDITIVE profile and the end-of-stream solve runs
    * [[AnalyticsQueries.hwFromDaily]], the shared walk). Oracle = the
    * batch statement verbatim.
    */
  def streamHoltWinters(s: SparkSession, dir: String): DataFrame =
    AnalyticsQueries.hwFromDaily(maintainDailyGrid(s, dir, "shw"))

  /** Kleinberg burst detection maintained on a stream: the additive
    * (event_type, day, cnt) grid key-sum merges per batch (the
    * [[streamHoltWinters]] posture); the Viterbi walk is
    * whole-sequence-coupled, so the end-of-stream solve runs
    * [[AnalyticsQueries.burstsFromDaily]] — trend monitoring is the
    * automaton's production use. Oracle = the batch statement verbatim.
    */
  def streamBursts(s: SparkSession, dir: String): DataFrame =
    AnalyticsQueries.burstsFromDaily(maintainDailyGrid(s, dir, "sburst"))

  /** The always-valid sequential test maintained on a stream
    * ([[AnalyticsQueries.evtMsprt]] as the live experiment dashboard —
    * which is the mSPRT's entire reason to exist: the readout is
    * DESIGNED to be monitored continuously): state = the additive
    * (day, arm-count) grid, key-sum merged per batch under arbitrary
    * splits; the end-of-stream solve runs the shared readout tail.
    * Oracle = the batch statement verbatim.
    */
  def streamMsprt(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "smsprt",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "smsprt_store"))
    store.init(AQ.msprtDaily(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(AQ.msprtDaily(batch))
          .groupBy("d").agg(sum("na_d").as("na_d"), sum("ca_d").as("ca_d"),
            sum("nb_d").as("nb_d"), sum("cb_d").as("cb_d")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.msprtFromDaily(store.version(lastBatchId(srcDir)))
  }

  /** The stratified-ATE estimator maintained on a stream
    * ([[AnalyticsQueries.evtAte]] as a continuously-refreshed
    * observational readout): state = the per-user profile table —
    * activity SUMS sum-merge and treatment/conversion flags MAX-merge,
    * both commutative, so batches split arbitrarily. The end-of-stream
    * solve (quantile bounds + stratum census) runs the shared tail
    * over the user-dimension store. Oracle = the batch statement
    * verbatim.
    */
  def streamAte(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sate",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sate_store"))
    store.init(AQ.ateUsers(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(AQ.ateUsers(batch))
          .groupBy("user_id").agg(sum("act").as("act"),
            max("treated").as("treated"), max("conv").as("conv")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.ateFromUsers(graft.operators.Funnel.stageLazy(
      store.version(lastBatchId(srcDir))
        .select(col("user_id"), col("act").cast("long").as("act"),
          col("treated").cast("long").as("treated"), col("conv").cast("long").as("conv"))))
  }

  /** Heaps'-law growth maintained on a stream
    * ([[PipelineQueries.docHeaps]] as a live vocabulary monitor — the
    * curve that tells a tokenizer team when the vocab budget will
    * saturate): two stores — token first-appearance docs (MIN-merge:
    * min is commutative, so arbitrary splits fold exactly) and per-doc
    * token lengths (append-only distinct rows). The end-of-stream
    * solve runs the shared growth-curve tail; the batch oracle pins
    * merge ≡ one-shot.
    */
  def streamHeaps(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{PipelineQueries => PQ}
    val docs = Tables.documents(s, dir)
    val srcDir = stageBatchFiles(dir, "sheaps",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val fsStore = graft.streaming.VersionedStore(s, freshDir(dir, "sheaps_fs"))
    val dlStore = graft.streaming.VersionedStore(s, freshDir(dir, "sheaps_dl"))
    fsStore.init(PQ.heapsFirstSeen(docs.limit(0)))
    dlStore.init(PQ.heapsDocLen(docs.limit(0)))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        inParallel(
          () => fsStore.write(batchId, fsStore.prior(batchId)
            .unionByName(PQ.heapsFirstSeen(batch))
            .groupBy("tok").agg(min("fd").as("fd"))),
          () => dlStore.write(batchId, dlStore.prior(batchId)
            .unionByName(PQ.heapsDocLen(batch))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    PQ.heapsSolve(
      graft.operators.Funnel.stageLazy(fsStore.version(lastBatchId(srcDir))
        .select(col("tok"), col("fd").cast("long").as("fd"))),
      graft.operators.Funnel.stageLazy(dlStore.version(lastBatchId(srcDir))
        .select(col("doc_id").cast("long").as("doc_id"), col("nt").cast("long").as("nt"))))
  }

  /** The Benford audit maintained on a stream
    * ([[AnalyticsQueries.evtBenford]] as a continuous ingest-quality
    * gate — a drifting first-digit distribution is a live signal of a
    * broken upstream producer): state = the ≤9-row additive digit
    * count table, the chi-square verdict solved at end of stream.
    * Oracle = the batch audit verbatim.
    */
  def streamBenford(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sbenford",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sbenford_store"))
    store.init(AQ.benfordDigits(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(AQ.benfordDigits(batch))
          .groupBy("d").agg(sum("n").as("n")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.benfordFromDigits(graft.operators.Funnel.stageLazy(
      store.version(lastBatchId(srcDir))
        .select(col("d").cast("long").as("d"), col("n").cast("long").as("n"))))
  }

  /** The Lorenz/Gini readout maintained on a stream
    * ([[AnalyticsQueries.evtLorenz]] as a live concentration monitor):
    * state = the per-user additive micro-unit spend table; the decile
    * curve and trapezoid Gini solve at end of stream. Oracle = the
    * batch statement verbatim.
    */
  def streamLorenz(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "slorenz",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "slorenz_store"))
    store.init(AQ.lorenzUsers(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(AQ.lorenzUsers(batch))
          .groupBy("user_id").agg(sum("y").as("y")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.lorenzFromUsers(graft.operators.Funnel.stageLazy(
      store.version(lastBatchId(srcDir))
        .select(col("user_id"), col("y").cast("long").as("y"))))
  }

  /** The Gram block maintained on a stream
    * ([[PipelineQueries.embGram]] as continuously-updated model-prep
    * state): state = the 36 exact-integer cell sums themselves —
    * PURELY additive BIGINTs, the smallest state in the maintainer
    * family, and exactly how a production pipeline keeps X'X warm for
    * periodic ridge/PCA refits without rescanning the corpus. Oracle =
    * the batch statement verbatim (integer exactness makes merge ≡
    * one-shot unconditional).
    */
  def streamGram(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val srcDir = stageBatchFiles(dir, "sgram",
      (0 until 3).map(b => emb.filter(col("vec_id") % 3 === b)))
    val dims = 8
    val scale = 1048576.0
    def cells(df: DataFrame): DataFrame = {
      val q = df.select((0 until dims).map(d =>
        floor(col("embedding").getItem(d).cast("double") * scale).cast("long")
          .as(s"q$d")): _*)
      val sums = for { i <- 0 until dims; j <- i until dims }
        yield sum(col(s"q$i") * col(s"q$j")).as(s"g_${i}_$j")
      q.agg(sums.head, sums.tail: _*)
        .select(explode(array((for { i <- 0 until dims; j <- i until dims }
          yield struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"),
            coalesce(col(s"g_${i}_$j"), lit(0L)).as("g_scaled"))): _*)).as("x"))
        .select(col("x.i").as("i"), col("x.j").as("j"), col("x.g_scaled").as("g_scaled"))
    }
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sgram_store"))
    store.init(cells(emb.limit(0)))
    val q = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(cells(batch))
          .groupBy("i", "j").agg(sum("g_scaled").as("g_scaled")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store.version(lastBatchId(srcDir))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("g_scaled").cast("long").as("g_scaled"),
        (col("g_scaled").cast("double") / lit(scale * scale)).as("gram"))
      .orderBy("i", "j")
  }

  /** Incremental view maintenance for a two-sided JOIN — the delta
    * algebra the reference's StreamExecJoin runs inside its state
    * backends (ref `StreamingJoinOperator.java`: each arriving row
    * probes the OTHER side's accumulated state), made explicit over
    * stores: per batch of tagged deltas,
    * ΔJ = Δl ⋈ O_prev ∪ L_prev ⋈ Δo ∪ Δl ⋈ Δo, and the materialized
    * join grows append-only (insert-only inputs). Both sides arrive
    * interleaved in ONE tagged file stream (orders and lineitem rows
    * split by orderkey mod 3 — the IVM algebra is arrival-order
    * independent, unlike the continuity maintainers). The final
    * readout aggregates the maintained join per order priority with
    * integer micro-unit price sums; the oracle is the whole-corpus
    * join aggregate, so a missed or doubled delta term breaks the
    * hash.
    *
    * Storage posture (100 TB): the view and both side states ride
    * [[graft.streaming.DeltaStore]] — each batch APPENDS its delta as
    * an immutable directory (write bytes ∝ ¦Δ¦, never ¦J¦), and the
    * view compacts periodically (every second batch here), the
    * append-snapshot-compact lifecycle of a production table format.
    * `DeltaStoreSpec` asserts the per-batch written-row counts track
    * the increment.
    */
  def streamIvmJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select(lit("o").as("tag"), col("o_orderkey").as("k"),
        col("o_orderpriority").as("pri"), lit(0L).as("price_micro"))
    val l = Tables(s, dir, "lineitem")
      .select(lit("l").as("tag"), col("l_orderkey").as("k"), lit("").as("pri"),
        floor(col("l_extendedprice") * 1e6 + 0.5).cast("long").as("price_micro"))
    val tagged = o.unionByName(l)
    // OFFSET the lineitem split by one batch: the same key's order and
    // line rows arrive in DIFFERENT batches, so every delta term
    // (Δl⋈O_prev, L_prev⋈Δo, Δl⋈Δo) fires and a missing term breaks
    // the oracle
    val srcDir = stageBatchFiles(dir, "sivm",
      (0 until 3).map(b => tagged.filter(
        (col("tag") === "o" && col("k") % 3 === b)
          || (col("tag") === "l" && col("k") % 3 === (b + 1) % 3))))
    val oStore = graft.streaming.DeltaStore(s, freshDir(dir, "sivm_o"))
    val lStore = graft.streaming.DeltaStore(s, freshDir(dir, "sivm_l"))
    val jStore = graft.streaming.DeltaStore(s, freshDir(dir, "sivm_j"))
    oStore.init(tagged.limit(0).select(col("k"), col("pri")))
    lStore.init(tagged.limit(0).select(col("k"), col("price_micro")))
    jStore.init(tagged.limit(0).select(col("k"), col("pri"), col("price_micro")))
    val q = s.readStream.schema(tagged.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint(eager = false)
        val dO = b.filter(col("tag") === "o").select(col("k"), col("pri"))
        val dL = b.filter(col("tag") === "l").select(col("k"), col("price_micro"))
        val oPrev = oStore.snapshot(batchId - 1)
        val lPrev = lStore.snapshot(batchId - 1)
        val dJ = dL.join(oPrev, "k")
          .unionByName(lPrev.join(dO, "k"))
          .unionByName(dL.join(dO, "k"))
          .select(col("k"), col("pri"), col("price_micro"))
        // three independent stores, disjoint directories; the delta
        // frames read only version ≤ b−1 paths pinned above — overlap
        // the appends (guide §2.6, r14 opt). The periodic compact reads
        // jStore's own just-appended delta, so it stays AFTER the join
        inParallel(
          () => jStore.append(batchId, dJ),
          () => oStore.append(batchId, dO),
          () => lStore.append(batchId, dL))
        if (batchId % 2 == 1) jStore.compact(batchId) // periodic fold
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    jStore.snapshot(lastBatchId(srcDir))
      .groupBy("pri")
      .agg(count(lit(1)).as("n"), sum("price_micro").as("sum_micro"))
      .select(col("pri").as("o_orderpriority"), col("n").cast("long").as("n"),
        (col("sum_micro").cast("double") / 1e6).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val streamIvmJoinSql: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS n,
      |  sum(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))::DOUBLE / 1e6 AS sum_price
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** IVM join under RETRACTIONS — [[streamIvmJoin]] extended to a
    * changelog input (ref: the reference's retract-stream join,
    * `StreamingJoinOperator` with `RowKind.DELETE` — multiplicity
    * algebra: state rows carry a NET multiplicity, a delete is a −1
    * row, and join deltas MULTIPLY multiplicities). The fixture
    * inserts every lineitem row and then DELETES a deterministic
    * third of them (l_linenumber ≡ 0 mod 3) in the following batch;
    * the maintained join's aggregate weights by net multiplicity and
    * must equal the whole-corpus join over the SURVIVING rows — a
    * dropped retraction or a sign error breaks the hash.
    *
    * Storage posture (100 TB): all three states ride
    * [[graft.streaming.BucketStore]] — net-multiplicity compaction
    * BOUNDED to the hash buckets the batch's delta touches (semi-join
    * restriction; untouched buckets are neither read nor rewritten),
    * so state tracks the live set while per-batch write cost tracks
    * the touched working set. `DeltaStoreSpec` asserts the
    * untouched-bucket and written-row bounds.
    */
  def streamIvmJoinRetract(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select(lit("o").as("tag"), col("o_orderkey").as("k"),
        col("o_orderpriority").as("pri"), lit(0L).as("price_micro"),
        lit(0L).as("ln"), lit(1L).as("mult"))
    val lIns = Tables(s, dir, "lineitem")
      .select(lit("l").as("tag"), col("l_orderkey").as("k"), lit("").as("pri"),
        floor(col("l_extendedprice") * 1e6 + 0.5).cast("long").as("price_micro"),
        col("l_linenumber").cast("long").as("ln"), lit(1L).as("mult"))
    val lDel = lIns.filter(col("ln") % 3 === 0).withColumn("mult", lit(-1L))
    val tagged = o.unionByName(lIns).unionByName(lDel)
    // batch b: orders with k%3==b, line INSERTS with k%3==b, and the
    // DELETES of the previous batch's inserts — retractions always
    // arrive after their insert, as a changelog guarantees
    val srcDir = stageBatchFiles(dir, "sivmr",
      (0 until 4).map(b => tagged.filter(
        (col("mult") === 1L && col("k") % 3 === math.min(b, 2).toLong && lit(b) < 3)
          || (col("mult") === -1L && col("k") % 3 === (b - 1).toLong))))
    val oStore = graft.streaming.BucketStore(s, freshDir(dir, "sivmr_o"), numBuckets = 8)
    val lStore = graft.streaming.BucketStore(s, freshDir(dir, "sivmr_l"), numBuckets = 8)
    val jStore = graft.streaming.BucketStore(s, freshDir(dir, "sivmr_j"), numBuckets = 8)
    oStore.init(tagged.limit(0).select(col("k"), col("pri"), col("mult")), "k")
    lStore.init(tagged.limit(0).select(col("k"), col("price_micro"), col("ln"), col("mult")), "k")
    jStore.init(tagged.limit(0)
      .select(col("k"), col("pri"), col("price_micro"), col("mult")), "k")
    val q = s.readStream.schema(tagged.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // lazy boundary (r13 opt): the batch fans out to both deltas and
        // three join legs; persist() materializes it inside the first
        // store action instead of paying a dedicated localCheckpoint job
        val b = batch.localCheckpoint(eager = false)
        val dO = b.filter(col("tag") === "o").select(col("k"), col("pri"), col("mult"))
        val dL = b.filter(col("tag") === "l")
          .select(col("k"), col("price_micro"), col("ln"), col("mult"))
        val oPrev = oStore.snapshot(batchId - 1)
        val lPrev = lStore.snapshot(batchId - 1)
        // multiplicities multiply across the join (Δl⋈O ∪ L⋈Δo ∪ Δl⋈Δo)
        def j(lt: DataFrame, rt: DataFrame): DataFrame =
          lt.join(rt.withColumnRenamed("mult", "m2"), "k")
            .select(col("k"), col("pri"), col("price_micro"),
              (col("mult") * col("m2")).as("mult"))
        val dJ = j(dL, oPrev).unionByName(j(dL, dO))
          .unionByName(lPrev.join(dO.withColumnRenamed("mult", "m2"), "k")
            .select(col("k"), col("pri"), col("price_micro"),
              (col("mult") * col("m2")).as("mult")))
        // the three stores are INDEPENDENT (separate instances, separate
        // directories; dJ reads o/l version b−1, which is immutable and
        // resolved to concrete paths above) — submit their applyDeltas
        // concurrently so each store's scheduling floor overlaps the
        // others' instead of summing (guide §2.6; r14 opt). Concurrent
        // first consumers of the shared lazy-checkpointed batch are safe:
        // the block manager computes each partition once under its lock.
        inParallel(
          () => jStore.applyDelta(batchId, dJ, "k",
            Seq("k", "pri", "price_micro"), "mult"),
          () => oStore.applyDelta(batchId, dO, "k", Seq("k", "pri"), "mult"),
          () => lStore.applyDelta(batchId, dL, "k",
            Seq("k", "price_micro", "ln"), "mult"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    jStore.snapshot(lastBatchId(srcDir))
      .groupBy("pri")
      .agg(sum("mult").as("n"), sum(col("price_micro") * col("mult")).as("sum_micro"))
      .select(col("pri").as("o_orderpriority"), col("n").cast("long").as("n"),
        (col("sum_micro").cast("double") / 1e6).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** The whole-corpus join over the SURVIVING lineitem rows — a lost
    * retraction on the streaming side cannot match this.
    */
  val streamIvmJoinRetractSql: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS n,
      |  sum(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))::DOUBLE / 1e6 AS sum_price
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_linenumber % 3 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Qini/AUUC maintained on a stream ([[AnalyticsQueries.evtQini]] as
    * a live targeting-policy monitor): SAME additive user-profile
    * store shape as [[streamAte]] — activity sums sum, flags max —
    * with the uplift-curve tail run at end of stream. Oracle = the
    * batch statement verbatim.
    */
  def streamQini(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sqini",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sqini_store"))
    store.init(AQ.ateUsers(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(AQ.ateUsers(batch))
          .groupBy("user_id").agg(sum("act").as("act"),
            max("treated").as("treated"), max("conv").as("conv")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.qiniFromUsers(graft.operators.Funnel.stageLazy(
      store.version(lastBatchId(srcDir))
        .select(col("user_id"), col("act").cast("long").as("act"),
          col("treated").cast("long").as("treated"), col("conv").cast("long").as("conv"))))
  }

  /** Split-conformal coverage maintained on a stream
    * ([[AnalyticsQueries.evtConformal]] as a continuously-refreshed
    * model-trust monitor): state = the per-user (covariate, micro-unit
    * spend) sums — purely additive; the fold bit is a pure function of
    * the key, recomputed at solve time. Oracle = the batch statement
    * verbatim.
    */
  def streamConformal(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sconf",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    def prof(df: DataFrame): DataFrame = AQ.conformalUsers(df).drop("fold")
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sconf_store"))
    store.init(prof(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(prof(batch))
          .groupBy("user_id").agg(sum("x").as("x"), sum("y_micro").as("y_micro")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.conformalFromUsers(graft.operators.Funnel.stageLazy(
      store.version(lastBatchId(srcDir))
        .select(col("user_id"), col("x").cast("long").as("x"),
          col("y_micro").cast("long").as("y_micro"))
        .withColumn("fold", pmod(
          graft.functions.GraftFunctions.md5_prefix(
            concat(lit("cf|"), col("user_id").cast("string")), 8), lit(2L)))))
  }

  /** The dispersion diagnostic maintained on a stream — the SAME
    * additive (type, day, cnt) grid as [[streamStl]], with
    * [[AnalyticsQueries.evtDispersion]]'s integer-ratio tail solved at
    * end of stream (a live overdispersion monitor is how a pipeline
    * notices its count model's family assumption has broken). Oracle =
    * the batch statement verbatim.
    */
  def streamDispersion(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sdisp",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    def dailyOf(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sdisp_store"))
    store.init(dailyOf(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(dailyOf(batch))
          .groupBy("event_type", "d").agg(sum("cnt").as("cnt")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.dispersionFromDaily(graft.operators.Funnel.stageLazy(
      store.version(lastBatchId(srcDir))
        .select(col("event_type"), col("d"), col("cnt").cast("long").as("cnt"))))
  }

  /** Binary-segmentation changepoints maintained on an event stream
    * ([[AnalyticsQueries.evtBinseg]] as a live monitor): the state is
    * the ADDITIVE (event_type, d, cnt) daily grid — per-batch partial
    * daily counts sum-merge, the same contract as [[streamDispersion]]
    * — and the solve re-runs the bounded split recursion
    * ([[AnalyticsQueries.binsegFromDaily]]) over the merged grid. A new
    * batch can move EVERY split (the criterion is global over the
    * series), so split positions are solve-time outputs, not state.
    * Oracle is the batch statement VERBATIM; event_id % 3 splits prove
    * arrival-order independence of the additive grid.
    */
  def streamBinseg(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sbseg",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    def dailyOf(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt"))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sbseg_store"))
    store.init(dailyOf(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, store.prior(batchId).unionByName(dailyOf(batch))
          .groupBy("event_type", "d").agg(sum("cnt").as("cnt")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.binsegFromDaily(store.version(lastBatchId(srcDir))
      .select(col("event_type"), col("d"), col("cnt").cast("long").as("cnt")))
  }

  /** Flagged-term content scan maintained on a document stream
    * ([[PipelineQueries.docFlaggedTerms]] as a live-ingest content
    * monitor — the posture a moderation dashboard runs): each batch
    * runs the ONE-PASS Aho–Corasick scan over ITS OWN documents only
    * (scan cost ∝ batch), and the (source, term, docs, hits) partials
    * sum-merge into the bounded |sources|×|terms| state. The batch
    * statement is the oracle verbatim.
    */
  def streamFlaggedTerms(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{PipelineQueries => PQ}
    val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
    val srcDir = stageBatchFiles(dir, "sflag",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sflag_store"))
    store.init(PQ.flaggedTermCounts(docs.limit(0)))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(PQ.flaggedTermCounts(batch))
            .groupBy("source", "term")
            .agg(sum("docs").as("docs"), sum("hits").as("hits")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store.version(lastBatchId(srcDir))
      .select(col("source"), col("term"), col("docs").cast("long").as("docs"),
        col("hits").cast("long").as("hits"))
      .orderBy("source", "term")
  }

  /** Sorted-neighborhood dedup candidates maintained on a document
    * stream ([[PipelineQueries.docSnm]] as a live-ingest maintainer):
    * the state is the (id, key) sort-key table on a
    * [[graft.streaming.DeltaStore]] — each batch appends its own keys
    * (write ∝ batch size). An arrival can land BETWEEN two previously
    * adjacent records and change the whole neighborhood's pairing, so
    * the window pairs are solve-time outputs: the solve re-runs
    * [[graft.operators.Dedup.snmCandidates]] over the snapshot, making
    * the batch statement the oracle VERBATIM.
    */
  def streamSnm(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "ssnm",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.DeltaStore(s, freshDir(dir, "ssnm_keys"))
    store.init(s.range(0).select(col("id"), lit("").as("key")))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batchId, batch.select(col("doc_id").as("id"),
          substring(TextAnalysis.normalizeText(col("text")), 1, 64).as("key")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Dedup.snmCandidates(store.snapshot(lastBatchId(srcDir)), w = 3, maxDist = 12)
      .orderBy("a_id", "b_id")
  }

  /** Fellegi–Sunter linkage maintained on a document stream
    * ([[PipelineQueries.docLinkage]] as a live-ingest maintainer): the
    * state extends [[streamSnm]]'s sort-key store with the source
    * column — (id, key, source) appends, write ∝ batch. Neither the
    * candidate pairs (an arrival re-pairs its neighborhood) nor the EM
    * parameters (every pattern count shifts them) are additive, so the
    * solve re-derives pairs → patterns → 5-round EM over the snapshot;
    * the batch statement is the oracle VERBATIM.
    */
  def streamLinkage(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Funnel, TextAnalysis}
    val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
    val srcDir = stageBatchFiles(dir, "slnk",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.DeltaStore(s, freshDir(dir, "slnk_keys"))
    store.init(s.range(0).select(col("id"), lit("").as("key"), lit("").as("source")))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batchId, batch.select(col("doc_id").as("id"),
          substring(TextAnalysis.normalizeText(col("text")), 1, 64).as("key"),
          col("source")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val snap = store.snapshot(lastBatchId(srcDir))
    val cands = Dedup.snmCandidates(snap.select("id", "key"), w = 3, maxDist = 64)
    val src = snap.select(col("id"), col("source"))
    val pat = Funnel.stageLazy(cands
      .join(src.select(col("id").as("a_id"), col("source").as("sa")), "a_id")
      .join(src.select(col("id").as("b_id"), col("source").as("sb")), "b_id")
      .select((col("dist") === 0).cast("long").as("g1"),
        (col("dist") <= 12).cast("long").as("g2"),
        (col("sa") === col("sb")).cast("long").as("g3"))
      .groupBy("g1", "g2", "g3").agg(count(lit(1)).as("n")))
    Dedup.fellegiSunter(pat, iters = 5).orderBy("g1", "g2", "g3")
  }

  /** Markov-removal attribution maintained on a stream
    * ([[AnalyticsQueries.evtMarkovAttribution]] as a live data-driven
    * credit monitor — completing the attribution quartet's streaming
    * side: last-touch, positional, Shapley, and now Markov): two state
    * tables — the ADDITIVE (f, t, n) non-terminal transition counts
    * (START→ch, ch→ch, ch→CONV; sum-merge), and the per-user LAST
    * JOURNEY EVENT (the [[streamTransitions]] continuity carry
    * restricted to the pre-first-purchase journey: a carried purchase
    * row freezes the journey, because every later row of that user
    * computes prior ≥ 1 against it and drops out). Terminal →NULL
    * edges are only knowable at solve time (any journey may still be
    * extended), so they are DERIVED from the user state then — which
    * is exactly why the reference's removal-effect model is a
    * batch-refreshed table, here maintained incrementally instead.
    * The end-of-stream solve runs the shared bounded algebra; the
    * batch oracle pins fold ≡ whole-corpus equality exactly.
    */
  def streamMarkovAttr(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val srcDir = stageBatchFiles(dir, "smattr", daySplits(ev, col("ts"), 3))
    val transStore = graft.streaming.VersionedStore(s, freshDir(dir, "smattr_trans"))
    val lastStore = graft.streaming.VersionedStore(s, freshDir(dir, "smattr_last"))
    transStore.init(s.range(0).select(col("id").cast("string").as("f"),
      col("id").cast("string").as("t"), col("id").as("n")))
    lastStore.init(ev.limit(0))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorL = lastStore.prior(batchId)
        // carried last-journey rows rejoin the sequence as lag sources
        // (and as the freeze signal when they are the first purchase);
        // they are never re-counted as transition targets
        val all = batch.withColumn("carried", lit(false))
          .unionByName(priorL.withColumn("carried", lit(true)))
          .localCheckpoint(eager = false)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val kept = all
          .withColumn("state",
            when(col("event_type") === "purchase", "CONV").otherwise(col("event_type")))
          .withColumn("prior",
            coalesce(sum(when(col("state") === "CONV", 1L).otherwise(0L))
              .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                -1)), lit(0L)))
          .filter(col("prior") === 0)
        val trans = kept
          .withColumn("f", coalesce(lag("state", 1).over(w), lit("START")))
          .filter(!col("carried"))
          .groupBy(col("f"), col("state").as("t")).agg(count(lit(1)).as("n"))
        inParallel(
          () => transStore.write(batchId, transStore.prior(batchId).unionByName(trans)
            .groupBy("f", "t").agg(sum("n").as("n"))),
          () => lastStore.write(batchId, kept
            .groupBy("user_id")
            .agg(expr("max_by(struct(ts, event_id, event_type), struct(ts, event_id))").as("m"))
            .select(col("user_id"), col("m.ts").as("ts"),
              col("m.event_id").as("event_id"), col("m.event_type").as("event_type"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val last = lastBatchId(srcDir)
    val term = lastStore.version(last)
      .filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("f"), lit("NULL").as("t"))
      .groupBy("f", "t").agg(count(lit(1)).as("n"))
    AQ.markovAttrSolve(s, transStore.version(last)
      .select(col("f"), col("t"), col("n").cast("long").as("n"))
      .unionByName(term)
      .groupBy("f", "t").agg(sum("n").as("n")))
  }

  /** DP count release maintained on a stream
    * ([[AnalyticsQueries.evtDpRelease]] as a live publisher): state =
    * the additive (event_type, day) count grid, key-sum merged per
    * batch; the end-of-stream release applies the cell-keyed Laplace
    * noise to the FINAL counts — noise attaches at release time, not
    * at merge time, so the privacy calibration is per release (adding
    * noise per batch would compound ε). State is the released grid
    * itself — dimension-bounded; oracled by the batch SQL verbatim.
    */
  def streamDpRelease(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sdpr",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    def cells(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sdpr_store"))
    store.init(cells(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(cells(batch))
            .groupBy("event_type", "d").agg(sum("n").as("n")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AnalyticsQueries.dpNoisyRelease(store.version(lastBatchId(srcDir)))
  }

  /** CUPED maintained on a stream ([[AnalyticsQueries.evtCuped]]'s
    * experiment readout as a live monitor): state = the PURELY
    * ADDITIVE per-(user, day) purchase micro-sum table (`cupedDaily`;
    * its zero rows carry the user census and the corpus date range),
    * merged by key-summing each batch's daily increment into the
    * versioned store; the end-of-stream solve runs the shared
    * closed-form tail over the final state. State is |user × day|
    * rows — dimension-bounded, independent of event VOLUME; equality
    * with the batch oracle is by construction (sums of sums), and the
    * event_id%3 split makes users and days straddle batches.
    */
  def streamCuped(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "scuped",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "scuped_store"))
    store.init(AQ.cupedDaily(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.cupedDaily(batch))
            .groupBy("user_id", "de").agg(sum("pmicro").as("pmicro")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.cupedSolve(store.version(lastBatchId(srcDir)))
  }

  def streamOls(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sols",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sols_store"))
    store.init(AQ.olsStats(ev.limit(0)))
    val statCols = Seq("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy")
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.olsStats(batch))
            .agg(statCols.map(c => sum(c).as(c)).head,
              statCols.tail.map(c => sum(c).as(c)): _*))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.olsSolve(store.version(lastBatchId(srcDir)))
  }

  /** Streaming discriminant-direction maintainer: the between-class
    * scatter's sufficient statistics (per-class count + vector sum,
    * [[graft.operators.Pca.classSums]]) are PURELY ADDITIVE, so state
    * is one ≤ |classes|-row frame merged by elementwise array sums —
    * constant size forever, the [[streamOls]] posture applied to the
    * spectral family. End of stream: the final state feeds the SAME
    * driver-side scatter/power-iteration/projection tail as the batch
    * query, so the oracle is the batch LDA SQL verbatim (double sums
    * regroup across batches — the 1e-15 reassociation noise sits far
    * inside the round-6 contract).
    */
  def streamLda(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pca
    import graft.queries.{PipelineQueries => PQ}
    val emb = Tables.embeddings(s, dir)
    val d = PQ.EmbDim
    val srcDir = stageBatchFiles(dir, "slda",
      (0 until 3).map(b => emb.filter(col("vec_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "slda_store"))
    store.init(Pca.classSums(emb.limit(0), "label", "embedding", d))
    val q = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId)
            .unionByName(Pca.classSums(batch, "label", "embedding", d))
            .groupBy("cls").agg(sum("nc").as("nc"),
              array((0 until d).map(i => sum(col("s").getItem(i))): _*).as("s")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    PQ.ldaScores(emb, PQ.collectClassSums(store.version(lastBatchId(srcDir))))
  }

  /** Streaming KS drift gate: the deci-bucket two-sample counts are
    * purely additive, so state = one ≤4901-row bin table sum-merged
    * per batch; the end-of-stream KS tail is the batch tail verbatim,
    * and integer counts make the batch oracle hash-exact.
    */
  def streamKs(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sks",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sks_store"))
    store.init(AQ.ksBins(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.ksBins(batch))
            .groupBy("b").agg(sum("c1").as("c1"), sum("c2").as("c2")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.ksFromBins(store.version(lastBatchId(srcDir)))
  }

  /** Streaming Mann–Whitney maintainer: the SAME ≤4901-row deci-bucket
    * bin table as [[streamKs]] (one state serves both tests), sum-merged
    * per batch; end of stream runs the rank-sum tail over the final
    * bins — U and z are functions of the bin table alone, so the
    * maintained readout is bit-identical to the batch query and the
    * batch oracle applies verbatim.
    */
  def streamMannWhitney(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "smw",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "smw_store"))
    store.init(AQ.ksBins(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.ksBins(batch))
            .groupBy("b").agg(sum("c1").as("c1"), sum("c2").as("c2")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.mannWhitneyFromBins(store.version(lastBatchId(srcDir)))
  }

  /** Streaming maintainer for the per-(bin, event_type) count table —
    * the k-sample rank-test state ([[graft.queries.AnalyticsQueries
    * .typeBins]]): sum-merge per batch, bounded ≤4901 bins × |types|
    * rows at any volume; end of stream runs the supplied tail over the
    * final bins, oracled by the batch statement verbatim.
    */
  private def typeBinsMaintained(s: SparkSession, dir: String, tag: String)(
      tail: DataFrame => DataFrame): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, tag,
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, s"${tag}_store"))
    store.init(AQ.typeBins(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.typeBins(batch))
            .groupBy("b", "event_type").agg(sum("c").as("c")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    tail(store.version(lastBatchId(srcDir)))
  }

  /** Streaming Kruskal–Wallis: the maintained k-sample bin table, the
    * batch H tail at end of stream — the live "did any variant's
    * distribution move" dashboard, bit-identical to the batch query.
    */
  def streamKruskal(s: SparkSession, dir: String): DataFrame =
    typeBinsMaintained(s, dir, "skw")(
      graft.queries.AnalyticsQueries.kruskalFromBins)

  /** Streaming Mood's median test over the same maintained state —
    * the robust-location member of the one-bin-table family.
    */
  def streamMood(s: SparkSession, dir: String): DataFrame =
    typeBinsMaintained(s, dir, "smood")(
      graft.queries.AnalyticsQueries.moodFromBins)

  /** Streaming Jonckheere–Terpstra over the same maintained state —
    * one bin table serves the whole k-sample rank family (the
    * [[streamKs]]/[[streamMannWhitney]] sharing posture).
    */
  def streamJt(s: SparkSession, dir: String): DataFrame =
    typeBinsMaintained(s, dir, "sjt")(
      graft.queries.AnalyticsQueries.jtFromBins)

  /** Streaming maintainer for the per-(user, day) activity grid — the
    * paired-design state ([[graft.queries.AnalyticsQueries
    * .userDayGrid]]): sum-merge on (user_id, d) per batch; the grid is
    * |users| × |days| bounded. The half/tertile split points derive
    * from the FINAL grid's min/max day, so the maintained readout is
    * the batch statement verbatim.
    */
  private def userDayMaintained(s: SparkSession, dir: String, tag: String)(
      tail: DataFrame => DataFrame): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, tag,
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, s"${tag}_store"))
    store.init(AQ.userDayGrid(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.userDayGrid(batch))
            .groupBy("user_id", "d").agg(sum("n").as("n"), sum("np").as("np")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    tail(store.version(lastBatchId(srcDir)))
  }

  /** Streaming McNemar: the maintained (user, day) grid with the
    * paired before/after readout at end of stream.
    */
  def streamMcnemar(s: SparkSession, dir: String): DataFrame =
    userDayMaintained(s, dir, "smcn")(
      graft.queries.AnalyticsQueries.mcnemarFromGrid)

  /** Streaming Cochran's Q over the same maintained grid — the k>2
    * paired readout, sharing the McNemar state.
    */
  def streamCochranq(s: SparkSession, dir: String): DataFrame =
    userDayMaintained(s, dir, "scq")(
      graft.queries.AnalyticsQueries.cochranqFromGrid)

  /** Streaming maintainer for the per-type daily (count, cents) grid —
    * the shared additive state behind the Spearman rank correlation and
    * the Page–Hinkley drift walk (and Kendall, whose twin this also
    * covers: identical state, different bounded tail). Per batch:
    * sum-merge (event_type, d) partials; end of stream: the batch tail
    * over the final grid, oracled by the batch SQL verbatim.
    */
  private def dailyCentsMaintained(s: SparkSession, dir: String, tag: String)(
      tail: DataFrame => DataFrame): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, tag,
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, s"${tag}_store"))
    store.init(AQ.dailyCents(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.dailyCents(batch))
            .groupBy("event_type", "d")
            .agg(sum("cnt").as("cnt"), sum("cents").as("cents")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    tail(store.version(lastBatchId(srcDir)))
  }

  def streamSpearman(s: SparkSession, dir: String): DataFrame =
    dailyCentsMaintained(s, dir, "ssprm")(
      graft.queries.AnalyticsQueries.spearmanFromDaily)

  def streamPageHinkley(s: SparkSession, dir: String): DataFrame =
    dailyCentsMaintained(s, dir, "sph")(
      graft.queries.AnalyticsQueries.pageHinkleyFromDaily)

  /** Streaming t-closeness audit: the two additive k-anonymity state
    * tables ([[streamKanon]] — per-user type counts + day presence)
    * maintained identically, with the t-closeness tail over the final
    * state. One state posture serves the whole privacy-audit family.
    */
  def streamTclose(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "stcl",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    def tcOf(df: DataFrame): DataFrame =
      df.select(col("user_id"), col("event_type"))
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    def daysOf(df: DataFrame): DataFrame =
      df.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val tcStore = graft.streaming.VersionedStore(s, freshDir(dir, "stcl_tc"))
    val dayStore = graft.streaming.VersionedStore(s, freshDir(dir, "stcl_days"))
    tcStore.init(tcOf(ev.limit(0)))
    dayStore.init(daysOf(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        inParallel(
          () => tcStore.write(batchId,
            tcStore.prior(batchId).unionByName(tcOf(batch))
              .groupBy("user_id", "event_type").agg(sum("cnt").as("cnt"))),
          () => dayStore.write(batchId,
            dayStore.prior(batchId).unionByName(daysOf(batch)).distinct()))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.tcloseSolve(tcStore.version(lastBatchId(srcDir)),
      dayStore.version(lastBatchId(srcDir)))
  }

  /** Streaming isotonic-calibration maintainer: the (score, n,
    * positives) block table is additive (the deci-milli score domain is
    * bounded), sum-merged per batch; end of stream runs the exact
    * minimax PAV tail over the final blocks — the batch oracle applies
    * verbatim. The production shape: a quality scorer streams in, the
    * calibration curve is re-fit from ≤1001 maintained rows.
    */
  def streamIsotonic(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val docs = Tables.documents(s, dir)
    def blocksOf(df: DataFrame): DataFrame =
      df.select((col("lang") === "en").cast("long").as("pos"),
          round(graft.operators.TextAnalysis.stopwordCount(col("text"), "en") /
            graft.operators.TextAnalysis.tokenCount(col("text")), 3).as("sc"))
        .groupBy("sc").agg(count(lit(1)).as("n"), sum("pos").as("np"))
    val srcDir = stageBatchFiles(dir, "siso",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "siso_store"))
    store.init(blocksOf(docs.limit(0)))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(blocksOf(batch))
            .groupBy("sc").agg(sum("n").as("n"), sum("np").as("np")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.isotonicFromBlocks(store.version(lastBatchId(srcDir)))
  }

  /** Streaming CMH maintainer: the SAME additive per-user
    * (activity, events, purchases) profile
    * posture as [[streamAte]] (all sums), with the stratified 2x2 test over the final profile —
    * one user-keyed state serves the whole experimentation family.
    */
  def streamCmh(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "scmh",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "scmh_store"))
    store.init(AQ.cmhUsers(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.cmhUsers(batch))
            .groupBy("user_id")
            .agg(sum("act").as("act"), sum("n").as("n"), sum("np").as("np")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.cmhFromUsers(store.version(lastBatchId(srcDir)))
  }

  /** Streaming Granger maintainer: the per-day (click, purchase) count
    * grid is additive — sum-merge per batch, then the lag-1 F-test tail
    * over the final grid. The maintained readout equals the batch query
    * exactly (the grid determines the test), so the batch oracle
    * applies verbatim.
    */
  def streamGranger(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{AnalyticsQueries => AQ}
    val ev = Tables.events(s, dir)
    val srcDir = stageBatchFiles(dir, "sgrang",
      (0 until 3).map(b => ev.filter(col("event_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sgrang_store"))
    store.init(AQ.grangerDaily(ev.limit(0)))
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(AQ.grangerDaily(batch))
            .groupBy("d").agg(sum("xc").as("xc"), sum("yp").as("yp")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    AQ.grangerFromDaily(store.version(lastBatchId(srcDir)))
  }

  /** Streaming Good–Turing maintainer: the (bigram, count) vocab table
    * is additive (the [[streamJs]] vocabulary-keyed posture — state
    * bounded by vocabulary, not corpus); the ≤15-row
    * frequency-of-frequencies readout runs over the final counts.
    */
  def streamGoodTuring(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{PipelineQueries => PQ}
    val docs = Tables.documents(s, dir)
    val srcDir = stageBatchFiles(dir, "sgt",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sgt_store"))
    store.init(PQ.gtBigramCounts(docs.limit(0)))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(PQ.gtBigramCounts(batch))
            .groupBy("tok").agg(sum("cnt").as("cnt")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    PQ.goodTuringFromCounts(store.version(lastBatchId(srcDir)))
  }

  /** Streaming Jensen–Shannon drift gate: the (source, token) counts
    * are purely additive — vocab-keyed state (the boilerplate
    * line-store posture: state tracks the vocabulary, not the corpus),
    * sum-merged per batch; end of stream runs the batch divergence
    * tail over the final counts, oracled by the batch SQL verbatim.
    */
  def streamJs(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.{PipelineQueries => PQ}
    val docs = Tables.documents(s, dir)
    val srcDir = stageBatchFiles(dir, "sjs",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sjs_store"))
    store.init(PQ.jsCounts(docs.limit(0)))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId,
          store.prior(batchId).unionByName(PQ.jsCounts(batch))
            .groupBy("source", "tok").agg(sum("cs").as("cs")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    PQ.jsFromCounts(store.version(lastBatchId(srcDir)))
  }

  /** Streaming Kaplan–Meier maintainer: incremental sessionization by
    * the [[streamGrowth]] union-carry device — each user's OPEN session
    * rides the store as ONE pseudo-event at its last-event time
    * carrying the session start, so re-running the ordinary gap window
    * over (carried row ∪ batch) merges boundary-spanning sessions,
    * closes gap-exposed ones (deaths, counted into an ADDITIVE ≤
    * |duration-minutes|-row bucket store), and keeps exactly each
    * user's last session open — all three cases fall out of one window,
    * no case-split joins. End of stream: every still-open session
    * closes — censored iff its closing gap is unobservable at the
    * corpus end, which provably marks the SAME sessions the batch
    * query censors (a gap-closed session always has a follower more
    * than the gap later, so it can never sit inside the censor
    * horizon). Death counts are integers, so the oracle — the batch
    * survival SQL verbatim — matches hash-exact, not just
    * rounded-equal. State: one open-session row per user + the bounded
    * duration buckets.
    */
  def streamSurvival(s: SparkSession, dir: String): DataFrame =
    AnalyticsQueries.kmTail(survivalGridMaintained(s, dir, "ssv"))

  /** Streaming Nelson–Aalen: the same maintained lifetime grid, the
    * integer-increment cumulative-hazard tail at end of stream — one
    * session state, both survival-scale readouts (the KM/NA pairing
    * every survival dashboard ships).
    */
  def streamCumhaz(s: SparkSession, dir: String): DataFrame =
    AnalyticsQueries.naTail(survivalGridMaintained(s, dir, "scha"))

  private def survivalGridMaintained(s: SparkSession, dir: String, tag: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val srcDir = stageBatchFiles(dir, tag, daySplits(ev, col("ts"), 3))
    val lastBatch = lastBatchId(srcDir)
    val durStore = graft.streaming.VersionedStore(s, freshDir(dir, s"${tag}_store_d"))
    val openStore = graft.streaming.VersionedStore(s, freshDir(dir, s"${tag}_store_o"))
    durStore.init(s.range(0).select(col("id").as("dur"), col("id").as("d")))
    openStore.init(s.range(0).select(col("id").as("user_id"),
      col("id").as("s0"), col("id").as("s1")))
    val batches = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("tss", "eff0")
        val all = batch.select(col("user_id"), col("ts").cast("long").as("tss"))
          .withColumn("eff0", col("tss"))
          .unionByName(openStore.prior(batchId)
            .select(col("user_id"), col("s1").as("tss"), col("s0").as("eff0")))
          .localCheckpoint(eager = false)
        val sess = all
          .withColumn("prev", lag("tss", 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull || col("tss") - col("prev") > 1800L, 1L).otherwise(0L))
          .withColumn("sid", sum("brk").over(w))
          .groupBy("user_id", "sid")
          .agg(min("eff0").as("s0"), max("tss").as("s1"))
          .withColumn("max_sid",
            max("sid").over(org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
          .localCheckpoint(eager = false)
        val deaths = sess.filter(col("sid") < col("max_sid"))
          .select(floor((col("s1") - col("s0")) / lit(60)).cast("long").as("dur"))
          .groupBy("dur").agg(count(lit(1)).as("d"))
        inParallel(
          () => durStore.write(batchId, durStore.prior(batchId).unionByName(deaths)
            .groupBy("dur").agg(sum("d").as("d"))),
          () => openStore.write(batchId,
            sess.filter(col("sid") === col("max_sid")).select("user_id", "s0", "s1")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // end-of-stream closure: the corpus end is the max open s1 (the
    // globally-last event always sits in an open session)
    val open = openStore.version(lastBatch)
    val te = open.agg(max(col("s1")).as("te"))
    val finals = open.crossJoin(broadcast(te))
      .select(floor((col("s1") - col("s0")) / lit(60)).cast("long").as("dur"),
        when(col("s1") > col("te") - lit(1800L), 1L).otherwise(0L).as("cen"))
      .groupBy("dur").agg(
        sum(when(col("cen") === 0L, 1L).otherwise(0L)).as("df"),
        sum(col("cen")).as("c"))
    durStore.version(lastBatch)
      .join(finals, Seq("dur"), "full_outer")
      .select(col("dur"),
        (coalesce(col("d"), lit(0L)) + coalesce(col("df"), lit(0L))).as("d"),
        coalesce(col("c"), lit(0L)).as("c"))
  }

  /** Streaming dataset-profile monitor (ref DataSetUtils.summarize made
    * incremental — the mergeable-summaries rule applied to the
    * per-column profile): state = ONE raw-moments row per column
    * (count/nulls/min/max/sum/sum² and the length stats), constant
    * size forever; each batch contributes its own one-pass moments and
    * the merge is sums-add/bounds-minmax. The finished report (mean,
    * stddev from moments) must equal the batch profile over everything
    * ingested — the oracle is [[ApiQueries.apiSummarizeSql]] verbatim.
    */
  def streamSummarize(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")
    val srcDir = stageBatchFiles(dir, "ssum",
      (0 until 3).map(b => li.filter(col("l_orderkey") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "ssum_store"))
    store.init(graft.operators.Profiling.moments(li.limit(0), cols))
    val q = s.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.write(batchId, graft.operators.Profiling.mergeMoments(
          store.prior(batchId), graft.operators.Profiling.moments(batch, cols)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Profiling.report(store.version(lastBatchId(srcDir)))
      .orderBy("col_name")
  }

  def streamExpect(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val docs = Tables.documents(s, dir)
    val dups = docs.filter(col("doc_id") % 25 === 3)
    val srcDir = stageBatchFiles(dir, "sexp", (0 until 3).map { b =>
      val part0 = docs.filter(col("doc_id") % 3 === b)
      if (b == 2) part0.unionByName(dups) else part0
    })
    val reportStore = graft.streaming.VersionedStore(s, freshDir(dir, "sexp_store_r"))
    val keyStore = graft.streaming.VersionedStore(s, freshDir(dir, "sexp_store_k"))
    reportStore.init(s.range(0).select(col("id").cast("string").as("rule"),
      col("id").as("n_rows"), col("id").as("n_violations")))
    keyStore.init(s.range(0).select(col("id").as("doc_id")))
    val batches = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorR = reportStore.prior(batchId)
        val priorK = keyStore.prior(batchId)
        val rowPart = graft.operators.Expectations
          .audit(batch, PipelineQueries.expectRowRules)
          .select("rule", "n_rows", "n_violations")
        val perId = batch.groupBy("doc_id").agg(count(lit(1)).as("c")).localCheckpoint(eager = false)
        val inb = perId.agg(
          coalesce(sum(col("c")), lit(0L)).cast("long").as("rows_b"),
          coalesce(sum(col("c") - 1), lit(0L)).cast("long").as("exc"))
        val coll = perId.join(priorK, "doc_id")
          .agg(count(lit(1)).cast("long").as("coll"))
        val uniq = inb.crossJoin(coll)
          .select(lit("doc_id_unique").as("rule"), col("rows_b").as("n_rows"),
            (col("exc") + col("coll")).as("n_violations"))
        inParallel(
          () => reportStore.write(batchId, priorR.unionByName(rowPart.unionByName(uniq))
            .groupBy("rule")
            .agg(sum("n_rows").as("n_rows"), sum("n_violations").as("n_violations"))),
          () => keyStore.write(batchId,
            priorK.unionByName(perId.select("doc_id")).distinct()))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    reportStore.version(lastBatchId(srcDir))
      .select(col("rule"), col("n_rows").cast("long").as("n_rows"),
        col("n_violations").cast("long").as("n_violations"),
        round(when(col("n_rows") === 0L, lit(0.0))
          .otherwise(col("n_violations").cast("double") / col("n_rows")), 6)
          .as("violation_frac"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy("rule")
  }

  val streamExpectSql: String = PipelineQueries.expectOracleSql(
    "SELECT * FROM documents UNION ALL SELECT * FROM documents WHERE doc_id % 25 = 3")

  /** Streaming INCREMENTAL boilerplate strip — the continuous form of
    * [[PipelineQueries.docBoilerplate]]: documents arrive as 3
    * micro-batches; each batch strips its lines against the PERSISTED
    * line-frequency store PLUS its own counts
    * ([[graft.operators.Curation.stripBoilerplate]]'s `prior` hook), so
    * the per-line decision equals what a batch run over
    * everything-so-far would make, then merges its counts into the
    * store. The store is versioned per batch (read v(b−1), write v(b) —
    * a full-outer merge-on-write; at production scale that merge is the
    * LSM compaction a merge-capable table format does for you, and the
    * store is line-keyed so it merges without ever touching the
    * corpus). Batch files carry forced ascending mtimes; the oracle
    * replays batch id = doc_id mod 3 with a cumulative-df window, so a
    * line's strip verdict flips across batches exactly when the
    * accumulated distinct-doc count crosses the threshold.
    */
  def streamBoilerplate(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "sbp",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val storeBase = freshDir(dir, "sbp_store")
    val resDir = freshDir(dir, "sbp_res")
    // pre-seed an empty store version and result table
    graft.BenchMeters.fixture {
      // store keyed by xxhash64(line) — 8-byte identities, never the raw
      // line text (Curation.stripBoilerplate's prior contract, r14 opt)
      s.range(0).select(col("id").as("hl"), col("id").as("df"))
        .write.mode("overwrite").parquet(s"$storeBase/v_init")
      s.range(0).select(col("id").as("doc_id"), col("id").as("n_lines"),
          col("id").as("n_kept"), col("id").cast("string").as("kept_md5"))
        .write.mode("overwrite").parquet(resDir)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorPath =
          if (batchId == 0) s"$storeBase/v_init" else s"$storeBase/v${batchId - 1}"
        val prior = s.read.parquet(priorPath)
        val lined = PipelineQueries.linedDocs(batch).localCheckpoint(eager = false)
        // merge this batch's distinct-doc line counts into the store
        // (8-byte xxhash64 line keys — the raw line never enters the
        // store or its exchanges, r14 opt)
        val own = lined
          .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
          .select(col("doc_id"), xxhash64(col("line")).as("hl"))
          .distinct()
          .groupBy("hl").agg(count(lit(1)).as("df"))
        // the stripped result and the df-store merge share only `prior`
        // and `lined` (reads) and write disjoint paths — overlap them
        // (guide §2.6, r14 opt)
        inParallel(
          () => graft.operators.Curation
            .stripBoilerplate(lined, minDocs = 2, prior = Some(prior))
            .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
              md5(col("kept_text")).as("kept_md5"))
            .coalesce(1).write.mode("append").parquet(resDir),
          () => prior.select(col("hl"), col("df").as("pdf"))
            .join(own.select(col("hl"), col("df").as("odf")), Seq("hl"), "full_outer")
            .select(col("hl"),
              (coalesce(col("pdf"), lit(0L)) + coalesce(col("odf"), lit(0L))).as("df"))
            .coalesce(1).write.mode("overwrite").parquet(s"$storeBase/v$batchId"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(resDir).orderBy("doc_id")
  }

  /** Streaming HLL maintenance — the MERGEABILITY property that makes
    * sketches the streaming cardinality answer: documents arrive as 3
    * micro-batches; each batch builds its own 64-register HLL
    * ([[graft.operators.Sketches.hllRegisters]]) and max-merges it
    * into the persisted register store (read v(b−1), write v(b) — max
    * is associative and idempotent, so the merged store EQUALS the
    * sketch built over everything-so-far, regardless of batching,
    * order, or replayed duplicates). Each batch appends the
    * post-merge estimate; the oracle replays batch = doc_id mod 3 and
    * computes each prefix's registers from scratch — hash-matching
    * estimates IS the incremental ≡ batch proof. Store state is 64
    * rows forever, the whole point at 100 TB: continuous distinct
    * counting with constant state and no corpus re-read.
    */
  def streamHll(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import graft.operators.{Sketches, TextAnalysis}
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "shll",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val storeBase = freshDir(dir, "shll_store")
    val resDir = freshDir(dir, "shll_res")
    graft.BenchMeters.fixture {
      s.range(64).select(col("id").as("bucket"), lit(0L).as("reg"))
        .write.mode("overwrite").parquet(s"$storeBase/v_init")
      s.range(0).select(col("id").as("batch"), col("id").cast("double").as("est_distinct"))
        .write.mode("overwrite").parquet(resDir)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorPath =
          if (batchId == 0) s"$storeBase/v_init" else s"$storeBase/v${batchId - 1}"
        val prior = s.read.parquet(priorPath)
        val sh = batch.select(explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
        val own = Sketches.hllRegisters(sh, "sh", m = 64, wBits = 54)
        val merged = prior.select(col("bucket"), col("reg").as("p"))
          .join(own.select(col("bucket"), col("reg").as("o")), Seq("bucket"), "full_outer")
          .select(col("bucket"),
            greatest(coalesce(col("p"), lit(0L)), coalesce(col("o"), lit(0L))).as("reg"))
          .localCheckpoint(eager = false) // serves both the store write and the estimate
        inParallel(
          () => merged.coalesce(1).write.mode("overwrite")
            .parquet(s"$storeBase/v$batchId"),
          () => Sketches.hllEstimate(merged, m = 64, wBits = 54, alpha = 0.709)
            .select(lit(batchId).as("batch"), col("est_distinct"))
            .coalesce(1).write.mode("append").parquet(resDir))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(resDir).orderBy("batch")
  }

  val streamHllSql: String =
    """WITH d AS (SELECT doc_id % 3 AS batch,
      |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |g AS (SELECT batch, unnest(list_transform(range(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d WHERE len(t) >= 3),
      |h AS (SELECT batch, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM g),
      |r AS (SELECT batch, h % 64 AS bucket, h // 64 AS w FROM h),
      |rho AS (SELECT batch, bucket,
      |          CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho FROM r),
      |cum AS (SELECT bb.b AS batch, bk.bucket, coalesce(max(rho.rho), 0)::BIGINT AS reg
      |        FROM range(0, 3) bb(b) CROSS JOIN range(0, 64) bk(bucket)
      |        LEFT JOIN rho ON rho.bucket = bk.bucket AND rho.batch <= bb.b
      |        GROUP BY 1, 2),
      |s AS (SELECT batch, sum((1::BIGINT << (55 - reg)::INTEGER))::BIGINT AS s
      |      FROM cum GROUP BY 1)
      |SELECT batch::BIGINT AS batch,
      |  round(0.709::DOUBLE * 4096 * power(2.0, 55) / s, 3) AS est_distinct
      |FROM s ORDER BY batch""".stripMargin

  /** Streaming count-min maintenance — the additive counterpart of
    * [[streamHll]]'s max-merge: count-min cells merge by per-cell SUM
    * (counts are associative), so the merged sketch EQUALS the sketch
    * over everything-so-far and per-batch frequency estimates for a
    * fixed probe set track the growing prefix. Store state is ≤ 1024
    * cells forever. The oracle recomputes each prefix's cells from
    * scratch — hash-matching estimates proves sum-merge ≡ batch, the
    * second merge semantics of the sketch family.
    */
  def streamCms(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import graft.operators.{Sketches, TextAnalysis}
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "scms",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val storeBase = freshDir(dir, "scms_store")
    val resDir = freshDir(dir, "scms_res")
    graft.BenchMeters.fixture {
      s.range(0).select(col("id").cast("int").as("r"), col("id").as("b"), col("id").as("c"))
        .write.mode("overwrite").parquet(s"$storeBase/v_init")
      s.range(0).select(col("id").as("batch"), col("id").cast("string").as("tok"),
          col("id").as("est_cnt"))
        .write.mode("overwrite").parquet(resDir)
    }
    val probes = Seq("data", "stream", "table", "the")
    val batches = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorPath =
          if (batchId == 0) s"$storeBase/v_init" else s"$storeBase/v${batchId - 1}"
        val prior = s.read.parquet(priorPath)
        val toks = batch.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val own = Sketches.cmsCells(toks, "tok", depth = 4, width = 256)
        val merged = prior.select(col("r"), col("b"), col("c").as("p"))
          .join(own.select(col("r"), col("b"), col("c").as("o")), Seq("r", "b"), "full_outer")
          .select(col("r"), col("b"),
            (coalesce(col("p"), lit(0L)) + coalesce(col("o"), lit(0L))).as("c"))
          .localCheckpoint(eager = false) // serves both the store write and the probes
        val probeDf = s.createDataFrame(
          s.sparkContext.parallelize(probes.map(org.apache.spark.sql.Row(_))),
          StructType(Seq(StructField("tok", StringType))))
        inParallel(
          () => merged.coalesce(1).write.mode("overwrite")
            .parquet(s"$storeBase/v$batchId"),
          () => Sketches.cmsLookup(merged, probeDf, "tok", depth = 4, width = 256)
            .select(lit(batchId).as("batch"), col("tok"), col("est_cnt"))
            .coalesce(1).write.mode("append").parquet(resDir))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(resDir).orderBy("batch", "tok")
  }

  val streamCmsSql: String =
    """WITH t AS (SELECT doc_id % 3 AS batch,
      |  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
      |  FROM documents),
      |c AS (SELECT batch, r,
      |        ('0x' || substr(md5(r::VARCHAR || '|' || tok), 1, 15))::BIGINT % 256 AS b,
      |        count(*)::BIGINT AS c
      |      FROM t, range(0, 4) rr(r) GROUP BY 1, 2, 3),
      |cum AS (SELECT bb.b AS batch, c.r, c.b AS bk, sum(c.c)::BIGINT AS c
      |        FROM range(0, 3) bb(b) JOIN c ON c.batch <= bb.b GROUP BY 1, 2, 3),
      |p(tok) AS (VALUES ('data'), ('stream'), ('table'), ('the')),
      |pa AS (SELECT tok, r,
      |         ('0x' || substr(md5(r::VARCHAR || '|' || tok), 1, 15))::BIGINT % 256 AS bk
      |       FROM p, range(0, 4) rr(r))
      |SELECT cum.batch::BIGINT AS batch, pa.tok, min(cum.c)::BIGINT AS est_cnt
      |FROM pa JOIN cum ON pa.r = cum.r AND pa.bk = cum.bk
      |GROUP BY 1, 2 ORDER BY batch, tok""".stripMargin

  val streamBoilerplateSql: String =
    """WITH d AS (SELECT doc_id, doc_id % 3 AS batch,
      |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |l AS (SELECT doc_id, batch, unnest(range(0, (len(t)+2)//3)) AS pos, t FROM d),
      |ln AS (SELECT doc_id, batch, pos,
      |         array_to_string(t[pos*3+1:pos*3+3], ' ') AS line FROM l),
      |df AS (SELECT line, batch, count(DISTINCT doc_id) AS c FROM ln GROUP BY 1, 2),
      |cum AS (SELECT line, batch,
      |          sum(c) OVER (PARTITION BY line ORDER BY batch) AS cdf FROM df),
      |k AS (SELECT ln.doc_id, ln.pos, ln.line
      |      FROM ln JOIN cum ON ln.line = cum.line AND ln.batch = cum.batch
      |      WHERE cdf < 2),
      |r AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
      |        string_agg(line, chr(10) ORDER BY pos) AS kept FROM k GROUP BY 1),
      |n AS (SELECT doc_id, ((len(t)+2)//3)::BIGINT AS n_lines FROM d)
      |SELECT n.doc_id, n_lines, coalesce(n_kept, 0)::BIGINT AS n_kept,
      |  md5(coalesce(kept, '')) AS kept_md5
      |FROM n LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin

  val streamDeltaMinhashSql: String = {
    import graft.operators.Dedup
    val perms = Dedup.portablePerms(64)
    val p = Dedup.PortableP
    val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(hs, x -> (x * ${a}::BIGINT + ${b}::BIGINT) % $p)) AS s$i"
    }.mkString(",\n  ")
    val keyCols = (0 until 16).map { bnd =>
      val parts = (0 until 4).map(r => s"s${bnd * 4 + r}::VARCHAR").mkString(" || '-' || ")
      s"md5('$bnd' || '-' || $parts) AS k$bnd"
    }.mkString(",\n  ")
    val keyList = (0 until 16).map(b => s"k$b").mkString(", ")
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    s"""WITH t0 AS (SELECT doc_id, list_distinct(string_split($norm, ' ')) AS ts FROM documents),
       |t AS (SELECT doc_id, ts FROM t0
       |      UNION ALL
       |      SELECT doc_id + 1000000 AS doc_id, ts FROM t0
       |      WHERE doc_id % 100 = 1 AND doc_id % 3 = 1),
       |h AS (SELECT doc_id, list_transform(ts, tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % $p) AS hs FROM t),
       |sig AS (SELECT doc_id,
       |  $sigCols
       |FROM h),
       |keys AS (SELECT doc_id,
       |  $keyCols
       |FROM sig),
       |banded AS (SELECT doc_id, unnest([$keyList]) AS key FROM keys),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |         FROM banded a JOIN banded b USING (key)
       |         WHERE b.doc_id % 3 < a.doc_id % 3),
       |w AS (SELECT doc_id, unnest(ts) AS word FROM t),
       |sz AS (SELECT doc_id, len(ts) AS sz FROM t),
       |inter AS (SELECT c.da, c.db, count(*) AS i
       |          FROM cand c JOIN w wa ON wa.doc_id = c.da
       |          JOIN w wb ON wb.doc_id = c.db AND wb.word = wa.word
       |          GROUP BY 1, 2),
       |ver AS (SELECT da, db, i / (ca.sz + cb.sz - i) AS jacc
       |        FROM inter JOIN sz ca ON da = ca.doc_id JOIN sz cb ON db = cb.doc_id
       |        WHERE i / (ca.sz + cb.sz - i) >= 0.9)
       |SELECT da AS id, db AS keeper, jacc FROM (
       |  SELECT da, db, jacc, row_number() OVER (PARTITION BY da ORDER BY db) AS rn FROM ver)
       |WHERE rn = 1 ORDER BY id""".stripMargin
  }

  def streamAggOfAgg(s: SparkSession, dir: String): DataFrame = {
    val splits = freshDir(dir, "agg_of_agg_src")
    Tables.events(s, dir).select("event_id", "user_id")
      .repartitionByRange(3, col("event_id"))
      .write.mode("overwrite").parquet(splits)
    val inner = s.readStream
      .schema(StructType(Seq(StructField("event_id", LongType), StructField("user_id", LongType))))
      .option("maxFilesPerTrigger", "1") // one batch per split → real retractions
      .parquet(splits)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val store = freshDir(dir, "agg_of_agg_store")
    val q = graft.streaming.ChangelogSink.ParquetUpsertSink.writer(inner, store)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.ChangelogSink.ParquetUpsertSink.snapshot(s, store, Seq("user_id"))
      .groupBy("n_events").agg(count(lit(1)).as("n_users"))
      .orderBy("n_events")
  }

  val streamAggOfAggSql: String =
    Tables.eventsCte +
      """
        |SELECT n_events, count(*) AS n_users
        |FROM (SELECT user_id, count(*) AS n_events FROM ev GROUP BY 1)
        |GROUP BY 1 ORDER BY n_events""".stripMargin

  /** Streaming row-time OVER aggregate (ref:
    * RowTimeRowsUnboundedPrecedingFunction.java): running sum/count per
    * user, each event emitted once its ts clears the watermark.
    */
  def streamOver(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.overUnboundedPreceding[Event, Long](ev, _.user_id, _.event_id, _.tsUs, _.value)
    runToTable("stream_over", out.toDF(), "append")
      .select(col("key").as("user_id"), col("id").as("event_id"),
        round(col("running_sum"), 4).as("rsum"), col("running_cnt").as("rcnt"))
      .orderBy("user_id", "event_id")
  }

  val streamOverSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS rsum,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rcnt
        |FROM ev
        |QUALIFY ts <= (SELECT w FROM wm)
        |ORDER BY user_id, event_id""".stripMargin

  /** Streaming row-time temporal join (ref: TemporalRowTimeJoinOperator
    * .java:400): each purchase probes the latest prior click of the same
    * user; probes resolve when the watermark passes them. Oracle =
    * DuckDB ASOF LEFT JOIN gated on the union-stream watermark.
    */
  def streamTemporalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val probes = ev.filter(col("event_type") === "purchase").as[Event]
    val versions = ev.filter(col("event_type") === "click").as[Event]
    val out = graft.streaming.TemporalJoin.rowTime[Event, Event](
      probes, versions, watermarkDelay = "10 minutes",
      _.user_id, _.ts, _.event_id,
      _.user_id, _.ts, _.event_id, _.value)
    runToTable("stream_tj", out.toDF(), "append")
      .select(col("key").as("user_id"), col("probe_id"), col("version_id").as("click_id"))
      .orderBy("probe_id")
  }

  val streamTemporalJoinSql: String =
    Tables.eventsCte +
      """
        |, u AS (SELECT * FROM ev WHERE event_type IN ('purchase', 'click')),
        |wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM u)
        |SELECT a.user_id, a.event_id AS probe_id, b.click_id
        |FROM (SELECT event_id, user_id, ts FROM u WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM u WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts
        |WHERE a.ts <= (SELECT w FROM wm)
        |ORDER BY probe_id""".stripMargin

  /** Batch CEP over the same pattern (ref: MATCH_RECOGNIZE batch path) —
    * no watermark gate, so every signup matches.
    */
  def cepFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("signup").where(_.event_type == "signup")
      .followedBy("purchase").where(_.event_type == "purchase")
      .within(scala.concurrent.duration.Duration(1, "hour"))
    CEP.batch[Event, Long, (Long, Long, Long)](
      ev, _.user_id, _.tsUs, pattern,
      (key, m) => (key, m.bindings("signup").head.event_id, m.bindings("purchase").head.event_id),
      tieFn = _.event_id)
      .toDF("user_id", "signup_id", "purchase_id")
      .orderBy("signup_id")
  }

  val cepFunnelSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id, signup_id, purchase_id FROM (
        |  SELECT a.user_id, a.event_id AS signup_id, b.event_id AS purchase_id,
        |    row_number() OVER (PARTITION BY a.event_id ORDER BY b.ts, b.event_id) AS rn
        |  FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |  JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |    ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
        |WHERE rn = 1 ORDER BY signup_id""".stripMargin

  /** CEP with a NEGATIVE pattern (ref: Pattern.notFollowedBy,
    * flink-cep pattern/Pattern.java): signup followed by a purchase
    * within 1h with NO intervening click — the guard kills the match
    * if a click precedes the first purchase (clicks are frequent, so
    * the guard actually fires on this data). Oracle: first
    * purchase/click race per signup.
    */
  def cepNegative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase", "click"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("signup").where(_.event_type == "signup")
      .notFollowedBy("poison").where(_.event_type == "click")
      .followedBy("purchase").where(_.event_type == "purchase")
      .within(scala.concurrent.duration.Duration(1, "hour"))
    CEP.batch[Event, Long, (Long, Long, Long)](
      ev, _.user_id, _.tsUs, pattern,
      (k, m) => (k, m.bindings("signup").head.event_id, m.bindings("purchase").head.event_id),
      tieFn = _.event_id)
      .toDF("user_id", "signup_id", "purchase_id")
      .orderBy("signup_id")
  }

  val cepNegativeSql: String =
    Tables.eventsCte +
      """
        |, sp AS (SELECT * FROM ev WHERE event_type IN ('signup', 'purchase', 'click')),
        |firsts AS (
        |  SELECT a.event_id AS signup_id, a.user_id,
        |    (SELECT min(b.ts) FROM sp b WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
        |       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR) AS first_purchase_ts,
        |    (SELECT min(e.ts) FROM sp e WHERE e.user_id = a.user_id AND e.event_type = 'click'
        |       AND e.ts > a.ts) AS first_error_ts
        |  FROM sp a WHERE a.event_type = 'signup')
        |SELECT f.user_id, f.signup_id,
        |  (SELECT min(b.event_id) FROM sp b WHERE b.user_id = f.user_id
        |     AND b.event_type = 'purchase' AND b.ts = f.first_purchase_ts) AS purchase_id
        |FROM firsts f
        |WHERE first_purchase_ts IS NOT NULL
        |  AND (first_error_ts IS NULL OR first_error_ts > first_purchase_ts)
        |ORDER BY signup_id""".stripMargin

  /** Timed-out partial matches (ref: flink-cep PatternTimeoutFunction /
    * TimedOutPartialMatchHandler.java:40 — the timeout side output):
    * view → click → purchase within 24 h; every funnel run that stalls
    * reports the furthest stage it bound (`n_bound`/`last_stage`),
    * the abandoned-cart surface. The oracle derives both tiers
    * independently: a run is a full match iff a click-then-purchase
    * chain exists inside the window (the backtracking matcher tries
    * every click), else it bound 'click' iff any in-window click
    * exists, else it stalled at 'view'.
    */
  def cepTimeout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("view").where(_.event_type == "view")
      .followedBy("click").where(_.event_type == "click")
      .followedBy("purchase").where(_.event_type == "purchase")
      .within(scala.concurrent.duration.Duration(24, "hours"))
    CEP.batchTimedOut[Event, Long, (Long, Long, Long, String)](
      ev, _.user_id, _.tsUs, pattern,
      (k, m) => (k, m.bindings("view").head.event_id,
        m.bindings.size.toLong, m.rows.last._1),
      tieFn = _.event_id)
      .toDF("user_id", "view_id", "n_bound", "last_stage")
      .orderBy("view_id")
  }

  val cepTimeoutSql: String =
    Tables.eventsCte +
      """
        |, base AS (SELECT * FROM ev WHERE event_type IN ('view', 'click', 'purchase')),
        |v AS (SELECT * FROM base WHERE event_type = 'view'),
        |fullm AS (SELECT v.event_id FROM v WHERE EXISTS (
        |    SELECT 1 FROM base c, base p
        |    WHERE c.user_id = v.user_id AND p.user_id = v.user_id
        |      AND c.event_type = 'click' AND p.event_type = 'purchase'
        |      AND c.ts > v.ts AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 24 HOUR)),
        |part AS (SELECT v.user_id, v.event_id AS view_id,
        |    CASE WHEN EXISTS (SELECT 1 FROM base c WHERE c.user_id = v.user_id
        |           AND c.event_type = 'click' AND c.ts > v.ts
        |           AND c.ts <= v.ts + INTERVAL 24 HOUR)
        |         THEN 2 ELSE 1 END AS n_bound
        |  FROM v WHERE v.event_id NOT IN (SELECT event_id FROM fullm))
        |SELECT user_id, view_id, n_bound::BIGINT AS n_bound,
        |  CASE WHEN n_bound = 2 THEN 'click' ELSE 'view' END AS last_stage
        |FROM part ORDER BY view_id""".stripMargin

  /** CEP quantifier tail (ref: Pattern.java timesOrMore:420, until:220,
    * greedy): at least two clicks — views may intervene, the `until`
    * stop condition ends the loop at the first purchase — followed by
    * that purchase; SKIP PAST LAST; ALL-ROWS emission with CLASSIFIER +
    * RUNNING/FINAL count measures. Greedy + until ⇒ the match binds ALL
    * clicks of the inter-purchase segment, which is what the
    * gaps-and-islands oracle computes.
    */
  def cepUntil(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("a").where(_.event_type == "click")
      .timesOrMore(2).until(_.event_type == "purchase").greedy
      .followedBy("b").where(_.event_type == "purchase")
      .afterMatchSkipPastLast
    CEP.batchFlat[Event, Long, (Long, Long, String, Long, Long)](
      ev, _.user_id, _.tsUs, pattern,
      (k, m) => {
        val rows = m.rows
        rows.zipWithIndex.map { case ((cls, e), i) =>
          (k, e.event_id, cls, i + 1L, rows.size.toLong)
        }
      }, tieFn = _.event_id)
      .toDF("user_id", "event_id", "classifier", "running_cnt", "final_cnt")
      .orderBy("user_id", "event_id")
  }

  val cepUntilSql: String =
    Tables.eventsCte +
      """
        |, sp AS (
        |  SELECT event_id, ts, user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rid
        |  FROM ev WHERE event_type IN ('click', 'view', 'purchase')),
        |-- segment id = number of purchases strictly before the row
        |seg AS (
        |  SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY rid
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sid
        |  FROM sp),
        |qual AS (
        |  SELECT user_id, sid FROM seg GROUP BY user_id, sid
        |  HAVING sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 2
        |     AND max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1),
        |m AS (
        |  SELECT s.user_id, s.event_id, s.event_type, s.rid, s.sid
        |  FROM seg s JOIN qual q USING (user_id, sid)
        |  WHERE s.event_type IN ('click', 'purchase'))
        |SELECT user_id, event_id,
        |  CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS classifier,
        |  CAST(row_number() OVER (PARTITION BY user_id, sid ORDER BY rid) AS BIGINT) AS running_cnt,
        |  CAST(count(*) OVER (PARTITION BY user_id, sid) AS BIGINT) AS final_cnt
        |FROM m ORDER BY user_id, event_id""".stripMargin

  /** MATCH_RECOGNIZE ALL ROWS PER MATCH (ref: MatchRecognizeITCase,
    * StreamExecMatch RUNNING/FINAL): PATTERN (a+ b) with SQL strict
    * contiguity — maximal runs of CONSECUTIVE clicks ended immediately
    * by a purchase — emitting per matched row CLASSIFIER(), RUNNING
    * count(*) and FINAL count(*).
    */
  def matchAllRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    MatchRecognize.allRows[Event, Long, (Long, Long, String, Long, Long)](
      ev, _.user_id, _.tsUs, "a+ b",
      Map("a" -> (_.event_type == "click"), "b" -> (_.event_type == "purchase")),
      (k, e, ctx) => (k, e.event_id, ctx.classifier, ctx.runningCnt, ctx.finalCnt))
      .toDF("user_id", "event_id", "classifier", "running_cnt", "final_cnt")
      .orderBy("user_id", "event_id")
  }

  val matchAllRowsSql: String =
    Tables.eventsCte +
      """
        |, sp AS (
        |  SELECT event_id, ts, user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rid
        |  FROM ev WHERE event_type IN ('click', 'view', 'purchase')),
        |-- pnc = rid of the last non-click row before this one
        |pb AS (
        |  SELECT *, coalesce(max(CASE WHEN event_type <> 'click' THEN rid END)
        |    OVER (PARTITION BY user_id ORDER BY rid
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pnc
        |  FROM sp),
        |m AS (
        |  SELECT user_id, rid AS prid, pnc FROM pb
        |  WHERE event_type = 'purchase' AND rid - pnc >= 2)
        |SELECT s.user_id, s.event_id,
        |  CASE WHEN s.event_type = 'click' THEN 'a' ELSE 'b' END AS classifier,
        |  CAST(s.rid - m.pnc AS BIGINT) AS running_cnt,
        |  CAST(m.prid - m.pnc AS BIGINT) AS final_cnt
        |FROM m JOIN pb s ON s.user_id = m.user_id AND s.rid BETWEEN m.pnc + 1 AND m.prid
        |ORDER BY s.user_id, s.event_id""".stripMargin

  /** Streaming sort/limit in Complete mode (ref: StreamExecSortLimit
    * .scala — the reference keeps the global top rows as retractable
    * state; Spark allows orderBy+limit after a streaming aggregation in
    * Complete output mode, where every trigger re-emits the full sorted
    * prefix). Top-3 event types by count.
    */
  def streamSortLimit(s: SparkSession, dir: String): DataFrame = {
    val out = eventStream(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(3)
    runToTable("stream_sort_limit", out, "complete")
      .orderBy(col("cnt").desc, col("event_type"))
  }

  val streamSortLimitSql: String =
    Tables.eventsCte +
      """
        |SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM ev GROUP BY 1 ORDER BY cnt DESC, event_type LIMIT 3""".stripMargin

  /** Per-key count windows — GlobalWindows + CountTrigger(5) + purge
    * (ref: GlobalWindows.java, CountTrigger.java:36, KeyedStream
    * .countWindow): every 5th event of a user fires a window over those
    * 5, in watermark-gated (ts, id) order; the trailing partial window
    * never fires, and events above the final watermark never enter a
    * window.
    */
  def streamCountWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.countWindow[Event, Long](ev, _.user_id, _.event_id, _.tsUs, _.value, size = 5)
    runToTable("stream_count_window", out.toDF(), "append")
      .select(col("key").as("user_id"), col("wid"), col("cnt"),
        col("first_id"), col("last_id"), round(col("sv"), 4).as("sv"))
      .orderBy("user_id", "wid")
  }

  val streamCountWindowSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |r AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
        |  FROM ev WHERE ts <= (SELECT w FROM wm))
        |SELECT user_id, rn // 5 AS wid, count(*) AS cnt,
        |  first(event_id ORDER BY rn) AS first_id,
        |  last(event_id ORDER BY rn) AS last_id,
        |  round(sum(value), 4) AS sv
        |FROM r GROUP BY 1, 2 HAVING count(*) = 5
        |ORDER BY user_id, wid""".stripMargin

  /** GlobalWindows + DeltaTrigger on a keyed stream (ref:
    * windowing/triggers/DeltaTrigger.java:53-64 — the delta-function
    * trigger family, the last §2.6 members without an analog): per
    * event_type, the window fires whenever the value moves more than
    * 150.00 (15000 cents) from the value at the last fire; the emitted
    * row is the fire event plus the running aggregate of the global
    * window (no purge, the reference's contract). Values walk in exact
    * integer cents so the fire decisions are engine-portable; the
    * DuckDB oracle unrolls the same threshold walk with a recursive
    * CTE. The evictor variant is spec-covered
    * ([[graft.streaming.StreamingOps.deltaTriggerWindow]]).
    */
  def streamDeltaTrigger(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.deltaTriggerWindow[Event, String](
      ev, _.event_type, _.event_id, _.tsUs,
      e => math.floor(e.value * 100 + 0.5).toLong, threshold = 15000L)
    runToTable("stream_delta_trigger", out.toDF(), "append")
      .select(col("key").as("event_type"), col("wid"), col("fire_id"),
        col("fire_v"), col("cnt"), col("sv"))
      .orderBy("event_type", "wid")
  }

  val streamDeltaTriggerSql: String =
    Tables.eventsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |, base AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
        |    event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
        |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
        |      PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS psum
        |  FROM ev WHERE ts <= (SELECT w FROM wm))
        |, walk AS (
        |  SELECT event_type, rn, v AS last_fired, FALSE AS fired FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.event_type, b.rn,
        |    CASE WHEN abs(b.v - w.last_fired) > 15000 THEN b.v ELSE w.last_fired END,
        |    abs(b.v - w.last_fired) > 15000
        |  FROM walk w JOIN base b ON b.event_type = w.event_type AND b.rn = w.rn + 1)
        |SELECT b.event_type,
        |  (row_number() OVER (PARTITION BY b.event_type ORDER BY b.rn) - 1)::BIGINT AS wid,
        |  b.event_id AS fire_id, b.v::BIGINT AS fire_v,
        |  b.rn::BIGINT AS cnt, b.psum::BIGINT AS sv
        |FROM walk w JOIN base b ON b.event_type = w.event_type AND b.rn = w.rn
        |WHERE w.fired
        |ORDER BY b.event_type, wid""".stripMargin

  /** ContinuousEventTimeTrigger on a keyed tumbling window (ref:
    * windowing/triggers/ContinuousEventTimeTrigger.java:54-92 — the
    * continuous fire-time timer chain): per event_type, the 1-hour
    * window fires a PARTIAL aggregate at every 20-minute event-time
    * boundary while it fills, then the FINAL aggregate when the
    * watermark passes the window end — see
    * [[graft.streaming.StreamingOps.continuousEventTimeWindow]] for the
    * deterministic re-derivation of the reference's element-anchored
    * timer chain. Values in integer cents; the oracle unrolls the
    * bounded boundary grid (2 partials per hour window) directly.
    */
  def streamContinuousFire(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.continuousEventTimeWindow[Event, String](
      ev, _.event_type, _.tsUs, e => math.floor(e.value * 100 + 0.5).toLong,
      windowUs = 3600L * 1000000L, intervalUs = 1200L * 1000000L)
    runToTable("stream_continuous_fire", out.toDF(), "append")
      .select(col("key").as("event_type"),
        timestamp_micros(col("wstart_us")).as("wstart"),
        timestamp_micros(col("fire_us")).as("fire"),
        col("cnt"), col("sv"), col("is_final"))
      .orderBy("event_type", "wstart", "fire")
  }

  val streamContinuousFireSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |, base AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS wstart, ts,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM ev)
        |, partials AS (
        |  SELECT b.event_type, b.wstart, b.wstart + k.k * INTERVAL '20 minutes' AS fire,
        |    count(*) FILTER (WHERE b.ts <= b.wstart + k.k * INTERVAL '20 minutes')::BIGINT AS cnt,
        |    coalesce(sum(v) FILTER (WHERE b.ts <= b.wstart + k.k * INTERVAL '20 minutes'), 0)::BIGINT AS sv,
        |    FALSE AS is_final
        |  FROM base b CROSS JOIN (SELECT unnest([1, 2]) AS k) k
        |  GROUP BY b.event_type, b.wstart, k.k
        |  HAVING b.wstart + k.k * INTERVAL '20 minutes' <= (SELECT w FROM wm)
        |    AND count(*) FILTER (WHERE b.ts < b.wstart + k.k * INTERVAL '20 minutes') > 0)
        |, finals AS (
        |  SELECT event_type, wstart, wstart + INTERVAL '1 hour' AS fire,
        |    count(*)::BIGINT AS cnt, sum(v)::BIGINT AS sv, TRUE AS is_final
        |  FROM base GROUP BY 1, 2
        |  HAVING fire <= (SELECT w FROM wm))
        |SELECT event_type, wstart, fire, cnt, sv, is_final
        |FROM (SELECT * FROM partials UNION ALL SELECT * FROM finals)
        |ORDER BY event_type, wstart, fire""".stripMargin

  /** Streaming sliding/hopping window (ref: SlidingEventTimeWindows /
    * SQL HOP): 1-hour windows every 30 minutes, append mode — each
    * event feeds 2 windows; emitted ⇔ window end ≤ final watermark.
    */
  def streamHop(s: SparkSession, dir: String): DataFrame = {
    val out = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .select(col("w.start").as("wstart"), col("cnt"), col("sv"))
    runToTable("stream_hop", out, "append").orderBy("wstart")
  }

  val streamHopSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |expanded AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart, value FROM ev
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM ev)
        |SELECT wstart, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM expanded GROUP BY wstart
        |HAVING wstart + INTERVAL '1 hour' <= (SELECT w FROM wm)
        |ORDER BY wstart""".stripMargin

  /** Streaming CUMULATE via pane slicing (ref: the cumulate slicing in
    * StreamExecWindowAggregate — aggregate step-sized panes once,
    * assemble windows from panes): the STREAM runs a plain 15-minute
    * tumbling aggregate (watermark-legal append mode, one pane of state
    * per key), and the emitted panes expand statelessly into the
    * expanding windows they feed. Emitted ⇔ wend within the flushed pane
    * horizon (every pane of such a window has end ≤ watermark, so its
    * sum is complete).
    */
  def streamCumulate(s: SparkSession, dir: String): DataFrame = {
    val panes = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("svr")) // round AFTER assembly
      .select(col("w.start").as("pstart"), col("cnt"), col("svr"))
    val sunk = runToTable("stream_cumulate", panes, "append")
    // Pane horizon (end of the last flushed pane) as a window max INSIDE
    // the frame — every pane appears in ≥1 assembled row, so the max
    // over assembled rows equals the max over panes. No driver-side
    // collect: one fewer job, and an empty sink yields an empty result
    // instead of a null-horizon NPE. The global window is over the tiny
    // pane-aggregate table (bounded by time span), not the input stream.
    graft.operators.CumulateWindows.assemblePanes(sunk, "pstart", stepSec = 900, maxK = 4)
      .withColumn("__horizon",
        max(unix_micros(col("pstart")) + 900L * 1000000L)
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(unix_micros(col("wend")) <= col("__horizon"))
      .groupBy("wstart", "wend")
      .agg(sum("cnt").as("cnt"), round(sum("svr"), 4).as("sv"))
      .orderBy("wstart", "wend")
  }

  val streamCumulateSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |pane AS (
        |  SELECT pstart, cnt, svr FROM (
        |    SELECT time_bucket(INTERVAL '15 minutes', ts) AS pstart,
        |      count(*) AS cnt, sum(value) AS svr
        |    FROM ev GROUP BY 1)
        |  WHERE pstart + INTERVAL '15 minutes' <= (SELECT w FROM wm)),
        |mx AS (SELECT max(pstart) + INTERVAL '15 minutes' AS m FROM pane),
        |base AS (SELECT *, date_trunc('hour', pstart) AS wstart,
        |    CAST(floor(epoch(pstart - date_trunc('hour', pstart)) / 900) AS BIGINT) AS i FROM pane)
        |SELECT * FROM (
        |  SELECT wstart, wstart + k * INTERVAL '15 minutes' AS wend,
        |    CAST(sum(cnt) AS BIGINT) AS cnt, round(sum(svr), 4) AS sv
        |  FROM base JOIN generate_series(1, 4) t(k) ON t.k > base.i
        |  GROUP BY wstart, wend)
        |WHERE wend <= (SELECT m FROM mx)
        |ORDER BY wstart, wend""".stripMargin

  /** followedByAny enumeration (ref: Pattern.followedByAny — the kept
    * ignore edge): EVERY purchase within an hour of a signup pairs with
    * it, one match per pair — the oracle is the plain interval join the
    * semantics collapse to for a 2-stage pattern.
    */
  def cepAny(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("s").where(_.event_type == "signup")
      .followedByAny("p").where(_.event_type == "purchase")
      .within(scala.concurrent.duration.Duration(1, "hour"))
    CEP.batchAll[Event, Long, (Long, Long)](ev, _.user_id, _.tsUs, pattern,
      (_, m) => (m.bindings("s").head.event_id, m.bindings("p").head.event_id),
      tieFn = _.event_id)
      .toDF("a_id", "b_id")
      .orderBy("a_id", "b_id")
  }

  val cepAnySql: String =
    Tables.eventsCte +
      """
        |SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a_id, b_id""".stripMargin

  /** Evictor window (ref: WindowedStream.evictor — CountEvictor(3)
    * before the window function): hourly tumbling windows per user keep
    * only their LAST 3 events (by event time) when firing; the window
    * function aggregates the survivors.
    */
  def streamEvictWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = StreamingOps.evictingTumbleWindow[Event, Long](
      ev, _.user_id, _.event_id, _.tsUs, _.value,
      windowUs = 3600L * 1000000L, keepCount = Some(3))
    runToTable("stream_evict", out.toDF(), "append")
      .select(col("key").as("user_id"), timestamp_micros(col("wstartUs")).as("wstart"),
        col("cnt"), round(col("sv"), 4).as("sv"))
      .orderBy("user_id", "wstart")
  }

  val streamEvictWindowSql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev),
        |r AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS wstart, value,
        |    row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev)
        |SELECT user_id, wstart, count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM r WHERE rn <= 3 AND wstart + INTERVAL 1 HOUR <= (SELECT w FROM wm)
        |GROUP BY 1, 2 ORDER BY user_id, wstart""".stripMargin

  /** STREAMING followedByAny enumeration (ref: CepOperator with the
    * kept ignore edge): each (signup, purchase-within-1h) pair emits
    * exactly once, when its signup clears the decidability horizon
    * (signup + within ≤ final watermark).
    */
  def streamCepAny(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = eventStream(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val pattern = Pattern.begin[Event]("s").where(_.event_type == "signup")
      .followedByAny("p").where(_.event_type == "purchase")
      .within(scala.concurrent.duration.Duration(1, "hour"))
    val out = CEP.streamingAll[Event, Long, (Long, Long)](ev, _.user_id, _.tsUs, pattern,
      (_, m) => (m.bindings("s").head.event_id, m.bindings("p").head.event_id),
      tieFn = _.event_id)
    runToTable("stream_cep_any", out.toDF("a_id", "b_id"), "append")
      .orderBy("a_id", "b_id")
  }

  val streamCepAnySql: String =
    Tables.eventsCte +
      """
        |, wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
        |SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM (SELECT * FROM ev WHERE event_type = 'signup') a
        |JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |WHERE a.ts + INTERVAL 1 HOUR <= (SELECT w FROM wm)
        |ORDER BY a_id, b_id""".stripMargin

  /** Late-fire emission by side-output merge-back (ref: WindowEmitStrategy
    * .scala late-fire triggers; WindowedStream.java:158 allowedLateness;
    * WindowOperator.java's late-element branch). Spark's streaming
    * aggregate cannot re-fire a window already emitted past the
    * watermark, so the reference's OBSERVABLE late-fire behavior is
    * reproduced outside it: the [[graft.streaming.LateData]] splitter
    * classifies each micro-batch against the same monotonic watermark the
    * engine would use; on-time rows append 1-hour tumbling-window
    * partials to a store, watermark-late rows within the allowed lateness
    * (window end + 1 h still above the watermark) append UPDATE partials
    * into the same windows — these are the late fires, counted per window
    * in `n_late` — and rows past allowed lateness are dropped exactly
    * like the reference's too-late branch. The snapshot groupBy collapses
    * the partial history into final window rows, i.e. the result a
    * downstream consumer of ALLOWED_LATENESS + late-fire updates would
    * retain.
    *
    * The 3-way micro-batch split is ntile(3) over a deterministic
    * jittered ordering (pure arithmetic on (ts, event_id)), so batch
    * membership, each batch's watermark, and the late/merged/dropped
    * classification are all SQL-expressible — the DuckDB oracle replays
    * the whole pipeline exactly, n_late included.
    */
  def streamLateUpdate(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.expressions.Window

    val jitterKey = unix_micros(col("ts")) + (col("event_id") % 97) * lit(300000000L)
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("b", ntile(3).over(Window.orderBy(jitterKey, col("event_id"))) - 1)
    // one file per micro-batch: ONE partitionBy write (a single job —
    // three filter+sort+write jobs cost ~3× the prep latency), then
    // explicit names AND strictly increasing mtimes so the file source
    // processes b0<b1<b2 regardless of its (mtime, path) tie rules
    val srcDir = freshDir(dir, "late_update_src")
    Files.createDirectories(Paths.get(srcDir))
    val tmp = freshDir(dir, "late_update_tmp")
    ev.coalesce(1).write.partitionBy("b").mode("overwrite").parquet(tmp)
    for (b <- 0 until 3) {
      val part = new java.io.File(s"$tmp/b=$b").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dest = Paths.get(srcDir, s"b$b.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + b * 2000L))
    }

    val store = freshDir(dir, "late_update_store")
    val splitter = new graft.streaming.LateData("ts", delayMs = 10 * 60 * 1000L)
    val latenessUs = 3600L * 1000000L
    def partials(df: DataFrame, late: Boolean): DataFrame =
      df.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
        .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("sv"),
          (if (late) col("cnt") else lit(0L)).as("n_late"))
    val handler = splitter.foreachBatch(
      main = b => partials(b, late = false).write.mode("append").parquet(store),
      late = b => {
        // allowed lateness: merge only while the window's end + lateness
        // is still ahead of the watermark (the splitter's wm is updated
        // AFTER the handlers run, so this is the batch's own cutoff)
        val merged = b.filter(
          expr("((unix_micros(ts) div 3600000000) + 1) * 3600000000") + lit(latenessUs)
            > lit(splitter.watermarkUs))
        partials(merged, late = true).write.mode("append").parquet(store)
      })

    val src = s.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("event_type", StringType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = src.writeStream.foreachBatch(handler).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.parquet(store)
      .groupBy("wstart", "event_type")
      .agg(sum("cnt").as("cnt"), round(sum("sv"), 4).as("sv"), sum("n_late").as("n_late"))
      .orderBy("wstart", "event_type")
  }

  val streamLateUpdateSql: String =
    Tables.eventsCte +
      """
        |, bt AS (SELECT event_id, ts, event_type, value,
        |    ntile(3) OVER (ORDER BY epoch_us(ts) + (event_id % 97) * 300000000, event_id) - 1 AS b
        |  FROM ev)
        |, wms AS (SELECT b,
        |    max(mx) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      - INTERVAL 10 MINUTE AS wm
        |  FROM (SELECT b, max(ts) AS mx FROM bt GROUP BY b))
        |, cls AS (SELECT bt.*, wms.wm,
        |    (wms.wm IS NOT NULL AND bt.ts < wms.wm) AS late
        |  FROM bt JOIN wms USING (b))
        |, kept AS (SELECT * FROM cls
        |  WHERE NOT late OR time_bucket(INTERVAL '1 hour', ts) + INTERVAL 2 HOUR > wm)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  count(*)::BIGINT AS cnt, round(sum(value), 4) AS sv,
        |  sum(CASE WHEN late THEN 1 ELSE 0 END)::BIGINT AS n_late
        |FROM kept GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** Streaming feature-store maintenance: the hashed user feature
    * vectors of `q_evt_feature_hash` are PURE SUMS of per-event signed
    * contributions, so the incremental form is the cleanest possible
    * maintainer — per batch, hash the batch's features and sum-merge
    * into the versioned (user, dim) store; state is the feature store
    * itself (users × active dims), every increment costs only the
    * increment, and any batching/order/split produces the identical
    * store. Oracle = the batch featurization verbatim — the feature
    * store a training pipeline reads at serving time must equal the
    * one-shot batch computation.
    */
  def streamFeatureHash(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    val srcDir = stageBatchFiles(dir, "sfh", daySplits(ev, col("ts"), 3))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sfh_store"))
    store.init(s.range(0).select(col("id").as("user_id"), col("id").as("dim"),
      col("id").as("val")))
    val batches = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val feats = batch.select(col("user_id"), explode(array(
          concat(lit("t:"), col("event_type")),
          concat(lit("h:"), hour(col("ts"))),
          concat(lit("d:"), dayofweek(col("ts"))))).as("f"))
        val own = graft.operators.Curation.featureHash(feats, "user_id", "f", dim = 32)
          .select(col("key").as("user_id"), col("dim"), col("val"))
        store.write(batchId, store.prior(batchId)
          .unionByName(own)
          .groupBy("user_id", "dim").agg(sum("val").as("val")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store.version(lastBatchId(srcDir))
      .select(col("user_id"), col("dim"), col("val").cast("long").as("val"))
      .orderBy("user_id", "dim")
  }

  /** The batch featurization verbatim — signed sums must be invariant
    * to batching and arrival order.
    */
  val streamFeatureHashSql: String = AnalyticsQueries.evtFeatureHashSql

  /** SoftDedup weights maintained on a document stream
    * ([[PipelineQueries.docSoftDedup]] as a live-ingest maintainer):
    * BOTH states ride [[graft.streaming.DeltaStore]], so every batch's
    * write is increment-sized — the (id, ffp) fingerprint table appends
    * the batch's rows, and the df-count state appends the batch's
    * PARTIAL (ffp, df) counts (a sum-mergeable grid; the solve
    * sum-merges at read, the same contract as a map-side combine). The
    * solve is the batch query over the two snapshots, so the oracle is
    * the batch statement VERBATIM and arrival order (doc_id % 3 splits)
    * cannot matter.
    */
  def streamSoftDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "ssdd",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val fpStore = graft.streaming.DeltaStore(s, freshDir(dir, "ssdd_fp"))
    val dfStore = graft.streaming.DeltaStore(s, freshDir(dir, "ssdd_df"))
    fpStore.init(s.range(0).select(col("id"), lit("").as("ffp")))
    dfStore.init(s.range(0).select(lit("").as("ffp"), col("id").as("df")))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fp = batch.select(col("doc_id").cast("long").as("id"),
          md5(graft.operators.TextAnalysis.dedupFold(col("text"))).as("ffp"))
          .localCheckpoint(eager = false)
        inParallel(
          () => fpStore.append(batchId, fp),
          () => dfStore.append(batchId, fp.groupBy("ffp").agg(count(lit(1)).as("df"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val last = lastBatchId(srcDir)
    val dfc = dfStore.snapshot(last).groupBy("ffp").agg(sum("df").as("df"))
    fpStore.snapshot(last).join(dfc, "ffp")
      .select(col("id").as("doc_id"), col("df"),
        (floor(lit(1e6) / col("df")).cast("long") / 1e6).as("w"))
      .orderBy("doc_id")
  }

  /** SemDeDup maintained on an embedding stream
    * ([[PipelineQueries.embSemDedup]] as a live-ingest maintainer): the
    * clustering MODEL is the batch-trained k-means (the paper clusters
    * once; refreshes are offline model swaps — the model is staged as a
    * fixture here), and the maintainer keeps the ASSIGNMENT table live:
    * each micro-batch assigns its vectors against the fixed broadcast
    * centroids and APPENDS (vec_id, e, cid, ccos) to a
    * [[graft.streaming.DeltaStore]], so per-batch write ∝ batch size,
    * never corpus size. Duplicate marks are a SET-level decision (a
    * late-arriving outlier outranks earlier members and can flip their
    * marks), so the solve re-runs [[Similarity.semDeDupSolve]] over the
    * snapshot rather than patching marks incrementally — the batch
    * statement is the oracle VERBATIM and arrival order (vec_id % 3
    * splits) cannot matter.
    */
  def streamSemDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val srcDir = stageBatchFiles(dir, "ssem",
      (0 until 3).map(b => emb.filter(col("vec_id") % 3 === b)))
    val cent = graft.BenchMeters.fixture {
      Similarity.kmeansCentroids(emb, k = 8, iters = 2).localCheckpoint(eager = false)
    }
    val store = graft.streaming.DeltaStore(s, freshDir(dir, "ssem_a"))
    store.init(s.range(0).select(col("id").as("vec_id"),
      array().cast("array<double>").as("e"),
      col("id").cast("int").as("cid"), lit(0.0).as("ccos")))
    val q = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batchId, Similarity.semDeDupAssign(batch, cent))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Similarity.semDeDupSolve(store.snapshot(lastBatchId(srcDir)), tau = 0.35)
      .orderBy("vec_id")
  }

  /** Mojibake detect/repair maintained on a document stream
    * ([[PipelineQueries.docMojibake]] as a live-ingest maintainer):
    * every output column is an ADDITIVE per-source sum (doc count,
    * marker counts before/after repair, repaired-text checksum sum), so
    * each micro-batch appends its OWN ≤¦sources¦-row partial profile to
    * a [[graft.streaming.DeltaStore]] and the solve sum-merges at read
    * — the map-side-combine contract, per-batch write ≤ ¦sources¦ rows.
    * Oracle is the batch statement VERBATIM; doc_id % 3 splits prove
    * arrival order cannot matter.
    */
  def streamMojibake(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
    val srcDir = stageBatchFiles(dir, "smoji",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.DeltaStore(s, freshDir(dir, "smoji_st"))
    store.init(s.range(0).select(lit("").as("source"), col("id").as("n_docs"),
      col("id").as("n_mojibake"), col("id").as("markers_before"),
      col("id").as("markers_after"), col("id").as("fixed_checksum")))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batchId, PipelineQueries.mojibakeProfile(batch))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store.snapshot(lastBatchId(srcDir))
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("n_mojibake").as("n_mojibake"),
        sum("markers_before").as("markers_before"),
        sum("markers_after").as("markers_after"),
        sum("fixed_checksum").as("fixed_checksum"))
      .orderBy("source")
  }

  /** DoReMi mixture weights maintained on a document stream
    * ([[PipelineQueries.docDoremi]] as a live-ingest maintainer): the
    * state is the token-INSTANCE profile (doc_id, source, tok) on a
    * [[graft.streaming.DeltaStore]] — each micro-batch tokenizes its
    * own documents and appends, so per-batch write ∝ batch tokens. The
    * proxy loss −log p(tok) depends on the FINAL global unigram model
    * (counts over everything ever ingested), so per-source loss
    * partials are NOT additive across batches — the solve re-runs the
    * batch tail ([[PipelineQueries.doremiFromToks]]: model, per-doc
    * instance means, the 5-round Group-DRO iteration on the
    * ¦sources¦-row table) over the snapshot, making the batch statement
    * the oracle VERBATIM and arrival order (doc_id % 3) immaterial.
    */
  def streamDoremi(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
    val srcDir = stageBatchFiles(dir, "sdrm",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.DeltaStore(s, freshDir(dir, "sdrm_tok"))
    store.init(s.range(0).select(col("id").as("doc_id"),
      lit("").as("source"), lit("").as("tok")))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batchId, PipelineQueries.doremiToks(batch))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    PipelineQueries.doremiFromToks(store.snapshot(lastBatchId(srcDir)))
  }

  /** Min-k% membership audit maintained on a document stream
    * ([[PipelineQueries.docMink]] as a live monitor): the state is the
    * token-instance profile (doc_id, tok) on a
    * [[graft.streaming.DeltaStore]] — the same posture as
    * [[streamDoremi]], and for the same reason: −log p rides the FINAL
    * global unigram model, so neither per-doc scores nor the percentile
    * flags are additive. Write ∝ batch tokens; the solve re-runs the
    * batch tail over the snapshot, so the batch statement is the oracle
    * VERBATIM.
    */
  def streamMink(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "smink",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.DeltaStore(s, freshDir(dir, "smink_tok"))
    store.init(s.range(0).select(col("id").as("doc_id"), lit("").as("tok")))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batchId, batch.select(col("doc_id"),
          explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    PipelineQueries.minkFromToks(store.snapshot(lastBatchId(srcDir)))
  }

  /** Streaming KMV (bottom-k theta) maintenance — the LOSSLESS merge
    * in the sketch family: the k smallest of (prior sketch ∪ the
    * batch's own bottom-k) IS the whole-corpus bottom-k, exactly — so
    * unlike HLL (max-merge, estimate drift-free but lossy) the
    * maintained sketch is BIT-IDENTICAL to the batch-built one and the
    * batch statement oracles the stream VERBATIM. Store state is ≤k
    * rows forever; the exact-distinct audit column rides a DeltaStore
    * of per-batch distinct shingles (the column a 100 TB run drops —
    * [[graft.queries.SketchQueries.docKmv]]'s documented posture).
    */
  def streamKmv(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Funnel, Sketches, TextAnalysis}
    import org.apache.spark.sql.expressions.Window
    val k = 256
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "skmv",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "skmv_store"))
    store.init(s.range(0).select(col("id").as("h")))
    val audit = graft.streaming.DeltaStore(s, freshDir(dir, "skmv_audit"))
    audit.init(s.range(0).select(col("id").cast("string").as("sh")))
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sh = batch.select(explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
          .localCheckpoint(eager = false)
        val own = Sketches.kmvValues(sh, "sh", k).select("h")
        // bottom-k of the union of bottom-ks = the global bottom-k
        // (min-merge); the window runs over ≤2k rows
        inParallel(
          () => store.write(batchId, store.prior(batchId).unionByName(own).distinct()
            .withColumn("rk", row_number().over(Window.orderBy("h")))
            .filter(col("rk") <= k).select("h")),
          () => audit.append(batchId, sh.distinct()))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val last = lastBatchId(srcDir)
    val vals = Funnel.stageLazy(store.version(last)
      .withColumn("rank", row_number().over(Window.orderBy("h")).cast("long")))
    val est = Sketches.kmvEstimate(vals.select("h"), k)
    val exact = audit.snapshot(last).agg(count_distinct(col("sh")).as("n_exact"))
    vals.crossJoin(broadcast(est)).crossJoin(broadcast(exact))
      .select(col("rank"), col("h"), col("est_distinct"),
        col("n_exact").cast("long").as("n_exact"))
      .orderBy("rank")
  }

  /** Streaming Bloom-filter maintenance — the OR-merge leg of the
    * windowable-sketch algebra (HLL max, count-min sum, KMV min, Bloom
    * OR): the BASE corpus arrives in 3 micro-batches, each batch's bit
    * positions distinct-union into the persisted position store (set
    * union is associative and idempotent, so the maintained filter
    * EQUALS the batch-built one regardless of batching or replays;
    * state ≤ mBits rows forever). The end-of-stream solve probes the
    * same delta [[graft.queries.SketchQueries.docBloomDelta]] probes,
    * with the exact-dup audit read from a base-fingerprint DeltaStore
    * — the batch statement oracles the stream VERBATIM.
    */
  def streamBloom(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Funnel, Sketches, TextAnalysis}
    val docs = Funnel.stageLazy(Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")))
    val base = docs.filter(col("doc_id") % 10 =!= 7)
    val srcDir = stageBatchFiles(dir, "sblm",
      (0 until 3).map(b => base.filter(col("doc_id") % 3 === b)))
    val store = graft.streaming.VersionedStore(s, freshDir(dir, "sblm_bits"))
    store.init(s.range(0).select(col("id").as("pos")))
    val fpStore = graft.streaming.DeltaStore(s, freshDir(dir, "sblm_fp"))
    fpStore.init(s.range(0).select(col("id").cast("string").as("fp")))
    val q = s.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        inParallel(
          () => store.write(batchId, store.prior(batchId)
            .unionByName(Sketches.bloomBits(batch, "fp", k = 3, mBits = 4096))
            .distinct()),
          () => fpStore.append(batchId, batch.select("fp")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val last = lastBatchId(srcDir)
    val delta = docs.filter(col("doc_id") % 10 === 7)
      .unionByName(docs.filter(col("doc_id") % 100 === 1)
        .select((col("doc_id") + 1000000).as("doc_id"), col("fp")))
    val hits = Sketches.bloomProbe(store.version(last), delta, "fp", k = 3, mBits = 4096)
    val exact = delta.join(
        fpStore.snapshot(last).select("fp").distinct().withColumn("dup", lit(1)),
        Seq("fp"), "left")
      .select(col("doc_id"), coalesce(col("dup"), lit(0)).cast("long").as("exact_dup"))
    hits.select(col("doc_id"), col("bloom_hit"))
      .join(exact, "doc_id")
      .orderBy("doc_id")
  }

  /** Streaming Misra–Gries maintenance — the mergeable-summaries
    * posture (Agarwal et al. 2012) as a maintainer: each micro-batch
    * builds its OWN ≤k-counter summary
    * ([[graft.operators.Sketches.mgHeavyHitters]]'s aggregator), which
    * merges into the versioned counter store by the same rule the
    * aggregator's own merge uses — sum pairwise, subtract the
    * (k+1)-th largest, drop non-positives (a windowed rank over ≤2k
    * rows; when the union fits in k the subtrahend aggregate is null
    * and coalesces to 0, which IS the no-op case of the rule). State
    * is ≤k rows forever. Because the guarantee survives ANY merge
    * tree, the final store's candidates are a superset of the
    * frequency > n/(k+1) set, so the end-of-stream exact verify over
    * the staged corpus emits EXACTLY the batch answer — the oracle is
    * [[graft.queries.SketchQueries.docMgHeavySql]] verbatim.
    */
  def streamMg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Sketches, TextAnalysis}
    val K = 24
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val srcDir = stageBatchFiles(dir, "smg",
      (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b)))
    val storeBase = freshDir(dir, "smg_store")
    graft.BenchMeters.fixture {
      s.range(0).select(col("id").cast("string").as("item"), col("id").as("c"))
        .write.mode("overwrite").parquet(s"$storeBase/v_init")
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorPath =
          if (batchId == 0) s"$storeBase/v_init" else s"$storeBase/v${batchId - 1}"
        val prior = s.read.parquet(priorPath)
        val pfx = batch.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .select(substring(col("tok"), 1, 1).as("pfx"))
        val own = Sketches.mgSummary(pfx, "pfx", K)
        val summed = prior.select(col("item"), col("c").as("pc"))
          .join(own.select(col("item"), col("c").as("oc")), Seq("item"), "full_outer")
          .select(col("item"),
            (coalesce(col("pc"), lit(0L)) + coalesce(col("oc"), lit(0L))).as("c"))
        val wRank = org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("item")) // ≤2k rows: bounded
        val ranked = summed.withColumn("rn", row_number().over(wRank)).localCheckpoint(eager = false)
        val sub = ranked.agg(max(when(col("rn") === K + 1, col("c"))).as("sub"))
        ranked.crossJoin(broadcast(sub))
          .select(col("item"), (col("c") - coalesce(col("sub"), lit(0L))).as("c"))
          .filter(col("c") > 0)
          .coalesce(1).write.mode("overwrite").parquet(s"$storeBase/v$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // end-of-stream: candidate-restricted exact verify over the corpus
    val cand = s.read.parquet(s"$storeBase/v${lastBatchId(srcDir)}")
      .select(col("item").as("pfx"))
    val corpus = s.read.parquet(srcDir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(substring(col("tok"), 1, 1).as("pfx"))
    val n = corpus.agg(count(lit(1)).as("n"))
    corpus.join(broadcast(cand), "pfx")
      .groupBy("pfx").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * (K + 1) > col("n"))
      .select(col("pfx"), col("cnt").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("pfx"))
  }

  /** Streaming iteration — ref `DataStream.iterate:434-473`
    * (IterativeStream + the feedback edge; the reference quickstart's
    * own demo is exactly this decrement-to-zero program). Micro-batch
    * re-expression: the feedback edge is a versioned in-flight store;
    * each trigger passes (new arrivals ∪ fed-back rows) through the
    * iteration body ONCE (the feedback delay = one micro-batch, like
    * the reference's buffer timeout), splits done rows to the output
    * and routes the rest back. When the source drains, the remaining
    * feedback loops to empty (the drain-on-termination the reference's
    * closed loop performs) — each drain round is one more pass, so
    * `finished_pass` stays arrival_batch + start − 1 seamlessly across
    * the stream/drain boundary, which the oracle pins arithmetically.
    * In-flight state is bounded by rows-still-iterating, independent
    * of stream length.
    */
  def streamIterate(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir).select("user_id").distinct()
      .select(col("user_id"), (col("user_id") % 5 + 1).as("value"))
    val srcDir = stageBatchFiles(dir, "sit",
      (0 until 3).map(b => users.filter(col("user_id") % 3 === b)))
    val fbBase = freshDir(dir, "sit_fb")
    val resDir = freshDir(dir, "sit_res")
    graft.BenchMeters.fixture {
      s.range(0).select(col("id").as("user_id"), col("id").as("value"),
        col("id").as("steps")).write.mode("overwrite").parquet(s"$fbBase/v_init")
      s.range(0).select(col("id").as("user_id"), col("id").as("steps"),
        col("id").as("finished_pass")).write.mode("overwrite").parquet(resDir)
    }
    def pass(inflow: DataFrame, passId: Long): DataFrame = {
      val stepped = inflow
        .select(col("user_id"), (col("value") - 1).as("value"),
          (col("steps") + 1).as("steps"))
        .localCheckpoint(eager = false) // serves both the done split and the feedback
      stepped.filter(col("value") <= 0)
        .select(col("user_id"), col("steps"), lit(passId).as("finished_pass"))
        .coalesce(1).write.mode("append").parquet(resDir)
      stepped.filter(col("value") > 0)
    }
    val batches = s.readStream
      .schema(StructType(Seq(StructField("user_id", LongType),
        StructField("value", LongType))))
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val priorPath =
          if (batchId == 0) s"$fbBase/v_init" else s"$fbBase/v${batchId - 1}"
        val inflow = batch
          .select(col("user_id"), col("value"), lit(0L).as("steps"))
          .unionByName(s.read.parquet(priorPath))
        pass(inflow, batchId)
          .coalesce(1).write.mode("overwrite").parquet(s"$fbBase/v$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // source drained: loop the feedback edge until it empties
    var fb = s.read.parquet(s"$fbBase/v${lastBatchId(srcDir)}")
    var passId = lastBatchId(srcDir) + 1
    while (!fb.isEmpty) {
      // EAGER: isEmpty (a partial action) is this frame's first consumer,
      // and a lazy boundary would checkpoint only the probed partitions,
      // paying a missing-partitions recompute job on the next pass
      fb = pass(fb, passId).localCheckpoint()
      passId += 1
    }
    s.read.parquet(resDir)
      .select(col("user_id"), col("steps").cast("long").as("steps"),
        col("finished_pass").cast("long").as("finished_pass"))
      .orderBy("user_id")
  }

  val streamIterateSql: String =
    Tables.eventsCte +
      """
        |SELECT DISTINCT user_id, (user_id % 5 + 1)::BIGINT AS steps,
        |  (user_id % 3 + user_id % 5)::BIGINT AS finished_pass
        |FROM ev ORDER BY user_id""".stripMargin

  /** Queryable state — ref `KeyedStream.asQueryableState:1015-1082` +
    * `flink-queryable-state` (KvStateServer / QueryableStateClient): a
    * running job's keyed state answers external point queries WHILE the
    * stream runs. Here the per-user (event count, value total) aggregate
    * is maintained in a [[graft.streaming.VersionedStore]] registered
    * under a public name; after each batch commits+publishes, an external
    * [[graft.streaming.QueryableState.Client]] point-queries the LIVE
    * state for a fixed 5-user probe set (one key-pushdown read, the
    * client-side batching of 5 `getKvState` calls). The emitted probe
    * answers are therefore each batch's mid-stream client view; the
    * oracle recomputes every prefix's per-user aggregate from scratch —
    * hash-matching probe answers prove the published state is exactly
    * the prefix state at every point a client could have looked.
    * State is user-linear; a probe reads one committed single-file
    * version with the key predicate at the scan, never the corpus.
    */
  def streamQueryable(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{QueryableState, VersionedStore}
    val ev = Tables.events(s, dir).select("user_id", "value", "ts")
    val srcDir = stageBatchFiles(dir, "sqst", daySplits(ev, col("ts"), 3))
    val store = VersionedStore(s, freshDir(dir, "sqst_store"))
    val resDir = freshDir(dir, "sqst_res")
    val probes: Seq[Any] = graft.BenchMeters.fixture {
      // the client's key list (5 lowest user ids) — probe-set setup
      ev.select("user_id").distinct().orderBy("user_id").limit(5)
        .collect().map(_.getLong(0)).toSeq
    }
    store.init(s.range(0).select(col("id").as("user_id"),
      col("id").as("cnt"), col("id").cast("double").as("total")))
    val qname = s"uagg_${System.nanoTime()}" // fresh per run; client resolves by name
    QueryableState.register(qname, store)
    val client = new QueryableState.Client
    val batches = s.readStream
      .schema(StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("ts", TimestampType))))
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = store.prior(batchId)
        val own = batch.groupBy("user_id")
          .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
        val merged = prior
          .select(col("user_id"), col("cnt").as("pc"), col("total").as("pt"))
          .join(own.select(col("user_id"), col("cnt").as("oc"), col("total").as("ot")),
            Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("pc"), lit(0L)) + coalesce(col("oc"), lit(0L))).as("cnt"),
            (coalesce(col("pt"), lit(0.0)) + coalesce(col("ot"), lit(0.0))).as("total"))
        store.write(batchId, merged)
        QueryableState.publish(qname, batchId)
        // external client's mid-stream view of the live state
        client.getKvStates(qname, "user_id", probes)
          .select(lit(batchId).as("batch"), col("user_id"),
            col("cnt"), round(col("total"), 2).as("total"))
          .coalesce(1).write.mode("append").parquet(resDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    QueryableState.deregister(qname)
    s.read.parquet(resDir).orderBy("batch", "user_id")
  }

  val streamQueryableSql: String =
    Tables.eventsCte +
      """
        |, bnd AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM ev)
        |, wd AS (SELECT d0,
        |    greatest(1, (date_diff('day', d0, d1) + 1 + 2) // 3) AS width FROM bnd)
        |, e2 AS (SELECT ev.user_id, ev.value,
        |    least(2, date_diff('day', wd.d0, CAST(ev.ts AS DATE)) // wd.width) AS b
        |  FROM ev, wd)
        |, probe AS (SELECT DISTINCT user_id FROM ev ORDER BY user_id LIMIT 5)
        |SELECT bb.b::BIGINT AS batch, e2.user_id,
        |  count(*)::BIGINT AS cnt, round(sum(e2.value), 2) AS total
        |FROM range(0, 3) bb(b)
        |JOIN e2 ON e2.b <= bb.b
        |WHERE e2.user_id IN (SELECT user_id FROM probe)
        |GROUP BY 1, 2 ORDER BY batch, user_id""".stripMargin

  /** State-Processor-API analog — ref `flink-state-processing-api`
    * (`Savepoint.create` + `BootstrapTransformation` write a savepoint
    * OFFLINE from a batch dataset; a streaming job then restores from
    * it). The per-user (count, total) state over the historical first
    * third of events is built by an ordinary batch aggregation and
    * installed as the store's pre-first-batch version
    * ([[graft.streaming.VersionedStore.bootstrap]]); the stream then
    * resumes over ONLY the remaining two thirds, merging increments.
    * The final state is read back offline (the Savepoint reader side).
    * Oracle = the whole-corpus batch aggregate verbatim: bootstrap +
    * resume must be indistinguishable from having streamed everything —
    * the savepoint contract. At scale this is how a 100-TB backfill
    * meets a live stream: one batch job seeds the state, the stream
    * only ever pays for increments.
    */
  def streamBootstrap(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.VersionedStore
    val ev = Tables.events(s, dir).select("user_id", "value", "ts")
    val splits = daySplits(ev, col("ts"), 3)
    val store = VersionedStore(s, freshDir(dir, "sboot_store"))
    // offline bootstrap write — measured operator work, not fixture
    store.bootstrap(splits.head.groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), sum("value").as("total")))
    val srcDir = stageBatchFiles(dir, "sboot", splits.tail)
    val batches = s.readStream
      .schema(StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("ts", TimestampType))))
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = store.prior(batchId)
        val own = batch.groupBy("user_id")
          .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
        store.write(batchId, prior
          .select(col("user_id"), col("cnt").as("pc"), col("total").as("pt"))
          .join(own.select(col("user_id"), col("cnt").as("oc"), col("total").as("ot")),
            Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("pc"), lit(0L)) + coalesce(col("oc"), lit(0L))).as("cnt"),
            (coalesce(col("pt"), lit(0.0)) + coalesce(col("ot"), lit(0.0))).as("total")))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Savepoint reader: offline read of the final state
    store.version(lastBatchId(srcDir))
      .select(col("user_id"), col("cnt"), round(col("total"), 2).as("total"))
      .orderBy("user_id")
  }

  val streamBootstrapSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id, count(*)::BIGINT AS cnt, round(sum(value), 2) AS total
        |FROM ev GROUP BY 1 ORDER BY user_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_stream_curate", streamCurate, Some(streamCurateSql)),
    Q("q_stream_delta_minhash", streamDeltaMinhash, Some(streamDeltaMinhashSql)),
    Q("q_stream_boilerplate", streamBoilerplate, Some(streamBoilerplateSql)),
    Q("q_stream_hll", streamHll, Some(streamHllSql)),
    Q("q_stream_cms", streamCms, Some(streamCmsSql)),
    Q("q_stream_late_update", streamLateUpdate, Some(streamLateUpdateSql)),
    Q("q_stream_cep_any", streamCepAny, Some(streamCepAnySql)),
    Q("q_stream_evict_window", streamEvictWindow, Some(streamEvictWindowSql)),
    Q("q_stream_hop", streamHop, Some(streamHopSql)),
    Q("q_cep_any", cepAny, Some(cepAnySql)),
    Q("q_stream_cumulate", streamCumulate, Some(streamCumulateSql)),
    Q("q_stream_sort_limit", streamSortLimit, Some(streamSortLimitSql)),
    Q("q_stream_count_window", streamCountWindow, Some(streamCountWindowSql)),
    Q("q_stream_delta_trigger", streamDeltaTrigger, Some(streamDeltaTriggerSql)),
    Q("q_stream_continuous_fire", streamContinuousFire, Some(streamContinuousFireSql)),
    Q("q_cep_negative", cepNegative, Some(cepNegativeSql)),
    Q("q_cep_timeout", cepTimeout, Some(cepTimeoutSql)),
    Q("q_cep_until", cepUntil, Some(cepUntilSql)),
    Q("q_match_all_rows", matchAllRows, Some(matchAllRowsSql)),
    Q("q_cep_funnel", cepFunnel, Some(cepFunnelSql)),
    Q("q_stream_tumble", streamTumble, Some(streamTumbleSql)),
    Q("q_stream_session", streamSession, Some(streamSessionSql)),
    Q("q_stream_session_dyn", streamSessionDynamic, Some(streamSessionDynamicSql)),
    Q("q_stream_comatch", streamCoMatch, Some(streamCoMatchSql)),
    Q("q_stream_sessionize", streamSessionize, Some(streamSessionizeSql)),
    Q("q_stream_rules", streamRules, Some(streamRulesSql)),
    Q("q_stream_time_travel", streamTimeTravel, Some(streamTimeTravelSql)),
    Q("q_stream_interval_join", streamIntervalJoin, Some(streamIntervalJoinSql)),
    Q("q_stream_window_join", streamWindowJoin, Some(streamWindowJoinSql)),
    Q("q_stream_window_cogroup", streamWindowCoGroup, Some(streamWindowCoGroupSql)),
    Q("q_stream_left_join", streamLeftJoin, Some(streamLeftJoinSql)),
    Q("q_stream_semi_join", streamSemiJoin, Some(streamSemiJoinSql)),
    Q("q_stream_anti_join", streamAntiJoin, Some(streamAntiJoinSql)),
    Q("q_stream_dedup_last", streamDedupLast, Some(streamDedupLastSql)),
    Q("q_stream_dedup_wm", streamDedupWm, Some(streamDedupWmSql)),
    Q("q_stream_full_join", streamFullJoin, Some(streamFullJoinSql)),
    Q("q_stream_right_join", streamRightJoin, Some(streamRightJoinSql)),
    Q("q_stream_over_bounded", streamOverBounded, Some(streamOverBoundedSql)),
    Q("q_stream_over_range", streamOverRange, Some(streamOverRangeSql)),
    Q("q_stream_temporal_proc", streamTemporalProcJoin, Some(streamTemporalProcJoinSql)),
    Q("q_stream_file_sink", streamFileSink, Some(streamFileSinkSql)),
    Q("q_stream_topn", streamTopN, Some(streamTopNSql)),
    Q("q_stream_groupagg", streamGroupAgg, Some(streamGroupAggSql)),
    Q("q_stream_agg_of_agg", streamAggOfAgg, Some(streamAggOfAggSql)),
    Q("q_stream_over", streamOver, Some(streamOverSql)),
    Q("q_stream_temporal_join", streamTemporalJoin, Some(streamTemporalJoinSql)),
    Q("q_stream_cep", streamCep, Some(streamCepSql)),
    Q("q_stream_cep_timeout", streamCepTimeout, Some(streamCepTimeoutSql)),
    Q("q_stream_kmeans", streamKmeans, Some(streamKmeansSql)),
    Q("q_stream_components", streamComponents, Some(streamComponentsSql)),
    Q("q_stream_expect", streamExpect, Some(streamExpectSql)),
    Q("q_stream_summarize", streamSummarize, Some(ApiQueries.apiSummarizeSql)),
    Q("q_stream_ols", streamOls, Some(AnalyticsQueries.evtOlsSql)),
    Q("q_stream_cuped", streamCuped, Some(AnalyticsQueries.evtCupedSql)),
    Q("q_stream_dp_release", streamDpRelease, Some(AnalyticsQueries.evtDpReleaseSql)),
    Q("q_stream_shapley", streamShapley, Some(AnalyticsQueries.evtShapleySql)),
    Q("q_stream_kanon", streamKanon, Some(AnalyticsQueries.evtKanonSql)),
    Q("q_stream_markov_attr", streamMarkovAttr, Some(AnalyticsQueries.evtMarkovAttributionSql)),
    Q("q_stream_stl", streamStl, Some(AnalyticsQueries.evtStlSql)),
    Q("q_stream_holtwinters", streamHoltWinters, Some(AnalyticsQueries.evtHoltWintersSql)),
    Q("q_stream_knn_probe", streamKnnProbe, Some(streamKnnProbeSql)),
    Q("q_stream_bursts", streamBursts, Some(AnalyticsQueries.evtBurstsSql)),
    Q("q_stream_msprt", streamMsprt, Some(AnalyticsQueries.evtMsprtSql)),
    Q("q_stream_ate", streamAte, Some(AnalyticsQueries.evtAteSql)),
    Q("q_stream_qini", streamQini, Some(AnalyticsQueries.evtQiniSql)),
    Q("q_stream_conformal", streamConformal, Some(AnalyticsQueries.evtConformalSql)),
    Q("q_stream_ivm_join", streamIvmJoin, Some(streamIvmJoinSql)),
    Q("q_stream_ivm_join_retract", streamIvmJoinRetract, Some(streamIvmJoinRetractSql)),
    Q("q_stream_gram", streamGram, Some(PipelineQueries.embGramSql)),
    Q("q_stream_benford", streamBenford, Some(AnalyticsQueries.evtBenfordSql)),
    Q("q_stream_lorenz", streamLorenz, Some(AnalyticsQueries.evtLorenzSql)),
    Q("q_stream_dispersion", streamDispersion, Some(AnalyticsQueries.evtDispersionSql)),
    Q("q_stream_heaps", streamHeaps, Some(PipelineQueries.docHeapsSql)),
    Q("q_stream_lda", streamLda, Some(PipelineQueries.embLdaSql)),
    Q("q_stream_survival", streamSurvival, Some(AnalyticsQueries.evtSurvivalSql)),
    Q("q_stream_cumhaz", streamCumhaz, Some(AnalyticsQueries.evtCumhazSql)),
    Q("q_stream_ks", streamKs, Some(AnalyticsQueries.evtKsSql)),
    Q("q_stream_mannwhitney", streamMannWhitney, Some(AnalyticsQueries.evtMannWhitneySql)),
    Q("q_stream_kruskal", streamKruskal, Some(AnalyticsQueries.evtKruskalSql)),
    Q("q_stream_jt", streamJt, Some(AnalyticsQueries.evtJtSql)),
    Q("q_stream_mood", streamMood, Some(AnalyticsQueries.evtMoodSql)),
    Q("q_stream_mcnemar", streamMcnemar, Some(AnalyticsQueries.evtMcnemarSql)),
    Q("q_stream_cochranq", streamCochranq, Some(AnalyticsQueries.evtCochranqSql)),
    Q("q_stream_spearman", streamSpearman, Some(AnalyticsQueries.evtSpearmanSql)),
    Q("q_stream_pagehinkley", streamPageHinkley, Some(AnalyticsQueries.evtPageHinkleySql)),
    Q("q_stream_tclose", streamTclose, Some(AnalyticsQueries.evtTcloseSql)),
    Q("q_stream_granger", streamGranger, Some(AnalyticsQueries.evtGrangerSql)),
    Q("q_stream_goodturing", streamGoodTuring, Some(PipelineQueries.docGoodTuringSql)),
    Q("q_stream_isotonic", streamIsotonic, Some(AnalyticsQueries.docIsotonicSql)),
    Q("q_stream_cmh", streamCmh, Some(AnalyticsQueries.evtCmhSql)),
    Q("q_stream_js", streamJs, Some(PipelineQueries.docJsDriftSql)),
    Q("q_stream_anomaly", streamAnomaly, Some(streamAnomalySql)),
    Q("q_stream_transitions", streamTransitions, Some(streamTransitionsSql)),
    Q("q_stream_growth", streamGrowth, Some(streamGrowthSql)),
    Q("q_stream_retention", streamRetention, Some(streamRetentionSql)),
    Q("q_stream_attribution", streamAttribution, Some(streamAttributionSql)),
    Q("q_stream_funnel", streamFunnel, Some(streamFunnelSql)),
    Q("q_stream_cdc", streamCdc, Some(streamCdcSql)),
    Q("q_stream_retract", streamRetract, Some(streamRetractSql)),
    Q("q_stream_topn_retract", streamTopnRetract, Some(streamTopnRetractSql)),
    Q("q_stream_cdc_agg", streamCdcAgg, Some(streamCdcAggSql)),
    Q("q_stream_substr", streamSubstr, Some(streamSubstrSql)),
    Q("q_stream_queryable", streamQueryable, Some(streamQueryableSql)),
    Q("q_stream_bootstrap", streamBootstrap, Some(streamBootstrapSql)),
    Q("q_stream_mg", streamMg, Some(SketchQueries.docMgHeavySql)),
    Q("q_stream_iterate", streamIterate, Some(streamIterateSql)),
    Q("q_stream_paths", streamPaths, Some(streamPathsSql)),
    Q("q_stream_sql_tumble", streamSqlTumble, Some(streamTumbleSql)),
    Q("q_stream_sql_ddl", streamSqlDdl, Some(streamSqlDdlSql)),
    Q("q_stream_sql_session", streamSqlSession, Some(streamSqlSessionSql)),
    Q("q_stream_sql_dedup", streamSqlDedup, Some(streamSqlDedupSql)),
    Q("q_stream_sql_topn", streamSqlTopn, Some(streamSqlTopnSql)),
    Q("q_stream_feature_hash", streamFeatureHash, Some(streamFeatureHashSql)),
    Q("q_stream_softdedup", streamSoftDedup, Some(PipelineQueries.docSoftDedupSql)),
    Q("q_stream_semdedup", streamSemDedup, Some(PipelineQueries.embSemDedupSql)),
    Q("q_stream_mojibake", streamMojibake, Some(PipelineQueries.docMojibakeSql)),
    Q("q_stream_doremi", streamDoremi, Some(PipelineQueries.docDoremiSql)),
    Q("q_stream_binseg", streamBinseg, Some(AnalyticsQueries.evtBinsegSql)),
    Q("q_stream_snm", streamSnm, Some(PipelineQueries.docSnmSql)),
    Q("q_stream_flagged_terms", streamFlaggedTerms, Some(PipelineQueries.docFlaggedTermsSql)),
    Q("q_stream_linkage", streamLinkage, Some(PipelineQueries.docLinkageSql)),
    Q("q_stream_mink", streamMink, Some(PipelineQueries.docMinkSql)),
    Q("q_stream_kmv", streamKmv, Some(SketchQueries.docKmvSql)),
    Q("q_stream_bloom", streamBloom, Some(SketchQueries.docBloomDeltaSql))
  )
}
