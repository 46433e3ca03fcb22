package graft

import org.apache.spark.sql.functions._

/** Non-empty degenerate corpora — the cousins of [[EmptyInputSpec]]'s
  * empty tables: inputs that EXIST but collapse a mathematical
  * assumption a query quietly makes. Each case here pins a bug found
  * by review, where the Spark side crashed or silently diverged from
  * its DuckDB oracle on the degenerate shape:
  *
  *  - an ACYCLIC observed Markov chain loses all stationary mass
  *    within the fixed power rounds (z = 0 → BigDecimal(NaN) threw);
  *  - a corpus with ZERO purchase events made the bootstrap's Spark
  *    side emit one null row while the oracle's GROUP BY emitted none;
  *  - a SINGLE-CLASS embedding corpus zeroes the between-class
  *    scatter (0/0 → all-NaN direction → NaN projections);
  *  - a corpus with NO pre-period errors made the DiD median NULL and
  *    the two engines disagree on the NULL-comparison fallback.
  *
  * PASS = no crash AND the aligned degenerate output shape (the NULL
  * contract both engines now share).
  */
class DegenerateInputSpec extends SparkSpec {

  import graft.queries.{AnalyticsQueries, PipelineQueries}

  /** Events where every user's journey is exactly signup → view: an
    * absorbing (acyclic) transition chain, zero purchases, zero
    * errors.
    */
  private lazy val acyclicDir: String = {
    val dst = "/tmp/graft-degen-acyclic"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .withColumn("event_type", when(col("rn") === 1, "signup").otherwise("view"))
      .drop("rn")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  /** Events with purchases intact but every error relabeled — a DiD
    * corpus whose pre-period error median is NULL.
    */
  private lazy val noErrorDir: String = {
    val dst = "/tmp/graft-degen-noerror"
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("event_type",
        when(col("event_type") === "error", "view").otherwise(col("event_type")))
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  /** Embeddings collapsed to one class. */
  private lazy val oneClassDir: String = {
    val dst = "/tmp/graft-degen-oneclass"
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("label", lit(1).cast("int"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    dst
  }

  test("evtMarkov: acyclic chain loses all mass -> NULL stationary_p, no NaN crash") {
    val rows = AnalyticsQueries.evtMarkov(spark, acyclicDir).collect()
    assert(rows.nonEmpty, "both observed types should still be listed")
    assert(rows.map(_.getString(0)).sorted.sameElements(Array("signup", "view")))
    assert(rows.forall(_.isNullAt(1)), "all stationary mass must be NULL when z = 0")
  }

  test("evtBootstrapCi: zero purchases -> one row, n=0, NULL interval (oracle-aligned)") {
    val rows = AnalyticsQueries.evtBootstrapCi(spark, acyclicDir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 0L)
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3), "CI bounds must be NULL")
  }

  test("evtDid: no pre-period errors -> NULL median treated as control (ELSE 0), no crash") {
    val rows = AnalyticsQueries.evtDid(spark, noErrorDir).collect()
    assert(rows.length == 1)
    // everyone lands in control, so the treated cells — and the
    // estimate — are NULL, but the query must not drop the row
    assert(rows(0).isNullAt(0), "did must be NULL with no treated cells")
  }

  test("embLda: single class -> zero scatter -> NULL pc1 for every row") {
    val n = spark.read.parquet(s"$oneClassDir/embeddings.parquet").count()
    val rows = PipelineQueries.embLda(spark, oneClassDir).collect()
    assert(rows.length == n.toInt)
    assert(rows.forall(_.isNullAt(1)), "pc1 must be NULL when no discriminant exists")
  }

  test("evtMsprt: zero purchases -> zero pooled variance -> NULL llr/p, reject false") {
    val rows = AnalyticsQueries.evtMsprt(spark, acyclicDir).collect()
    assert(rows.nonEmpty, "each observed day still reports its arm counts")
    val iLlr = rows.head.fieldIndex("llr"); val iP = rows.head.fieldIndex("p_always")
    val iRej = rows.head.fieldIndex("reject")
    assert(rows.forall(r => r.isNullAt(iLlr) && r.isNullAt(iP)),
      "the statistic must be NULL when vn = 0 (no conversions)")
    assert(rows.forall(!_.getBoolean(iRej)), "an undefined test must never reject")
  }

  test("evtQini / evtAte: every user treated -> empty control arm -> NULL effects, no crash") {
    val qini = AnalyticsQueries.evtQini(spark, acyclicDir).collect()
    val iQ = qini.head.fieldIndex("qini"); val iA = qini.head.fieldIndex("auuc")
    assert(qini.filter(_.getLong(0) >= 0).forall(_.isNullAt(iQ)),
      "per-decile qini must be NULL with nc = 0 (everyone signs up in this fixture)")
    assert(qini.filter(_.getLong(0) == -1L).forall(_.isNullAt(iA)),
      "AUUC over zero defined deciles must be NULL, not 0")
    val ate = AnalyticsQueries.evtAte(spark, acyclicDir).collect()
    val iE = ate.head.fieldIndex("ate")
    assert(ate.forall(_.isNullAt(iE)), "stratum and overall ATE must all be NULL")
  }

  test("evtBinseg / evtBinsegTrend: single-day grid -> one segment, NULL trend, no crash") {
    val dst = "/tmp/graft-degen-oneday"
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val firstDay = ev.select(to_date(col("ts")).as("d")).agg(min("d")).head.getDate(0)
    ev.filter(to_date(col("ts")) === lit(firstDay))
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    val segs = AnalyticsQueries.evtBinseg(spark, dst).collect()
    assert(segs.nonEmpty && segs.forall(_.getLong(1) == 0L),
      "a 1-day grid has no split candidates: every type is one segment 0")
    val tr = AnalyticsQueries.evtBinsegTrend(spark, dst).collect()
    assert(tr.forall(r => r.isNullAt(r.fieldIndex("slope"))),
      "a 1-point segment has zero OLS denominator: slope must be NULL")
  }

  test("hwFromDaily: exactly 14 days walks the minimum window; 13 days emits nothing") {
    import spark.implicits._
    def daily(n: Int) = (1 to n).map(d => ("a", f"2024-01-$d%02d", 100L + d))
      .toDF("event_type", "d", "cnt")
      .select(col("event_type"), col("d").cast("date"), col("cnt"))
    // 14 days: init uses both seasons, recursion re-walks days 8..14
    assert(AnalyticsQueries.hwFromDaily(daily(14)).count() === 7L)
    // 13 days: below the two-season init requirement -> empty, no crash
    assert(AnalyticsQueries.hwFromDaily(daily(13)).count() === 0L)
  }

  test("burstsFromDaily: all-quiet and all-active types are filtered, not walked") {
    import spark.implicits._
    // type z never fires (sy = 0) and type w IS the whole stream
    // (sy = sn after z contributes nothing) — both degenerate rates
    // make ln(p) meaningless and must drop silently
    val rows = (1 to 10).flatMap(d => Seq(
      ("w", f"2024-01-$d%02d", 100L), ("z", f"2024-01-$d%02d", 0L)))
    val out = AnalyticsQueries.burstsFromDaily(rows
      .toDF("event_type", "d", "cnt")
      .select(col("event_type"), col("d").cast("date"), col("cnt")))
    assert(out.count() === 0L)
  }

  test("deltaTriggerWindow: a single element initializes but never fires") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = graft.streaming.StreamingOps.deltaTriggerWindow[graft.streaming.Event, Long](
      withWm, _.user_id, _.event_id, _.tsUs, _.value.toLong, threshold = 1L)
    val q = out.writeStream.format("memory").queryName("degen_dtw").outputMode("append").start()
    try {
      input.addData(graft.streaming.Event(1L, new java.sql.Timestamp(10000L), 7L, "x", 5.0))
      q.processAllAvailable()
      input.addData(graft.streaming.Event(9L, new java.sql.Timestamp(120000L), 8L, "x", 0.0))
      q.processAllAvailable()
      input.addData(graft.streaming.Event(10L, new java.sql.Timestamp(240000L), 8L, "x", 0.0))
      q.processAllAvailable()
      assert(spark.table("degen_dtw").filter(col("key") === 7L).count() === 0L)
    } finally q.stop()
  }

  test("evtConformal: zero spend everywhere -> zero-width intervals with full coverage") {
    val rows = AnalyticsQueries.evtConformal(spark, acyclicDir).collect()
    val iW = rows.head.fieldIndex("half_width"); val iC = rows.head.fieldIndex("coverage")
    assert(rows.forall(r => r.getDouble(iW) == 0.0),
      "all residuals are 0, so the conformal half-width must be 0")
    assert(rows.forall(r => r.getDouble(iC) == 1.0),
      "|0 - 0| <= 0 covers every test row")
  }
}
