package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Closed-form and degenerate checks for the rank-statistics / drift /
  * privacy additions (Mann–Whitney U, Spearman ρ, Kendall τ-b,
  * Page–Hinkley, t-closeness): tiny corpora where the statistic has a
  * hand-computable value (perfect concordance → ρ = τ = 1, disjoint
  * samples → U = 0), plus the degenerate shapes (all-tied series,
  * constant stream) where the NULL/zero contract matters — the same
  * posture as [[DegenerateInputSpec]].
  */
class RankStatsSpec extends SparkSpec {

  import graft.queries.AnalyticsQueries

  private def writeEvents(dst: String, rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    rows.map { case (id, day, uid, typ, v) =>
      (id, Timestamp.valueOf(s"$day 12:00:00"), uid, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  /** day i (i = 0..4): i+1 view events; one carries value (5−i)/100 —
    * daily cnt strictly INCREASING, daily cents strictly DECREASING.
    */
  private lazy val antiDir: String = {
    var id = 0L
    val rows = for {
      i <- 0 until 5
      j <- 0 to i
    } yield {
      id += 1
      (id, s"2024-01-0${i + 1}", j.toLong, "view",
        if (j == 0) (5 - i) / 100.0 else 0.0)
    }
    writeEvents("/tmp/graft-rank-anti", rows)
  }

  /** One view event per day with decreasing value: daily cnt all-TIED. */
  private lazy val tiedDir: String = {
    val rows = (0 until 5).map(i =>
      ((i + 1).toLong, s"2024-01-0${i + 1}", 1L, "view", (5 - i) / 10.0))
    writeEvents("/tmp/graft-rank-tied", rows)
  }

  test("spearman: perfectly anti-monotone daily series gives rho = -1") {
    val out = AnalyticsQueries.evtSpearman(spark, antiDir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_days") === 5L)
    assert(math.abs(out.head.getAs[Double]("rho") - (-1.0)) < 1e-12)
  }

  test("kendall: perfectly anti-monotone daily series gives tau = -1") {
    val out = AnalyticsQueries.evtKendall(spark, antiDir).collect()
    assert(math.abs(out.head.getAs[Double]("tau") - (-1.0)) < 1e-12)
    assert(out.head.getAs[Long]("nc") === 0L)
    assert(out.head.getAs[Long]("nd") === 10L)
  }

  test("spearman/kendall: an all-tied series emits NULL, not a fake 0") {
    val sp = AnalyticsQueries.evtSpearman(spark, tiedDir).collect()
    assert(sp.head.isNullAt(sp.head.fieldIndex("rho")))
    val kd = AnalyticsQueries.evtKendall(spark, tiedDir).collect()
    assert(kd.head.isNullAt(kd.head.fieldIndex("tau")))
  }

  /** purchases {0.1, 0.2} all below clicks {0.3, 0.4}: R₁ = 1+2 = 3,
    * U₁ = R₁ − n₁(n₁+1)/2 = 0, z = −2/√(5/3) ≈ −1.549 — below the 1.96
    * cut, so reject = false even at total separation (n too small).
    */
  private lazy val mwDir: String = writeEvents("/tmp/graft-rank-mw", Seq(
    (1L, "2024-01-01", 1L, "purchase", 0.1),
    (2L, "2024-01-01", 2L, "purchase", 0.2),
    (3L, "2024-01-01", 3L, "click", 0.3),
    (4L, "2024-01-01", 4L, "click", 0.4)))

  test("mann-whitney: disjoint samples give U1 = 0 and the exact z") {
    val out = AnalyticsQueries.evtMannWhitney(spark, mwDir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n1") === 2L && r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Double]("u1") === 0.0)
    assert(math.abs(r.getAs[Double]("z") - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-12)
    assert(!r.getAs[Boolean]("reject"))
  }

  test("mann-whitney: identical samples give U1 = n1*n2/2 and z = 0") {
    val dir = writeEvents("/tmp/graft-rank-mweq", Seq(
      (1L, "2024-01-01", 1L, "purchase", 0.1),
      (2L, "2024-01-01", 2L, "purchase", 0.2),
      (3L, "2024-01-01", 3L, "click", 0.1),
      (4L, "2024-01-01", 4L, "click", 0.2)))
    val r = AnalyticsQueries.evtMannWhitney(spark, dir).collect().head
    assert(r.getAs[Double]("u1") === 2.0)
    assert(r.getAs[Double]("z") === 0.0)
  }

  test("page-hinkley: a constant stream never alarms and ph stays 0") {
    val dir = writeEvents("/tmp/graft-rank-phconst",
      (0 until 6).map(i => ((i + 1).toLong, s"2024-01-0${i + 1}", 1L, "view", 0.5)))
    val out = AnalyticsQueries.evtPageHinkley(spark, dir).collect()
    assert(out.length === 6)
    assert(out.forall(_.getAs[Double]("ph") === 0.0))
    assert(out.forall(!_.getAs[Boolean]("alarm")))
  }

  test("page-hinkley: an upward mean step eventually alarms") {
    val rows = (0 until 9).map { i =>
      ((i + 1).toLong, s"2024-01-0${i + 1}", 1L, "view", if (i < 3) 0.1 else 0.9)
    }
    val dir = writeEvents("/tmp/graft-rank-phstep", rows)
    val out = AnalyticsQueries.evtPageHinkley(spark, dir).collect()
    assert(out.exists(_.getAs[Boolean]("alarm")),
      "80-cent daily-mean jump must cross the 10-cent PH threshold")
    // the walk is monotone against the running min: once alarmed, stays
    val phs = out.sortBy(_.getAs[String]("day")).map(_.getAs[Double]("ph"))
    assert(phs.last > 10.0)
  }

  test("t-closeness: identical user behavior makes every group t = 0") {
    // every user: one view on day 1 — one QI group, distribution == global
    val rows = (0 until 8).map(i => ((i + 1).toLong, "2024-01-01", i.toLong, "view", 0.5))
    val dir = writeEvents("/tmp/graft-rank-tclose", rows)
    val out = AnalyticsQueries.evtTclose(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("t_dist") === 0.0)
    assert(!out.head.getAs[Boolean]("violates"))
  }

  test("t-closeness: a class concentrated in one group violates") {
    // 30 low-activity viewers (1 event) + 30 high-activity purchasers
    // (12 events each): favorite class is perfectly predicted by the
    // QI bucket, so each group's distance to the 50/50 global is 0.5
    val viewers = (0 until 30).map(i =>
      ((i + 1).toLong, "2024-01-01", (100 + i).toLong, "view", 0.5))
    var id = 1000L
    val buyers = for {
      i <- 0 until 30
      j <- 0 until 12
    } yield {
      id += 1
      (id, s"2024-01-${"%02d".format(j % 9 + 1)}", (200 + i).toLong, "purchase", 0.5)
    }
    val dir = writeEvents("/tmp/graft-rank-tclose2", viewers ++ buyers)
    val out = AnalyticsQueries.evtTclose(spark, dir).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Double]("t_dist") === 0.5))
    assert(out.forall(_.getAs[Boolean]("violates")))
  }

  test("kruskal-wallis: two separated groups give the hand-computed H = 2.4") {
    // click {0.1, 0.2} vs view {0.3, 0.4}: ranks 1+2 vs 3+4, no ties;
    // H = 12/(4*5) * (3^2/2 + 7^2/2) - 3*5 = 0.6*29 - 15 = 2.4
    val rows = Seq(
      (1L, "2024-01-01", 1L, "click", 0.1), (2L, "2024-01-01", 2L, "click", 0.2),
      (3L, "2024-01-01", 3L, "view", 0.3), (4L, "2024-01-01", 4L, "view", 0.4))
    val dir = writeEvents("/tmp/graft-rank-kw", rows)
    val out = AnalyticsQueries.evtKruskal(spark, dir).collect()
    assert(out.length === 2) // one row per group
    assert(out.forall(r => math.abs(r.getAs[Double]("h") - 2.4) < 1e-9))
    assert(out.forall(_.getAs[Long]("df") === 1L))
    assert(out.forall(!_.getAs[Boolean]("reject"))) // 2.4 < 3.841
    val byType = out.map(r => r.getAs[String]("event_type") -> r.getAs[Long]("nj")).toMap
    assert(byType === Map("click" -> 2L, "view" -> 2L))
  }

  test("mood: hand-computed 2x2 chi2 = 4/3, ties-at-median count low") {
    // click {0.1, 0.2}, view {0.3, 0.4}: pooled median bin = 3 (first
    // cum with 2*cum >= N+1), so low counts are (2, 1); with L=3, N=4
    // each group's cell terms are 1/6 + 1/2 -> chi2 = 4/3, df=1
    val rows = Seq(
      (1L, "2024-01-01", 1L, "click", 0.1), (2L, "2024-01-01", 2L, "click", 0.2),
      (3L, "2024-01-01", 3L, "view", 0.3), (4L, "2024-01-01", 4L, "view", 0.4))
    val dir = writeEvents("/tmp/graft-rank-mood", rows)
    val out = AnalyticsQueries.evtMood(spark, dir).collect()
    assert(out.length === 2)
    val byType = out.map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("nj"), r.getAs[Long]("lowj"))).toMap
    assert(byType === Map("click" -> ((2L, 2L)), "view" -> ((2L, 1L))))
    // chi2 emits at round-6 after 1e-9 cell quantization
    assert(out.forall(r => math.abs(r.getAs[Double]("chi2") - 4.0 / 3) < 1e-5))
    assert(out.forall(!_.getAs[Boolean]("reject")))
  }

  test("jonckheere-terpstra: a monotone shift up the type order maxes JT") {
    // click (lexicographically first) low, view high: every cross pair
    // concordant -> JT = n1*n2 = 4; mean = (16-8)/4 = 2;
    // var = (16*11 - 8*7*2/2... ) = (176 - 2*4*7)/72 = 120/72
    val rows = Seq(
      (1L, "2024-01-01", 1L, "click", 0.1), (2L, "2024-01-01", 2L, "click", 0.2),
      (3L, "2024-01-01", 3L, "view", 0.3), (4L, "2024-01-01", 4L, "view", 0.4))
    val dir = writeEvents("/tmp/graft-rank-jt", rows)
    val out = AnalyticsQueries.evtJt(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("jt") === 4.0)
    assert(math.abs(out.head.getAs[Double]("z") - 2.0 / math.sqrt(120.0 / 72)) < 1e-12)
    // reversed ordering: zero concordant pairs, symmetric negative z
    val rows2 = rows.map { case (id, d, u, t, v) =>
      (id, d, u, t, if (t == "click") v + 0.3 else v - 0.2) }
    val out2 = AnalyticsQueries.evtJt(spark,
      writeEvents("/tmp/graft-rank-jt2", rows2)).collect()
    assert(out2.head.getAs[Double]("jt") === 0.0)
    assert(out2.head.getAs[Double]("z") < 0)
  }

  test("mcnemar: hand-computed discordant counts and the continuity-corrected chi2") {
    // days 1-2 = first half, 3-4 = second half (span 3, midpoint offset 1).
    // 10 users convert ONLY in half 1 (purchase day 1, 4 plain views day 3),
    // 2 users convert ONLY in half 2 (reverse) -> b=n01=2, c=n10=10,
    // chi2 = (|2-10|-1)^2 / 12 = 49/12
    var id = 0L
    def ev(day: String, uid: Long, typ: String, k: Int): Seq[(Long, String, Long, String, Double)] =
      (0 until k).map { _ => id += 1; (id, day, uid, typ, 1.0) }
    val h1Only = (0 until 10).flatMap(i =>
      ev("2024-01-01", 10 + i, "purchase", 1) ++ ev("2024-01-03", 10 + i, "view", 4))
    val h2Only = (0 until 2).flatMap(i =>
      ev("2024-01-01", 50 + i, "view", 4) ++ ev("2024-01-04", 50 + i, "purchase", 1))
    val dir = writeEvents("/tmp/graft-rank-mcn", h1Only ++ h2Only)
    val out = AnalyticsQueries.evtMcnemar(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n10") === 10L && out.head.getAs[Long]("n01") === 2L)
    assert(math.abs(out.head.getAs[Double]("chi2") - 49.0 / 12) < 1e-12)
    assert(out.head.getAs[Boolean]("reject")) // 4.083 > 3.841
  }

  test("cochran-q: the hand-computed Q = 6 rejects at df = 2") {
    // days 1/2/3 are the three tertiles. u1 converts in all three;
    // u2-u4 convert only in tertile 0: T = (4,1,1), R = (3,1,1,1);
    // Q = 2*(3*18 - 36) / (3*6 - 12) = 6 > 5.991
    var id = 0L
    def ev(day: String, uid: Long, typ: String, k: Int): Seq[(Long, String, Long, String, Double)] =
      (0 until k).map { _ => id += 1; (id, day, uid, typ, 1.0) }
    val u1 = Seq("2024-01-01", "2024-01-02", "2024-01-03")
      .flatMap(d => ev(d, 1L, "purchase", 1))
    val rest = (2L to 4L).flatMap(u =>
      ev("2024-01-01", u, "purchase", 1) ++
        ev("2024-01-02", u, "view", 4) ++ ev("2024-01-03", u, "view", 4))
    val dir = writeEvents("/tmp/graft-rank-cq", u1 ++ rest)
    val out = AnalyticsQueries.evtCochranq(spark, dir).collect()
    assert(out.length === 1)
    assert((out.head.getAs[Long]("t0"), out.head.getAs[Long]("t1"),
      out.head.getAs[Long]("t2")) === ((4L, 1L, 1L)))
    assert(math.abs(out.head.getAs[Double]("q") - 6.0) < 1e-12)
    assert(out.head.getAs[Boolean]("reject"))
  }
}
