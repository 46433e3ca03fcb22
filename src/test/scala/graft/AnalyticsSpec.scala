package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Plan-shape locks for the analytics/evaluation family
  * ([[graft.queries.AnalyticsQueries]]): each query's scaladoc makes a
  * concrete scale claim (single-shuffle sessionization, bounded-domain
  * rank window, top-k truncation instead of a global sort,
  * candidate-restricted pair joins) — assert the physical plan so a
  * refactor can't silently regress the claim.
  */
class AnalyticsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def hashExchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  test("burstsFromDaily: a sustained elevated run enters state 1 and islands number correctly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // type "b": 30 days at rate ~0.2 of the daily total, except days
    // 11-20 elevated to ~0.5 — a 10-day burst the ln(30) entry cost
    // amortizes easily; type "a" absorbs the complement so daily totals
    // stay constant (p0 stays meaningful)
    val rows = (1 to 30).flatMap { d =>
      val day = f"2024-01-$d%02d"
      val yb = if (d >= 11 && d <= 20) 500L else 200L
      Seq(("b", day, yb), ("a", day, 1000L - yb))
    }
    val daily = rows.toDF("event_type", "d", "cnt")
      .select(col("event_type"), col("d").cast("date"), col("cnt"))
    val got = graft.queries.AnalyticsQueries.burstsFromDaily(daily)
      .as[graft.queries.AnalyticsQueries.BurstRow].collect()
      .filter(_.event_type == "b").sortBy(_.day)
    val burstDays = got.filter(_.state == 1L).map(_.day).toSeq
    assert(burstDays === (11 to 20).map(d => f"2024-01-$d%02d"),
      s"expected the elevated run flagged, got: ${got.map(r => (r.day, r.state)).mkString(",")}")
    assert(got.filter(_.state == 1L).map(_.burst_id).distinct.toSeq === Seq(1L))
    assert(got.filter(_.state == 0L).forall(_.burst_id == 0L))
    // two separated elevated runs get distinct island ids
    val rows2 = (1 to 30).flatMap { d =>
      val day = f"2024-01-$d%02d"
      val yb = if ((d >= 5 && d <= 10) || (d >= 20 && d <= 26)) 500L else 200L
      Seq(("b", day, yb), ("a", day, 1000L - yb))
    }
    val got2 = graft.queries.AnalyticsQueries.burstsFromDaily(
      rows2.toDF("event_type", "d", "cnt")
        .select(col("event_type"), col("d").cast("date"), col("cnt")))
      .as[graft.queries.AnalyticsQueries.BurstRow].collect()
      .filter(r => r.event_type == "b" && r.state == 1L)
    assert(got2.map(_.burst_id).distinct.sorted.toSeq === Seq(1L, 2L))
  }

  test("q_evt_sessionize: ONE hash shuffle — the user_id window exchange feeds the session agg") {
    val p = planString("q_evt_sessionize")
    // groupBy(user_id, sess) is satisfied by the window's user_id
    // clustering; a second hash exchange means Catalyst stopped reusing it
    assert(hashExchanges(p) == 1, s"expected 1 hash exchange, got ${hashExchanges(p)}:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), s"sessionize grew a join:\n$p")
  }

  test("q_evt_attribution: window carry-forward, never a per-purchase self-join") {
    val p = planString("q_evt_attribution")
    assert(p.contains("windowspecdefinition"), s"carry-forward window missing:\n$p")
    assert(!p.contains("Join"), s"attribution self-join crept in:\n$p")
    // user_id window + tiny channel rollup — nothing wider
    assert(hashExchanges(p) <= 2, s"extra exchanges:\n$p")
  }

  test("q_evt_runs: run windows and the run aggregation share the single user_id exchange") {
    val p = planString("q_evt_runs")
    assert(hashExchanges(p) == 1, s"expected 1 hash exchange, got ${hashExchanges(p)}:\n$p")
    assert(!p.contains("Join"), s"runs grew a join:\n$p")
  }

  test("q_evt_funnel: every wide structure keys on user_id; no cartesian step probe") {
    val p = planString("q_evt_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel step probe degraded:\n$p")
    val badKeys = "Exchange hashpartitioning\\(([a-z0-9_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).filterNot(_ == "user_id").toList
    assert(badKeys.isEmpty, s"non-user_id hash exchange(s) $badKeys:\n$p")
  }

  test("q_evt_active_users: WAU comes from a map-side explode, never a day-range join") {
    val p = planString("q_evt_active_users")
    assert(p.contains("Generate explode"), s"sequence explode missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range-join shape crept in:\n$p")
  }

  test("q_evt_retention: per-user min is map-side combinable; join keyed on user_id only") {
    val p = planString("q_evt_retention")
    assert(p.contains("partial_min") || p.contains("partial_first") ||
      "HashAggregate.*partial".r.findFirstIn(p).isDefined,
      s"first-day agg lost its map-side partial:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"retention join degraded:\n$p")
  }

  test("q_doc_auc: the rank window runs over the quantized-score aggregate, not corpus rows") {
    val p = planString("q_doc_auc")
    // corpus collapses by score FIRST (map-side combinable); the
    // single-partition ordered window may only see that bounded domain
    val winIdx = p.indexOf("Window")
    val aggBelow = p.indexOf("HashAggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      s"rank window is not fed by the score aggregate:\n$p")
    assert(!p.contains("windowspecdefinition(doc"), s"per-row corpus window:\n$p")
  }

  test("q_doc_zipf: top-1000 cut is TakeOrdered — no global sort of the vocabulary") {
    val p = planString("q_doc_zipf")
    assert(p.contains("TakeOrderedAndProject"), s"vocabulary top-k lost TakeOrdered:\n$p")
  }

  test("q_doc_rouge: staged pair-restricted joins — no corpus scan or cartesian in the final plan") {
    val p = planString("q_doc_rouge")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairwise join degraded to cartesian:\n$p")
    // pairs and member docs are stage() boundaries: the final plan reads
    // staged blocks only — a parquet scan here means the pair-restriction
    // regressed to corpus-sized token aggregation
    assert(!p.contains("Scan parquet"), s"corpus scan leaked past the stage boundary:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"tiny pair side not broadcast:\n$p")
  }

  test("q_emb_recall: ANN side joins by bucket equality, exact side stays probe-bounded") {
    val p = planString("q_emb_recall")
    assert(!p.contains("CartesianProduct"), s"bucketed ANN degraded to cartesian:\n$p")
  }
}
