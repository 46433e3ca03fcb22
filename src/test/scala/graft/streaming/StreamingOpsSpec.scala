package graft.streaming

import graft.SparkSpec
import graft.cep.{CEP, Pattern}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import scala.concurrent.duration._

/** MemoryStream harness tests for the stateful operators — the analog of
  * the reference's operator harness tests (GroupAggregateHarnessTest
  * .scala pattern: feed controlled batches, assert state-driven output).
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, tsMs: Long, user: Long, typ: String, value: Double): Event =
    Event(id, new Timestamp(tsMs), user, typ, value)

  test("topNByKey emits refreshed rankings as better rows arrive") {
    val input = MemoryStream[Event]
    val out = StreamingOps.topNByKey[Event, Long](input.toDS(), _.user_id, _.event_id, _.value, n = 2)
    val q = out.writeStream.format("memory").queryName("topn_t").outputMode("update").start()
    try {
      input.addData(ev(1, 1000, 7, "x", 5.0), ev(2, 2000, 7, "x", 3.0))
      q.processAllAvailable()
      val r1 = spark.table("topn_t").as[StreamingOps.TopNRow[Long]].collect().toSeq
      assert(r1.map(r => (r.rank, r.id)).sorted === Seq((1L, 1L), (2L, 2L)))
      // a new best displaces rank 2; a worse row changes nothing
      input.addData(ev(3, 3000, 7, "x", 9.0), ev(4, 4000, 7, "x", 1.0))
      q.processAllAvailable()
      val r2 = spark.table("topn_t").as[StreamingOps.TopNRow[Long]].collect().toSeq.drop(r1.size)
      assert(r2.map(r => (r.rank, r.id)).sorted === Seq((1L, 3L), (2L, 1L)))
      input.addData(ev(5, 5000, 7, "x", 0.5))
      q.processAllAvailable()
      assert(spark.table("topn_t").count() === (r1.size + r2.size)) // no emission
    } finally q.stop()
  }

  test("stateful operators accept non-Long keys (String, like KeyedStream<T, K>)") {
    val input = MemoryStream[Event]
    val out = StreamingOps.topNByKey[Event, String](
      input.toDS(), _.event_type, _.event_id, _.value, n = 1)
    val q = out.writeStream.format("memory").queryName("topn_s").outputMode("update").start()
    try {
      input.addData(ev(1, 1000, 1, "alpha", 5.0), ev(2, 2000, 2, "beta", 7.0))
      q.processAllAvailable()
      val rows = spark.table("topn_s").as[StreamingOps.TopNRow[String]].collect()
      assert(rows.map(r => r.key -> r.id).toMap === Map("alpha" -> 1L, "beta" -> 2L))
    } finally q.stop()
    val input2 = MemoryStream[Event]
    val dl = StreamingOps.dedupKeepLast[Event, String](
      input2.toDS(), _.event_type, _.event_id, _.tsUs)
    val q2 = dl.writeStream.format("memory").queryName("dl_s").outputMode("update").start()
    try {
      input2.addData(ev(1, 1000, 1, "alpha", 1.0), ev(2, 5000, 1, "alpha", 1.0))
      q2.processAllAvailable()
      assert(spark.table("dl_s").as[(String, Long, Long)].collect().toSeq
        === Seq(("alpha", 2L, 5000000L)))
    } finally q2.stop()
  }

  test("dedupKeepLast emits only when the latest row per key changes") {
    val input = MemoryStream[Event]
    val out = StreamingOps.dedupKeepLast[Event, Long](input.toDS(), _.user_id, _.event_id, _.tsUs)
    val q = out.writeStream.format("memory").queryName("dl_t").outputMode("update").start()
    try {
      input.addData(ev(1, 1000, 7, "x", 1.0), ev(2, 5000, 7, "x", 1.0))
      q.processAllAvailable()
      val r1 = spark.table("dl_t").as[(Long, Long, Long)].collect()
      assert(r1.map(_._2).toSeq === Seq(2L)) // latest of the batch
      input.addData(ev(3, 3000, 7, "x", 1.0)) // older than current last → silent
      q.processAllAvailable()
      assert(spark.table("dl_t").count() === 1)
      input.addData(ev(4, 9000, 7, "x", 1.0))
      q.processAllAvailable()
      assert(spark.table("dl_t").as[(Long, Long, Long)].collect().last._2 === 4L)
    } finally q.stop()
  }

  test("overRowsBounded: bounded frame, watermark-gated, out-of-order safe") {
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = StreamingOps.overRowsBounded[Event, Long](
      withWm, _.user_id, _.event_id, _.tsUs, _.value, nPreceding = 1)
    val q = out.writeStream.format("memory").queryName("ob_t").outputMode("append").start()
    try {
      // out of order WITHIN the batch: id 2 (t=20s) arrives before id 1
      input.addData(ev(2, 20000, 7, "x", 3.0), ev(1, 10000, 7, "x", 1.0))
      q.processAllAvailable()
      input.addData(ev(9, 60000, 8, "x", 0.0)) // advances the watermark
      q.processAllAvailable()
      input.addData(ev(10, 120000, 8, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("ob_t").as[StreamingOps.OverRow[Long]].collect()
        .filter(_.key == 7L).sortBy(_.id)
        .map(r => (r.id, r.running_sum, r.running_cnt)).toSeq
      // frame = self + 1 preceding: id1 → (1.0, 1), id2 → (1+3, 2)
      assert(got === Seq((1L, 1.0, 1L), (2L, 4.0, 2L)))
    } finally q.stop()
  }

  test("overRangeBounded: trailing time-range frame, peers share one frame, out-of-order safe") {
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = StreamingOps.overRangeBounded[Event, Long](
      withWm, _.user_id, _.event_id, _.tsUs, _.value,
      precedingUs = 10L * 1000000L) // 10-second RANGE frame
    val q = out.writeStream.format("memory").queryName("orng_t").outputMode("append").start()
    try {
      // out of order WITHIN the batch (id 3 before id 1), plus PEERS:
      // ids 3 and 4 share t=20s and must receive the SAME aggregate,
      // each counting the other (RANGE is value-bounded, not row-bounded)
      input.addData(
        ev(3, 20000, 7, "x", 3.0), ev(1, 5000, 7, "x", 1.0),
        ev(4, 20000, 7, "x", 5.0), ev(2, 12000, 7, "x", 2.0))
      q.processAllAvailable()
      input.addData(ev(9, 60000, 8, "x", 0.0)) // advances the watermark past 20s
      q.processAllAvailable()
      input.addData(ev(10, 120000, 8, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("orng_t").as[StreamingOps.OverRow[Long]].collect()
        .filter(_.key == 7L).sortBy(_.id)
        .map(r => (r.id, r.running_sum, r.running_cnt)).toSeq
      // frames: id1@5s → {1}; id2@12s → {5s,12s} (5 ≥ 12-10);
      // ids 3,4 @20s → {12s,20s,20s} (5s < 10 pruned), shared aggregate
      assert(got === Seq(
        (1L, 1.0, 1L), (2L, 3.0, 2L), (3L, 10.0, 3L), (4L, 10.0, 3L)))
    } finally q.stop()
  }

  test("deltaTriggerWindow: threshold fires, no purge, out-of-order safe") {
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = StreamingOps.deltaTriggerWindow[Event, Long](
      withWm, _.user_id, _.event_id, _.tsUs, _.value.toLong, threshold = 10L)
    val q = out.writeStream.format("memory").queryName("dtw_t").outputMode("append").start()
    try {
      // out of order WITHIN the batch (id3 first) and ACROSS batches
      // (id4 @40s arrives after id5 @50s): the watermark gate must
      // replay the walk in (ts, id) order regardless
      input.addData(ev(3, 30000, 7, "x", 115.0), ev(1, 10000, 7, "x", 100.0),
        ev(2, 20000, 7, "x", 105.0))
      q.processAllAvailable()
      input.addData(ev(5, 50000, 7, "x", 106.0), ev(4, 40000, 7, "x", 104.0))
      q.processAllAvailable()
      input.addData(ev(9, 120000, 8, "x", 0.0)) // advances the watermark
      q.processAllAvailable()
      input.addData(ev(10, 240000, 8, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("dtw_t").as[StreamingOps.DeltaWinRow[Long]].collect()
        .filter(_.key == 7L).sortBy(_.wid)
        .map(r => (r.wid, r.fire_id, r.fire_v, r.cnt, r.sv)).toSeq
      // walk: 100 init; 105 Δ5 no; 115 Δ15 FIRE (buffer 100+105+115);
      // 104 Δ11 FIRE (no purge: 4 rows, 424); 106 Δ2 no
      assert(got === Seq((0L, 3L, 115L, 3L, 320L), (1L, 4L, 104L, 4L, 424L)))
    } finally q.stop()
  }

  test("deltaTriggerWindow: DeltaEvictor permanently prunes far elements at each fire") {
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = StreamingOps.deltaTriggerWindow[Event, Long](
      withWm, _.user_id, _.event_id, _.tsUs, _.value.toLong,
      threshold = 10L, evictDelta = Some(12L))
    val q = out.writeStream.format("memory").queryName("dtw_e").outputMode("append").start()
    try {
      input.addData(ev(1, 10000, 7, "x", 100.0), ev(2, 20000, 7, "x", 105.0),
        ev(3, 30000, 7, "x", 115.0), ev(4, 40000, 7, "x", 104.0),
        ev(5, 50000, 7, "x", 106.0))
      q.processAllAvailable()
      input.addData(ev(9, 120000, 8, "x", 0.0))
      q.processAllAvailable()
      input.addData(ev(10, 240000, 8, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("dtw_e").as[StreamingOps.DeltaWinRow[Long]].collect()
        .filter(_.key == 7L).sortBy(_.wid)
        .map(r => (r.wid, r.fire_id, r.cnt, r.sv)).toSeq
      // fire@115: |100-115|=15 ≥ 12 evicts 100 PERMANENTLY → {105,115};
      // fire@104: survivors all within 12 of 104 → {105,115,104}; the
      // evicted 100 must NOT resurface in the second window
      assert(got === Seq((0L, 3L, 2L, 220L), (1L, 4L, 3L, 324L)))
    } finally q.stop()
  }

  test("continuousEventTimeWindow: interval partials then final, batching-independent") {
    def run(batches: Seq[Seq[Event]], name: String): Seq[(Long, Long, Long, Long, Boolean)] = {
      val input = MemoryStream[Event]
      val withWm = input.toDS().withWatermark("ts", "5 seconds")
      // 60 s window, 20 s continuous fire
      val out = StreamingOps.continuousEventTimeWindow[Event, Long](
        withWm, _.user_id, _.tsUs, _.value.toLong,
        windowUs = 60L * 1000000L, intervalUs = 20L * 1000000L)
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[StreamingOps.CetRow[Long]].collect()
          .filter(_.key == 7L).sortBy(r => (r.wstart_us, r.fire_us))
          .map(r => (r.wstart_us / 1000000L, r.fire_us / 1000000L, r.cnt, r.sv, r.is_final)).toSeq
      } finally q.stop()
    }
    // window [0,60): events at 5s(v1), 15s(v2), 30s(v4), 50s(v8)
    // partials: fire@20 over {5,15} = (2,3); fire@40 over {5,15,30} = (3,7)
    // final: fire@60 over all = (4,15)
    val expected = Seq(
      (0L, 20L, 2L, 3L, false), (0L, 40L, 3L, 7L, false), (0L, 60L, 4L, 15L, true))
    // gradual watermark: fires happen across separate batches
    val gradual = run(Seq(
      Seq(ev(1, 5000, 7, "x", 1.0), ev(2, 15000, 7, "x", 2.0)),
      Seq(ev(3, 30000, 7, "x", 4.0)),
      Seq(ev(90, 46000, 8, "x", 0.0)), // wm → 41s: fires 20 and 40
      Seq(ev(4, 50000, 7, "x", 8.0)),
      Seq(ev(91, 120000, 8, "x", 0.0)), // wm → 115s: final
      Seq(ev(92, 240000, 8, "x", 0.0))), "cet_g")
    assert(gradual === expected)
    // single watermark jump + out-of-order within batch: the timer sweep
    // must replay the SAME partial history before the final
    val jump = run(Seq(
      Seq(ev(4, 50000, 7, "x", 8.0), ev(1, 5000, 7, "x", 1.0),
        ev(3, 30000, 7, "x", 4.0), ev(2, 15000, 7, "x", 2.0)),
      Seq(ev(91, 120000, 8, "x", 0.0)),
      Seq(ev(92, 240000, 8, "x", 0.0))), "cet_j")
    assert(jump === expected)
  }

  test("matchWithTimeout: matched within window, timeout via timer, out-of-order safe") {
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = StreamingOps.matchWithTimeout[Event, Long](
      withWm, _.user_id, _.event_type == "L", _.tsUs, withinUs = 10L * 1000000L)
    val q = out.writeStream.format("memory").queryName("cm_t").outputMode("append").start()
    try {
      // key 7: right BEFORE its left in arrival order (out of order) —
      // still matches (R@12s inside [10s, 20s]).
      // key 8: left with an out-of-window right → timeout at 5s+10s.
      // key 9: right only → no decision ever.
      input.addData(
        ev(2, 12000, 7, "R", 0), ev(1, 10000, 7, "L", 0),
        ev(3, 5000, 8, "L", 0), ev(4, 40000, 8, "R", 0),
        ev(5, 7000, 9, "R", 0))
      q.processAllAvailable()
      input.addData(ev(9, 60000, 99, "L", 0)) // watermark → 55s: both decide
      q.processAllAvailable()
      input.addData(ev(10, 120000, 99, "R", 0)) // fire timers
      q.processAllAvailable()
      val got = spark.table("cm_t").as[StreamingOps.CoMatchRow[Long]].collect()
        .filter(r => Set(7L, 8L, 9L)(r.key)).sortBy(_.key)
        .map(r => (r.key, r.status, r.left_ts, r.right_ts)).toSeq
      assert(got === Seq(
        (7L, "matched", 10000000L, Some(12000000L)),
        (8L, "timeout", 5000000L, None)))
      // straggler above a decided key must NOT re-open it
      input.addData(ev(11, 125000, 7, "L", 0))
      q.processAllAvailable()
      input.addData(ev(12, 300000, 99, "L", 0))
      q.processAllAvailable()
      assert(spark.table("cm_t").as[StreamingOps.CoMatchRow[Long]].collect()
        .count(_.key == 7L) === 1, "decided key re-opened by a straggler")
    } finally q.stop()
  }

  test("streaming CEP with out-of-order arrival matches batch semantics") {
    val input = MemoryStream[Event]
    val pattern = Pattern.begin[Event]("s").where(_.event_type == "signup")
      .followedBy("p").where(_.event_type == "purchase")
      .within(1.minute)
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = CEP.streaming[Event, Long, (Long, Long, Long)](
      withWm, _.user_id, _.tsUs, pattern,
      (k, m) => (k, m.bindings("s").head.event_id, m.bindings("p").head.event_id))
    val q = out.writeStream.format("memory").queryName("cep_t").outputMode("append").start()
    try {
      // purchase arrives BEFORE its signup (out of order within the batch)
      input.addData(ev(2, 30000, 7, "purchase", 1.0), ev(1, 10000, 7, "signup", 1.0))
      q.processAllAvailable()
      // watermark still below decidability → nothing yet
      // advance watermark far past signup+within
      input.addData(ev(9, 200000, 8, "view", 1.0))
      q.processAllAvailable()
      input.addData(ev(10, 300000, 8, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("cep_t").as[(Long, Long, Long)].collect().toSet
      assert(got === Set((7L, 1L, 2L)))
    } finally q.stop()
  }

  test("GraftStream.earlyFire emits growing partials per batch, before window close") {
    val input = MemoryStream[Event]
    val agg = input.toDS()
      .withWatermark("ts", "10 seconds")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 minute").as("w"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .select(org.apache.spark.sql.functions.col("w.start").as("wstart"),
        org.apache.spark.sql.functions.col("cnt"))
    val q = GraftStream.earlyFire(agg, "0 seconds")
      .format("memory").queryName("early_t").start()
    try {
      // three micro-batches inside the SAME 1-minute window: each fires
      // an updated partial for it — emission count is per batch, not per
      // window close (the watermark never reaches the window end)
      for (i <- 1 to 3) {
        input.addData(ev(i.toLong, 1000L * i, 7, "x", 1.0))
        q.processAllAvailable()
      }
      val fires = spark.table("early_t").as[(Timestamp, Long)].collect().toSeq
      assert(fires.map(_._2) === Seq(1L, 2L, 3L)) // growing partials
      assert(fires.map(_._1).distinct.size === 1) // all for the same window
    } finally q.stop()
  }

  test("GraftStream window helpers: tumble/session aggregation") {
    val events = Seq(
      ev(1, 0, 1, "x", 1.0), ev(2, 30000, 1, "x", 2.0), // same 1-min tumble
      ev(3, 90000, 1, "x", 3.0)).toDS()
    val tumbled = GraftStream.tumble(events.toDF(), "ts", "1 minute")
      .count().collect()
    assert(tumbled.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
    val sessions = GraftStream.session(events.toDF(), "ts", "45 seconds")
      .count().collect()
    assert(sessions.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
  }

  test("GraftStream reduce (KeyedStream.reduce analog)") {
    val events = Seq(ev(1, 0, 1, "x", 1.0), ev(2, 1, 1, "x", 5.0), ev(3, 2, 2, "x", 7.0)).toDS()
    val reduced = GraftStream(events).keyBy(_.user_id)
      .reduce((a, b) => if (a.value >= b.value) a else b)
      .collect().toMap
    assert(reduced(1L).event_id === 2L)
    assert(reduced(2L).event_id === 3L)
  }

  test("GraftStream facade: map/filter/keyBy/matchPattern batch path") {
    val events = Seq(
      ev(1, 1000, 1, "signup", 1.0),
      ev(2, 2000, 1, "purchase", 5.0),
      ev(3, 3000, 2, "signup", 1.0)).toDS()
    val pattern = Pattern.begin[Event]("s").where(_.event_type == "signup")
      .followedBy("p").where(_.event_type == "purchase")
      .within(1.minute)
    val matches = GraftStream(events)
      .filter(_.value > 0)
      .keyBy(_.user_id)
      .matchPattern(_.tsUs, pattern)((k, m) => (k, m.bindings("p").head.event_id))
      .collect()
    assert(matches.toSeq === Seq((1L, 2L)))
  }

  test("sessionizeByGap: open session extends and closes ACROSS micro-batches") {
    val input = MemoryStream[Event]
    val out = StreamingOps.sessionizeByGap[Event, Long](
      input.toDS(), _.user_id, _.tsUs / 1000000L, _.value, gapS = 30L)
    val q = out.writeStream.format("memory").queryName("sess_t").outputMode("append").start()
    try {
      // batch 1: two events 10 s apart — one open session, nothing emitted
      input.addData(ev(1, 1000, 7, "x", 1.0), ev(2, 11000, 7, "x", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_t").count() === 0)
      // batch 2: 20 s later still inside the gap — extends the SAME session;
      // then a 31+-s jump closes it (3 events, value 1+2+4, duration 31 s)
      input.addData(ev(3, 31000, 7, "x", 4.0), ev(4, 63000, 7, "x", 8.0))
      q.processAllAvailable()
      val closed = spark.table("sess_t").as[StreamingOps.SessionRow[Long]].collect().toSeq
      assert(closed === Seq(StreamingOps.SessionRow(7L, 1L, 30L, 3L, 7.0)))
      // the new trailing session (event 4) stays open in state, unemitted
      input.addData(ev(5, 64000, 7, "x", 16.0))
      q.processAllAvailable()
      assert(spark.table("sess_t").count() === 1)
    } finally q.stop()
  }

  test("sessionizeByGap: closed sessions are batching-independent (seeded random replays)") {
    val rnd = new scala.util.Random(7)
    // 4 users, ~30 events each; inter-event gaps straddle the 30 s
    // session boundary; integral values keep measure sums exact
    val timeline = (1L to 4L).flatMap { u =>
      var t = 0L
      (0 until 30).map { i =>
        t += 1 + rnd.nextInt(60)
        (u, t, (1 + rnd.nextInt(9)).toDouble, u * 1000 + i)
      }
    }.sortBy(e => (e._2, e._1))
    // batch reference: per-user gap fold, trailing session excluded
    def sessionsOf(evs: Seq[(Long, Long, Double)]): Seq[StreamingOps.SessionRow[Long]] =
      evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val sorted = es.map(e => (e._2, e._3)).sorted
        val folded = sorted.foldLeft(List.empty[StreamingOps.SessState]) {
          case (Nil, (t, v)) => StreamingOps.SessState(t, t, 1L, v) :: Nil
          case (cur :: closed, (t, v)) if t - cur.lastS > 30 =>
            StreamingOps.SessState(t, t, 1L, v) :: cur :: closed
          case (cur :: closed, (t, v)) =>
            cur.copy(lastS = math.max(cur.lastS, t), n = cur.n + 1, sum = cur.sum + v) :: closed
        }
        folded.tail.map(o => StreamingOps.SessionRow(u, o.startS, o.lastS - o.startS, o.n, o.sum))
      }
    val expected = sessionsOf(timeline.map(e => (e._1, e._2, e._3)))
      .sortBy(r => (r.key, r.start_s))
    for (trial <- 0 until 3) {
      // random PREFIX cuts: per-key in-order delivery, the operator's contract
      val cuts = (Seq(timeline.size) ++ Seq.fill(3)(rnd.nextInt(timeline.size))).distinct.sorted
      val input = MemoryStream[Event]
      val out = StreamingOps.sessionizeByGap[Event, Long](
        input.toDS(), _.user_id, _.tsUs / 1000000L, _.value, gapS = 30L)
      val q = out.writeStream.format("memory").queryName(s"sess_prop$trial")
        .outputMode("append").start()
      try {
        var prev = 0
        cuts.foreach { c =>
          val slice = timeline.slice(prev, c)
          if (slice.nonEmpty) {
            input.addData(slice.map(e => ev(e._4, e._2 * 1000, e._1, "x", e._3)): _*)
            q.processAllAvailable()
          }
          prev = c
        }
        val got = spark.table(s"sess_prop$trial")
          .as[StreamingOps.SessionRow[Long]].collect().toSeq.sortBy(r => (r.key, r.start_s))
        assert(got === expected, s"trial $trial, cuts $cuts")
      } finally q.stop()
    }
  }

  test("sessionizeByGap timeoutFlush: watermark fires the event-time timer for quiet keys") {
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "0 seconds")
    val out = StreamingOps.sessionizeByGap[Event, Long](
      withWm, _.user_id, _.tsUs / 1000000L, _.value, gapS = 30L, timeoutFlush = true)
    val q = out.writeStream.format("memory").queryName("sess_to").outputMode("append").start()
    try {
      // key 7: session [1 s, 11 s]; timer armed at 42 s
      input.addData(ev(1, 1000, 7, "x", 1.0), ev(2, 11000, 7, "x", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_to").count() === 0)
      // another KEY advances event time to 100 s; the batch still runs
      // under the previous watermark (11 s) — no fire yet
      input.addData(ev(3, 100000, 8, "x", 4.0))
      q.processAllAvailable()
      // next batch sees watermark 100 s > 42 s: key 7's timer fires with
      // NO new key-7 events — the session flushes via the timer alone
      input.addData(ev(4, 200000, 9, "x", 8.0))
      q.processAllAvailable()
      val flushed = spark.table("sess_to").as[StreamingOps.SessionRow[Long]].collect().toSeq
      assert(flushed.contains(StreamingOps.SessionRow(7L, 1L, 10L, 2L, 3.0)))
    } finally q.stop()
  }
}
