package graft.operators

import graft.SparkSpec
import graft.streaming.{Event, StreamingOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.concurrent.Future
import scala.concurrent.duration._

class MiscOpsSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("AsyncEnrich.mapAsyncOrdered preserves input order under parallelism") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val ds = (1 to 100).toDS()
    val out = AsyncEnrich.mapAsyncOrdered(ds, parallelism = 8, timeout = 30.seconds) { i =>
      Future {
        Thread.sleep(if (i % 7 == 0) 20 else 1) // jittered latencies
        i * 2
      }
    }
    // order preserved within each partition
    val perPartition = out.mapPartitions(it => Iterator.single(it.toSeq)).collect()
    perPartition.foreach(seq => assert(seq === seq.sorted))
    assert(out.collect().sorted === (1 to 100).map(_ * 2).toArray)
  }

  test("AsyncEnrich.mapAsyncUnordered yields every result exactly once (completion order)") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val ds = (1 to 100).toDS()
    val out = AsyncEnrich.mapAsyncUnordered(ds, parallelism = 8, timeout = 30.seconds) { i =>
      Future {
        Thread.sleep(if (i % 7 == 0) 20 else 1) // slow lookups must not block others
        i * 2
      }
    }
    assert(out.collect().sorted === (1 to 100).map(_ * 2).toArray)
  }

  test("Iterations.deltaLoop converges on empty workset and upserts the delta") {
    // min-label propagation on a 2-component path graph: 1-2-3, 4-5
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 5L), (5L, 4L))
      .toDF("src", "dst").localCheckpoint()
    val init = edges.select($"src".as("node")).distinct().withColumn("comp", $"node")
    val res = Iterations.deltaLoop(init, init, Seq("node"), maxIter = 10) {
      (solution, workset) =>
        val cand = workset.join(edges, workset("node") === edges("src"))
          .select(col("dst").as("node"), col("comp"))
          .groupBy("node").agg(min("comp").as("comp"))
        val delta = cand.join(solution.withColumnRenamed("comp", "old"), Seq("node"))
          .filter(col("comp") < col("old")).select("node", "comp")
        (delta, delta)
    }
    assert(res.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("StreamingOps.countWindow fires every N watermark-ready events, never a partial window") {
    val input = MemoryStream[Event]
    def ev(id: Long, tsMs: Long, v: Double) = Event(id, new Timestamp(tsMs), 1L, "x", v)
    val out = StreamingOps.countWindow[Event, Long](
      input.toDS().withWatermark("ts", "5 seconds"), _.user_id, _.event_id, _.tsUs, _.value, size = 2)
    val q = out.writeStream.format("memory").queryName("cw_t").outputMode("append").start()
    try {
      // out-of-order arrival: 2 before 1 — the watermark gate must still
      // window them in event-time order
      input.addData(ev(2, 20000, 2.0), ev(1, 10000, 1.0))
      q.processAllAvailable()
      input.addData(ev(3, 40000, 3.0), ev(4, 41000, 4.0)) // wm → 36s: window(1,2) fires
      q.processAllAvailable()
      input.addData(ev(5, 60000, 5.0)) // wm → 55s: window(3,4) fires; 5 stays partial
      q.processAllAvailable()
      input.addData(ev(6, 99000, 6.0)) // wm → 94s: (5,6) still partial at fire time? no — both ready, fires
      q.processAllAvailable()
      val rows = spark.table("cw_t").as[StreamingOps.CountWinRow[Long]].collect().sortBy(_.wid)
      assert(rows.map(r => (r.wid, r.first_id, r.last_id, r.sv)).toSeq ===
        Seq((0L, 1L, 2L, 3.0), (1L, 3L, 4L, 7.0)))
    } finally q.stop()
  }

  test("evictingTumbleWindow: time evictor keeps only the tail of each fired window") {
    val input = MemoryStream[Event]
    def ev(id: Long, tsMs: Long, v: Double) = Event(id, new Timestamp(tsMs), 1L, "x", v)
    // 10s windows; TimeEvictor keeps elements within 3s of the window max
    val out = StreamingOps.evictingTumbleWindow[Event, Long](
      input.toDS().withWatermark("ts", "2 seconds"), _.user_id, _.event_id, _.tsUs, _.value,
      windowUs = 10L * 1000000L, keepLastUs = Some(3L * 1000000L))
    val q = out.writeStream.format("memory").queryName("evict_t").outputMode("append").start()
    try {
      input.addData(ev(1, 1000, 1.0), ev(2, 5000, 2.0), ev(3, 8000, 4.0), ev(4, 9000, 8.0))
      q.processAllAvailable()
      input.addData(ev(5, 15000, 16.0)) // wm → 13s: window [0,10) fires
      q.processAllAvailable()
      val rows = spark.table("evict_t").as[StreamingOps.EvictWinRow[Long]].collect()
      // max ts 9s → keep >= 6s: events 3 and 4 survive, 1 and 2 evicted
      assert(rows.map(r => (r.wstartUs, r.cnt, r.sv)).toSeq === Seq((0L, 2L, 12.0)))
    } finally q.stop()
  }

  test("SideOutputs.split routes rows first-match-wins and partitions completely") {
    val df = Seq((1, "error", 10.0), (2, "view", 99.0), (3, "view", 1.0)).toDF("id", "t", "v")
    val parts = SideOutputs.split(df, Seq(
      "errors" -> (col("t") === "error"),
      "whales" -> (col("v") > 95.0)))
    assert(parts("errors").select("id").as[Int].collect().toSeq === Seq(1))
    assert(parts("whales").select("id").as[Int].collect().toSeq === Seq(2))
    assert(parts("main").select("id").as[Int].collect().toSeq === Seq(3))
  }

  test("Iterations.loop applies steps and stops on convergence") {
    val init = Seq(1).toDF("x")
    var steps = 0
    val res = Iterations.loop(init, maxIter = 10,
      done = (_, next) => next.agg(max("x")).head().getInt(0) >= 4) { df =>
      steps += 1
      df.select((col("x") * 2).as("x"))
    }
    assert(res.head().getInt(0) === 4)
    assert(steps === 2)
  }

  test("streaming overUnboundedPreceding emits watermarked prefix with running aggs, drops late rows") {
    val input = MemoryStream[Event]
    def ev(id: Long, tsMs: Long, v: Double) = Event(id, new Timestamp(tsMs), 1L, "x", v)
    val out = StreamingOps.overUnboundedPreceding[Event, Long](
      input.toDS().withWatermark("ts", "5 seconds"), _.user_id, _.event_id, _.tsUs, _.value)
    val q = out.writeStream.format("memory").queryName("over_t").outputMode("append").start()
    try {
      input.addData(ev(1, 10000, 1.0), ev(2, 20000, 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 40000, 3.0)) // advances watermark to 35s → rows 1,2 emit
      q.processAllAvailable()
      val r1 = spark.table("over_t").as[StreamingOps.OverRow[Long]].collect().sortBy(_.id)
      assert(r1.map(r => (r.id, r.running_sum, r.running_cnt)).toSeq ===
        Seq((1L, 1.0, 1L), (2L, 3.0, 2L)))
      // a late row below the last emitted ts must be dropped
      input.addData(ev(4, 15000, 100.0), ev(5, 60000, 5.0)) // wm → 55s: row 3 emits, row 4 dropped
      q.processAllAvailable()
      val r2 = spark.table("over_t").as[StreamingOps.OverRow[Long]].collect().sortBy(_.id)
      assert(r2.map(_.id).toSeq === Seq(1L, 2L, 3L))
      assert(r2.last.running_sum === 6.0)
    } finally q.stop()
  }
}
