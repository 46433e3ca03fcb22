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
    val out = StreamingOps.overUnboundedPreceding[Event](
      input.toDS().withWatermark("ts", "5 seconds"), _.user_id, _.event_id, _.tsUs, _.value)
    val q = out.writeStream.format("memory").queryName("over_t").outputMode("append").start()
    try {
      input.addData(ev(1, 10000, 1.0), ev(2, 20000, 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 40000, 3.0)) // advances watermark to 35s → rows 1,2 emit
      q.processAllAvailable()
      val r1 = spark.table("over_t").as[StreamingOps.OverRow].collect().sortBy(_.id)
      assert(r1.map(r => (r.id, r.running_sum, r.running_cnt)).toSeq ===
        Seq((1L, 1.0, 1L), (2L, 3.0, 2L)))
      // a late row below the last emitted ts must be dropped
      input.addData(ev(4, 15000, 100.0), ev(5, 60000, 5.0)) // wm → 55s: row 3 emits, row 4 dropped
      q.processAllAvailable()
      val r2 = spark.table("over_t").as[StreamingOps.OverRow].collect().sortBy(_.id)
      assert(r2.map(_.id).toSeq === Seq(1L, 2L, 3L))
      assert(r2.last.running_sum === 6.0)
    } finally q.stop()
  }
}
