package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, tsMs: Long, user: Long, typ: String, v: Double = 1.0) =
    Event(id, new Timestamp(tsMs), user, typ, v)

  test("row-time temporal join resolves probes against the version valid AS OF their time, out of order") {
    val probeIn = MemoryStream[Event]
    val versionIn = MemoryStream[Event]
    val out = TemporalJoin.rowTime[Event, Event](
      probeIn.toDS(), versionIn.toDS(), watermarkDelay = "5 seconds",
      _.user_id, _.ts, _.event_id,
      _.user_id, _.ts, _.event_id, _.value)
    val q = out.toDF().writeStream.format("memory").queryName("tj_t").outputMode("append").start()
    try {
      // probe and its valid version arrive together (out of ts order
      // within the batch); a NEWER version arrives in a later batch
      probeIn.addData(ev(100, 20000, 7, "p"))
      versionIn.addData(ev(1, 10000, 7, "v", 1.5))
      q.processAllAvailable()
      versionIn.addData(ev(2, 25000, 7, "v", 2.5))
      q.processAllAvailable()
      assert(spark.table("tj_t").count() === 0) // watermark still below probe ts
      // advance watermark beyond the probe
      versionIn.addData(ev(3, 60000, 8, "v", 9.9))
      q.processAllAvailable()
      probeIn.addData(ev(101, 61000, 8, "p"))
      q.processAllAvailable()
      val rows = spark.table("tj_t").as[TemporalJoin.TjRow].collect()
        .map(r => r.probe_id -> r.version_id).toMap
      // probe 100 at t=20s: version 1 (t=10s) is the latest <= 20s;
      // version 2 (t=25s) must NOT be picked even though it arrived together
      assert(rows === Map(100L -> Some(1L)))
    } finally q.stop()
  }

  test("probe with no prior version resolves to None") {
    val probeIn = MemoryStream[Event]
    val versionIn = MemoryStream[Event]
    val out = TemporalJoin.rowTime[Event, Event](
      probeIn.toDS(), versionIn.toDS(), watermarkDelay = "1 second",
      _.user_id, _.ts, _.event_id,
      _.user_id, _.ts, _.event_id, _.value)
    val q = out.toDF().writeStream.format("memory").queryName("tj_t2").outputMode("append").start()
    try {
      probeIn.addData(ev(100, 10000, 7, "p"))
      versionIn.addData(ev(1, 50000, 7, "v")) // only a FUTURE version
      q.processAllAvailable()
      probeIn.addData(ev(101, 90000, 9, "p"))
      q.processAllAvailable()
      val rows = spark.table("tj_t2").as[TemporalJoin.TjRow].collect()
        .map(r => r.probe_id -> r.version_id).toMap
      assert(rows(100L) === None)
    } finally q.stop()
  }
}
