package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** KeyedProcessFunction-facade test: a session-gap detector built on
  * StreamingOps.process — value state + event-time timer emulation
  * (ref: KeyedProcessFunction with registerEventTimeTimer).
  */
class KeyedProcessSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, tsMs: Long, user: Long) =
    Event(id, new Timestamp(tsMs), user, "x", 1.0)

  /** Emits (key, count) once no event arrives for the key for 10s of
    * event time — the classic inactivity-timeout process function.
    */
  private object SessionCounter
      extends StreamingOps.KeyedProcess[Long, Event, (Long, Long), (Long, Long)] {
    // state = (count, lastTsUs)
    override def process(key: Long, events: Seq[Event], state: Option[(Long, Long)],
        wmMs: Long): (Seq[(Long, Long)], Option[(Long, Long)]) = {
      val (cnt, lastUs) = state.getOrElse((0L, 0L))
      if (events.isEmpty) {
        // timer fired: close the session
        if (wmMs * 1000 >= lastUs + 10000000L) (Seq((key, cnt)), None)
        else (Nil, state)
      } else {
        val newCnt = cnt + events.length
        val newLast = math.max(lastUs, events.map(_.tsUs).max)
        (Nil, Some((newCnt, newLast)))
      }
    }
    override def timerMs(state: (Long, Long)): Option[Long] =
      Some(state._2 / 1000 + 10000)
  }

  test("keyed process with event-time timer closes inactive sessions") {
    val input = MemoryStream[Event]
    val out = StreamingOps.process[Long, Event, (Long, Long), (Long, Long)](
      input.toDS().withWatermark("ts", "2 seconds"), _.user_id, _.tsUs, SessionCounter)
    val q = out.writeStream.format("memory").queryName("kp_t").outputMode("update").start()
    try {
      input.addData(ev(1, 10000, 7), ev(2, 11000, 7))
      q.processAllAvailable()
      assert(spark.table("kp_t").count() === 0) // session open
      // user 8 keeps the stream moving; watermark passes 7's timer
      input.addData(ev(3, 40000, 8))
      q.processAllAvailable()
      input.addData(ev(4, 50000, 8))
      q.processAllAvailable()
      val rows = spark.table("kp_t").as[(Long, Long)].collect().toSet
      assert(rows === Set((7L, 2L))) // user 7 session closed with 2 events
    } finally q.stop()
  }
}
