package graft.streaming

import graft.SparkSpec
import graft.cep.{CEP, NFA, Pattern}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import scala.concurrent.duration._

/** Streaming exactly-once for the RESCANNING after-match strategies
  * (ref: nfa/aftermatch SkipToFirstStrategy/SkipToLastStrategy): unlike
  * SKIP PAST LAST ROW, SkipToFirst/Last re-USE events of an emitted
  * match, so the streaming layer cannot retire consumed events on
  * emission — CEP.scala instead relies on the within-horizon expiry
  * (decidable start ⇔ expired start) to prevent re-emission when the
  * buffer is re-walked in later batches. Batch coverage exists in
  * NFASpec; this suite pins the STREAMING behavior per mode: across
  * arbitrary later batches (new watermark pushes, group-timeout
  * re-walks), every match the batch NFA finds is emitted EXACTLY once.
  */
class CepSkipStreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, tsMs: Long, user: Long, typ: String): Event =
    Event(id, new Timestamp(tsMs), user, typ, 1.0)

  // A A B A A B for user 7 (1s apart) — with a=A.times(2).consecutive,
  // b=B, the rescanning strategies restart INSIDE the first match, so
  // a naive re-walk that forgot an emission would double-emit (0,2)
  private val user7 = Seq(
    ev(1, 1000, 7, "A"), ev(2, 2000, 7, "A"), ev(3, 3000, 7, "B"),
    ev(4, 4000, 7, "A"), ev(5, 5000, 7, "A"), ev(6, 6000, 7, "B"))

  private def pattern(skip: String): Pattern[Event] = {
    val base = Pattern.begin[Event]("a").where(_.event_type == "A").times(2).consecutive
      .next("b").where(_.event_type == "B")
      .within(10.seconds)
    skip match {
      case "first" => base.afterMatchSkipToFirst("a")
      case "last" => base.afterMatchSkipToLast("a")
    }
  }

  private def runMode(skip: String): Unit = {
    val p = pattern(skip)
    // ground truth: the batch NFA over the same ordered events
    val expected = NFA.findMatches(user7.toIndexedSeq, (e: Event) => e.tsUs, p, tsPerMs = 1000L)
      .map(m => (7L, m.bindings("a").map(_.event_id).mkString(","), m.bindings("b").head.event_id))

    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = CEP.streaming[Event, Long, (Long, String, Long)](
      withWm, _.user_id, _.tsUs, p,
      (k, m) => (k, m.bindings("a").map(_.event_id).mkString(","), m.bindings("b").head.event_id))
    val q = out.writeStream.format("memory").queryName(s"cep_skip_$skip")
      .outputMode("append").start()
    try {
      input.addData(user7: _*)
      q.processAllAvailable()
      // watermark pusher (non-matching user): decidability horizon
      // passes every start; the matches emit in this batch and their
      // starts expire from the buffer by the same inequality
      input.addData(ev(90, 60000, 8, "view"))
      q.processAllAvailable()
      val afterEmit = spark.table(s"cep_skip_$skip").as[(Long, String, Long)].collect().toSeq
      assert(afterEmit.sorted === expected.sorted,
        s"$skip: streaming emissions != batch NFA matches")
      // two more batches: another watermark push and a group-timeout
      // re-walk — a rescanning strategy that failed to retire emitted
      // starts would re-find (and re-emit) matches here
      input.addData(ev(91, 70000, 8, "view"))
      q.processAllAvailable()
      input.addData(ev(92, 80000, 8, "view"))
      q.processAllAvailable()
      val afterReWalk = spark.table(s"cep_skip_$skip").as[(Long, String, Long)].collect().toSeq
      assert(afterReWalk.sorted === expected.sorted,
        s"$skip: re-emission across batches (got ${afterReWalk.length}, want ${expected.length})")
    } finally q.stop()
  }

  test("SKIP TO FIRST streaming: batch-equal match set, no re-emission across batches") {
    runMode("first")
  }

  test("SKIP TO LAST streaming: batch-equal match set, no re-emission across batches") {
    runMode("last")
  }

  test("SKIP TO LAST streaming: matches split across batches still emit exactly once") {
    val p = pattern("last")
    val expected = NFA.findMatches(user7.toIndexedSeq, (e: Event) => e.tsUs, p, tsPerMs = 1000L)
      .map(m => (7L, m.bindings("a").map(_.event_id).mkString(","), m.bindings("b").head.event_id))
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "5 seconds")
    val out = CEP.streaming[Event, Long, (Long, String, Long)](
      withWm, _.user_id, _.tsUs, p,
      (k, m) => (k, m.bindings("a").map(_.event_id).mkString(","), m.bindings("b").head.event_id))
    val q = out.writeStream.format("memory").queryName("cep_skip_split")
      .outputMode("append").start()
    try {
      // the first match's events arrive over TWO batches, the second
      // match's over a third — the buffered re-walks see partial
      // prefixes repeatedly before anything is decidable
      input.addData(user7.take(2): _*)
      q.processAllAvailable()
      input.addData(user7(2))
      q.processAllAvailable()
      input.addData(user7.drop(3): _*)
      q.processAllAvailable()
      input.addData(ev(90, 60000, 8, "view"))
      q.processAllAvailable()
      input.addData(ev(91, 70000, 8, "view"))
      q.processAllAvailable()
      val got = spark.table("cep_skip_split").as[(Long, String, Long)].collect().toSeq
      assert(got.sorted === expected.sorted)
    } finally q.stop()
  }
}
