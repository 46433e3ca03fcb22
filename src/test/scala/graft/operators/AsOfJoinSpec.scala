package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("backward as-of join picks latest right row at or before left ts") {
    val left = Seq(
      (1L, "k1", ts(100)),
      (2L, "k1", ts(205)),
      (3L, "k2", ts(50)),
      (4L, "k3", ts(10))
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", ts(90), 900L),
      ("k1", ts(100), 1000L), // equal ts: inclusive
      ("k1", ts(200), 2000L),
      ("k2", ts(60), 600L) // after left row 3: must not match
    ).toDF("k", "rts", "payload")

    val res = AsOfJoin.backward(left, right, keys = Seq("k"),
      leftTs = "ts", rightTs = "rts", payload = Seq("payload"),
      tieBreak = Some("payload"))
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap

    assert(res(1L) === Some(1000L)) // equal-ts right row wins (inclusive <=)
    assert(res(2L) === Some(2000L)) // latest prior
    assert(res(3L) === None) // right row is in the future
    assert(res(4L) === None) // no right rows for key
  }

  test("a NULL-payload latest version wins (no fallback to older versions)") {
    val left = Seq((1L, "k", ts(100))).toDF("id", "k", "ts")
    val right = Seq(("k", ts(50), Some(500L)), ("k", ts(90), None))
      .toDF("k", "rts", "payload")
    // FOR SYSTEM_TIME AS OF: the ts(90) version is the match even though
    // its payload value is NULL — it must not be skipped for ts(50).
    val res = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("payload"))
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap
    assert(res(1L) === None)
  }

  test("ties between concurrent right versions resolve to the larger tieBreak") {
    val left = Seq((1L, "k", ts(100))).toDF("id", "k", "ts")
    val right = Seq(("k", ts(100), 7L), ("k", ts(100), 9L)).toDF("k", "rts", "payload")
    val res = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("payload"),
      tieBreak = Some("payload")).select("payload").as[Long].head()
    assert(res === 9L)
  }
}
