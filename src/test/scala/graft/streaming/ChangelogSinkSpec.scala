package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Upsert-collapse at the sink: an update-mode top-1 stream merged into
  * a keyed store must converge to the batch answer — the supported
  * changelog strategy (SURVEY §7 hard part #1).
  */
class ChangelogSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, tsMs: Long, user: Long, v: Double) =
    Event(id, new Timestamp(tsMs), user, "x", v)

  test("update-mode top-1 stream collapsed via foreachBatch equals final state") {
    val input = MemoryStream[Event]
    val top1 = StreamingOps.topNByKey[Event, Long](input.toDS(), _.user_id, _.event_id, _.value, n = 1)
    val store = new ChangelogSink.MemoryUpsertStore[Long]
    val q = ChangelogSink.upsertWriter(top1.toDF(), (r: Row) => r.getAs[Long]("key"), store)
      .start()
    try {
      input.addData(ev(1, 1000, 7, 5.0), ev(2, 2000, 8, 1.0))
      q.processAllAvailable()
      input.addData(ev(3, 3000, 7, 9.0)) // displaces user 7's top-1 → upsert
      q.processAllAvailable()
      input.addData(ev(4, 4000, 8, 0.5)) // no change for user 8
      q.processAllAvailable()
      val finalState = store.snapshot.map { case (k, r) => k -> r.getAs[Long]("id") }
      assert(finalState === Map(7L -> 3L, 8L -> 2L))
    } finally q.stop()
  }

  test("ParquetUpsertSink: distributed landing + last-writer-wins snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val input = MemoryStream[Event]
    val top1 = StreamingOps.topNByKey[Event, Long](input.toDS(), _.user_id, _.event_id, _.value, n = 1)
    val q = ChangelogSink.ParquetUpsertSink.writer(top1.toDF(), dir).start()
    try {
      input.addData(ev(1, 1000, 7, 5.0), ev(2, 2000, 8, 1.0))
      q.processAllAvailable()
      input.addData(ev(3, 3000, 7, 9.0)) // displaces user 7's top-1
      q.processAllAvailable()
      val snap = ChangelogSink.ParquetUpsertSink.snapshot(spark, dir, Seq("key"))
        .select($"key", $"id").as[(Long, Long)].collect().toMap
      assert(snap === Map(7L -> 3L, 8L -> 2L))
    } finally q.stop()
    // replaying a batchId overwrites its own directory with the same
    // content → snapshot unchanged (the parquet analog of idempotence)
    val replay = Seq((7L, 1L, 3L, 9.0)).toDF("key", "rank", "id", "score")
    ChangelogSink.ParquetUpsertSink.writeBatch(replay, 1L, dir)
    ChangelogSink.ParquetUpsertSink.writeBatch(replay, 1L, dir)
    val snap2 = ChangelogSink.ParquetUpsertSink.snapshot(spark, dir, Seq("key"))
      .select($"key", $"id").as[(Long, Long)].collect().toMap
    assert(snap2 === Map(7L -> 3L, 8L -> 2L))
  }

  test("snapshot asOfBatch: time travel reproduces each version and PRUNES later partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tt").toString
    def batch(rows: (Long, Long)*): org.apache.spark.sql.DataFrame =
      rows.toSeq.toDF("key", "v")
    ChangelogSink.ParquetUpsertSink.writeBatch(batch(7L -> 1L, 8L -> 1L), 0L, dir)
    ChangelogSink.ParquetUpsertSink.writeBatch(batch(7L -> 2L), 1L, dir)
    ChangelogSink.ParquetUpsertSink.writeBatch(batch(8L -> 3L, 9L -> 3L), 2L, dir)
    def asOf(b: Long): Map[Long, Long] =
      ChangelogSink.ParquetUpsertSink.snapshot(spark, dir, Seq("key"), asOfBatch = Some(b))
        .select($"key", $"v").as[(Long, Long)].collect().toMap
    assert(asOf(0L) === Map(7L -> 1L, 8L -> 1L))
    assert(asOf(1L) === Map(7L -> 2L, 8L -> 1L))
    assert(asOf(2L) === Map(7L -> 2L, 8L -> 3L, 9L -> 3L))
    // the as-of filter must reach the scan as a PARTITION filter — old
    // versions cost only the partitions they touch, not a full-store read
    val plan = ChangelogSink.ParquetUpsertSink
      .snapshot(spark, dir, Seq("key"), asOfBatch = Some(0L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ingest_batch"),
      s"as-of read not partition-pruned:\n$plan")
  }

  test("JdbcUpsertSink merges update-mode output into Derby, replay-safe") {
    System.setProperty("derby.stream.error.file", "/tmp/graft-derby/derby.log")
    val url = s"jdbc:derby:/tmp/graft-derby/upsert_spec_${System.nanoTime()};create=true"
    ChangelogSink.JdbcUpsertSink.ensureTable(url, "TOP1",
      """"key" BIGINT NOT NULL, "rank" BIGINT, "id" BIGINT, "score" DOUBLE""",
      keyCols = Seq("key"))
    val input = MemoryStream[Event]
    val top1 = StreamingOps.topNByKey[Event, Long](input.toDS(), _.user_id, _.event_id, _.value, n = 1)
    val q = ChangelogSink.JdbcUpsertSink.writer(top1.toDF(), url, "TOP1", Seq("key")).start()
    def state(): Map[Long, Long] = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery("""SELECT "key", "id" FROM TOP1""")
        Iterator.continually(rs).takeWhile(_.next()).map(r => r.getLong(1) -> r.getLong(2)).toMap
      } finally conn.close()
    }
    try {
      input.addData(ev(1, 1000, 7, 5.0), ev(2, 2000, 8, 1.0))
      q.processAllAvailable()
      input.addData(ev(3, 3000, 7, 9.0)) // displaces user 7's top-1 → UPDATE path
      q.processAllAvailable()
      assert(state() === Map(7L -> 3L, 8L -> 2L))
    } finally q.stop()
    // key-based merge: re-applying the same upsert rewrites the same state
    val replay = Seq((7L, 1L, 3L, 9.0)).toDF("key", "rank", "id", "score")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val up = conn.prepareStatement(
        """UPDATE TOP1 SET "rank" = ?, "id" = ?, "score" = ? WHERE "key" = ?""")
      up.setLong(1, 1L); up.setLong(2, 3L); up.setDouble(3, 9.0); up.setLong(4, 7L)
      up.executeUpdate()
    } finally conn.close()
    assert(state() === Map(7L -> 3L, 8L -> 2L))
    assert(replay.count() == 1)
  }

  test("store idempotence: replaying a batchId is a no-op") {
    val store = new ChangelogSink.MemoryUpsertStore[Long]
    val row1 = Row(1L, "a")
    val row2 = Row(1L, "b")
    store.upsert(0L, Seq(1L -> row1))
    store.upsert(0L, Seq(1L -> row2)) // replay with different content ignored
    assert(store.snapshot(1L) === row1)
  }
}
