package graft.streaming

import graft.SparkSpec
import graft.streaming.ChangelogSink.ParquetUpsertSink
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Stop/restart recovery from a checkpoint — the reference's flagship
  * exactly-once guarantee (Flink's distributed checkpointing, ref
  * flink-runtime checkpoint coordinator) expressed with Structured
  * Streaming checkpoints: a query restarted against the SAME
  * checkpointLocation must (a) not reprocess input its previous
  * incarnation already committed and (b) restore its aggregation state
  * rather than rebuild from post-restart input only. Each test really
  * kills the query (AvailableNow drains then stops — process death
  * between micro-batches) and starts a NEW query from the checkpoint.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ckpt-$tag").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("k", LongType)))

  test("file-to-file with checkpoint: restart consumes only new input, output exactly-once") {
    val src = tmp("src"); val out = tmp("out"); val ckpt = tmp("ck")
    (0L until 100L).map(i => (i, i % 5)).toDF("id", "k")
      .write.mode("append").parquet(src)
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // incarnation 1 commits batch 1, then dies
    (100L until 150L).map(i => (i, i % 5)).toDF("id", "k")
      .write.mode("append").parquet(src)
    run() // incarnation 2 resumes from the checkpointed file log
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(ids.length == 150, s"exactly-once broken: ${ids.length} rows for 150 inputs")
    assert(ids.toSeq == (0L until 150L), "every input appears exactly once")
  }

  test("stateful agg with checkpoint: restart restores state — counts stay cumulative") {
    val src = tmp("src2"); val land = tmp("land"); val ckpt = tmp("ck2")
    (0L until 60L).map(i => (i, i % 3)).toDF("id", "k").write.mode("append").parquet(src)
    def run(): Unit = {
      val counts = spark.readStream.schema(schema).parquet(src)
        .groupBy("k").count()
      val q = ParquetUpsertSink.writer(counts, land)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    (60L until 90L).map(i => (i, i % 3)).toDF("id", "k").write.mode("append").parquet(src)
    run()
    val snap = ParquetUpsertSink.snapshot(spark, land, Seq("k"))
      .as[(Long, Long)].collect().toMap
    // 90 rows over 3 keys → 30 each; a lost state store would report 10
    // (the post-restart batch alone)
    assert(snap == Map(0L -> 30L, 1L -> 30L, 2L -> 30L),
      s"state not restored across restart: $snap")
  }
}
