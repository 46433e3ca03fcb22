package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom DSv2 connector's contracts: range splits tile the id
  * space exactly, results are partition-count invariant, payloads are
  * the md5 the oracle recomputes, and the streaming offset round-trips
  * through its JSON form.
  */
class SeqSourceSpec extends SparkSpec {

  test("splits tile [start, end) exactly — no gap, no overlap, any n") {
    for (n <- Seq(1, 3, 8, 50); (s, e) <- Seq((0L, 100L), (5L, 7L), (10L, 10L))) {
      val parts = SeqSource.splits(s, e, n)
      assert(parts.map { case (a, b) => b - a }.sum === e - s)
      assert(parts.sliding(2).forall {
        case Seq((_, b1), (a2, _)) => b1 == a2
        case _ => true
      })
      parts.headOption.foreach { case (a, _) => assert(a === s) }
      parts.lastOption.foreach { case (_, b) => assert(b === e) }
    }
  }

  test("batch read is partition-count invariant and content-deterministic") {
    def read(parts: Int) =
      spark.read.format(classOf[SeqSource].getName)
        .option("rows", 999).option("partitions", parts).load()
    val r8 = read(8)
    assert(read(2).count() === 999L)
    assert(r8.count() === 999L)
    assert(read(2).agg(sum("id")).head().getLong(0) === r8.agg(sum("id")).head().getLong(0))
    val row = r8.filter(col("id") === 42L).head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("42".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(row.getString(1) === expect)
  }

  test("streaming drains in rowsPerBatch steps under AvailableNow") {
    import org.apache.spark.sql.streaming.Trigger
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format(classOf[SeqSource].getName)
      .option("rows", 250).option("rowsPerBatch", 100).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized { seen += ((id, batch.count())) }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.sortBy(_._1).toSeq === Seq((0L, 100L), (1L, 100L), (2L, 50L)))
  }
}
