package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVM storage contracts: DeltaStore per-batch writes track the
  * increment (never the view size), compaction folds without changing
  * the snapshot, retries are idempotent; BucketStore rewrites only the
  * buckets a delta touches and keeps net-multiplicity live state.
  */
class DeltaStoreSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("DeltaStore: per-batch written rows track the delta, snapshot accumulates, compact folds") {
    import spark.implicits._
    val store = DeltaStore(spark, tmp("dstore"))
    store.init(Seq.empty[(Long, Long)].toDF("k", "v"))
    // batches of very different sizes: written rows must equal THAT
    // batch's delta size, not the accumulated view size
    val sizes = Seq(100, 3, 50)
    sizes.zipWithIndex.foreach { case (n, b) =>
      store.append(b.toLong, (1 to n).map(i => (b.toLong * 1000 + i, i.toLong)).toDF("k", "v"))
    }
    assert(sizes.zipWithIndex.forall { case (n, b) => store.deltaRows(b.toLong) == n.toLong })
    assert(store.snapshot(2L).count() === sizes.sum.toLong)
    assert(store.snapshot(1L).count() === (sizes(0) + sizes(1)).toLong)
    // compaction folds history without changing the visible state
    val before = store.snapshot(2L).as[(Long, Long)].collect().toSet
    store.compact(2L)
    assert(store.snapshot(2L).as[(Long, Long)].collect().toSet === before)
    // post-compaction appends stack on the compacted base
    store.append(3L, Seq((9999L, 9L)).toDF("k", "v"))
    assert(store.snapshot(3L).count() === sizes.sum.toLong + 1)
    // a retried batch overwrites its own delta — no duplication
    store.append(3L, Seq((9999L, 9L)).toDF("k", "v"))
    assert(store.snapshot(3L).count() === sizes.sum.toLong + 1)
  }

  test("BucketStore: only touched buckets are rewritten; net state is the live set") {
    import spark.implicits._
    val nb = 8
    val store = BucketStore(spark, tmp("bstore"), nb)
    store.init(Seq.empty[(Long, Long)].toDF("k", "mult"), "k")
    // batch 0: a spread of keys over all buckets
    val keys = (1L to 64L)
    store.applyDelta(0L, keys.map(k => (k, 1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    assert(store.snapshot(0L).count() === 64L)
    val allBuckets = store.bucketsWritten(0L)
    assert(allBuckets.size === nb, "64 keys over 8 buckets should hit all of them")
    // batch 1: touch ONE key — only its bucket may be rewritten
    store.applyDelta(1L, Seq((7L, 1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    assert(store.bucketsWritten(1L).size === 1, "untouched buckets must not be rewritten")
    assert(store.rowsWritten(1L) < 64L, "write cost must track the touched working set")
    val s1 = store.snapshot(1L).as[(Long, Long)].collect().toMap
    assert(s1(7L) === 2L && s1(8L) === 1L && s1.size === 64)
    // batch 2: retract key 7 down to zero — it leaves the live set
    store.applyDelta(2L, Seq((7L, -2L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    val s2 = store.snapshot(2L).as[(Long, Long)].collect().toMap
    assert(!s2.contains(7L) && s2.size === 63)
    // a retried applyDelta recomputes the same version from prior state
    store.applyDelta(2L, Seq((7L, -2L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    assert(store.snapshot(2L).as[(Long, Long)].collect().toMap === s2)
  }

  test("BucketStore: retracting a bucket's ENTIRE net state leaves it empty, not resurrected") {
    import spark.implicits._
    // single bucket so the only key's full retraction empties the whole
    // bucket — the case where partitionBy writes no directory and a
    // stale older version would otherwise stay the bucket's latest
    val store = BucketStore(spark, tmp("bempty"), 1)
    store.init(Seq.empty[(Long, Long)].toDF("k", "mult"), "k")
    store.applyDelta(0L, Seq((1L, 1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    assert(store.snapshot(0L).count() === 1L)
    store.applyDelta(1L, Seq((1L, -1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    assert(store.snapshot(1L).count() === 0L,
      "a fully-retracted bucket must read empty, not its stale prior version")
    // and a later insert starts from the emptied state
    store.applyDelta(2L, Seq((2L, 1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    val s2 = store.snapshot(2L).as[(Long, Long)].collect().toMap
    assert(s2 === Map(2L -> 1L), s"expected only the new row, got $s2")
  }

  test("BucketStore: snapshot shadows per bucket (older versions of a touched bucket are invisible)") {
    import spark.implicits._
    val store = BucketStore(spark, tmp("bshadow"), 4)
    store.init(Seq.empty[(Long, Long)].toDF("k", "mult"), "k")
    store.applyDelta(0L, Seq((1L, 1L), (2L, 1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    // key 1 and key 2 may share a bucket or not; touch key 1 twice more
    store.applyDelta(1L, Seq((1L, 1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    store.applyDelta(2L, Seq((1L, 1L)).toDF("k", "mult"), "k", Seq("k"), "mult")
    val s = store.snapshot(2L).as[(Long, Long)].collect().toMap
    assert(s(1L) === 3L && s(2L) === 1L, s"shadowing broke net state: $s")
    // reading an OLDER snapshot sees the state as of that batch
    val s0 = store.snapshot(0L).as[(Long, Long)].collect().toMap
    assert(s0(1L) === 1L && s0(2L) === 1L)
  }
}
