package graft

import graft.operators.{Indexing, Profiling}
import org.apache.spark.sql.functions._

/** DataSetUtils surface (ref DataSetUtils.java): the members whose
  * values are partition-layout-dependent (zipWithUniqueId,
  * countElementsPerPartition) get property checks here; zipWithIndex,
  * summarize, checksumHashCode and the deterministic fixed-size sample
  * are oracle-checked as q_api_* queries.
  */
class IndexingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"))

  test("zipWithIndex: ids are exactly 0..n-1 and follow the declared order") {
    val n = ev.count()
    val z = Indexing.zipWithIndex(ev, Seq(col("event_id")), "idx", buckets = 7)
    assert(z.count() === n)
    val ids = z.agg(min("idx"), max("idx"), countDistinct("idx")).head()
    assert(ids.getLong(0) === 0L && ids.getLong(1) === n - 1 && ids.getLong(2) === n)
    // order law: idx sorts exactly like event_id
    assert(z.filter(col("idx") === 0).head().getLong(z.columns.indexOf("event_id"))
      === ev.agg(min("event_id")).head().getLong(0))
    val inversions = z.as("a").join(z.as("b"),
      col("a.idx") < col("b.idx") && col("a.event_id") > col("b.event_id")).count()
    assert(inversions === 0L, "index order diverges from event_id order")
  }

  test("zipWithUniqueId: unique labels, count preserved, no extra pass needed") {
    val n = ev.count()
    val z = Indexing.zipWithUniqueId(ev, "uid")
    assert(z.count() === n)
    assert(z.agg(countDistinct("uid")).head().getLong(0) === n)
    // the shifted-bits label always embeds a valid partition id
    val p = ev.rdd.getNumPartitions
    val shifter = 64 - java.lang.Long.numberOfLeadingZeros(math.max(p - 1, 0).toLong)
    val maxTask = z.agg(max(col("uid").bitwiseAND(lit((1L << shifter) - 1)))).head().getLong(0)
    assert(maxTask < p.toLong)
  }

  test("countElementsPerPartition: counts sum to the total and cover each partition at most once") {
    val counts = Indexing.countElementsPerPartition(ev).collect()
    assert(counts.map(_.getLong(1)).sum === ev.count())
    assert(counts.map(_.getInt(0)).distinct.length === counts.length)
  }

  test("summarize rejects unprofilable column types loudly") {
    intercept[IllegalArgumentException](
      Profiling.summarize(Tables(spark, dir, "lineitem"), Seq("l_shipdate")))
  }

  test("moments merge law: split-profile merge equals the whole-table profile") {
    val li = Tables(spark, dir, "lineitem")
    val cols = Seq("l_quantity", "l_returnflag")
    val whole = Profiling.report(Profiling.moments(li, cols))
    val merged = Profiling.report(Profiling.mergeMoments(
      Profiling.moments(li.filter(col("l_orderkey") % 2 === 0), cols),
      Profiling.moments(li.filter(col("l_orderkey") % 2 === 1), cols)))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("checksum: order- and partitioning-insensitive") {
    val repr = concat_ws("|", col("event_id"), col("user_id"))
    val a = Profiling.checksumHashCode(ev, repr).head()
    val b = Profiling.checksumHashCode(ev.repartition(13).sortWithinPartitions("user_id"), repr).head()
    assert(a === b)
  }
}
