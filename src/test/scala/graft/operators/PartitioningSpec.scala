package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distribution facades (ref: DataStream.shuffle/rebalance/rescale/global,
  * DataSet.partitionByHash/ByRange/sortPartition): partition counts, data
  * preservation, and within-partition order.
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")

  test("rebalance redistributes to n partitions, keeps all rows") {
    val out = Partitioning.rebalance(df, 7)
    assert(out.rdd.getNumPartitions == 7)
    assert(out.count() == 100)
  }

  test("rescale coalesces without shuffle; global lands on one partition") {
    val wide = Partitioning.rebalance(df, 8)
    assert(Partitioning.rescale(wide, 2).rdd.getNumPartitions == 2)
    val g = Partitioning.global(wide)
    assert(g.rdd.getNumPartitions == 1)
    assert(g.count() == 100)
  }

  test("byHash co-locates equal keys in one partition") {
    val out = Partitioning.byHash(df.withColumn("g", col("k") % 5), 4, "g")
    val perKey = out.select(spark_partition_id().as("pid"), col("g"))
      .distinct().groupBy("g").count().collect()
    assert(perKey.forall(_.getLong(1) == 1L)) // each g in exactly one pid
  }

  test("byRange produces non-overlapping key ranges per partition") {
    val out = Partitioning.byRange(df, 4, "k")
    val ranges = out.select(spark_partition_id().as("pid"), col("k"))
      .groupBy("pid").agg(min("k").as("mn"), max("k").as("mx"))
      .orderBy("mn").collect()
    val sorted = ranges.sliding(2).forall {
      case Array(a, b) => a.getLong(2) < b.getLong(1)
      case _           => true
    }
    assert(sorted, s"overlapping ranges: ${ranges.mkString(",")}")
  }

  test("sortPartition orders rows inside each partition only") {
    val out = Partitioning.sortPartition(Partitioning.byHash(df, 3, "k"), "k")
    val ok = out.select(spark_partition_id(), col("k")).as[(Int, Long)]
      .mapPartitions { it =>
        val ks = it.map(_._2).toSeq
        Iterator.single(ks == ks.sorted)
      }.collect()
    assert(ok.forall(identity))
  }

  test("customSorted routes by explicit partitioner and sorts by full key") {
    val rdd = df.as[(Long, String)].rdd.map { case (k, v) => ((k, v), ()) }
    val parted = Partitioning.customSorted(rdd,
      new Partitioning.ModPartitioner(4, _.asInstanceOf[(Long, String)]._1))
    val check = parted.mapPartitionsWithIndex { (pid, it) =>
      val keys = it.map(_._1).toSeq
      Iterator.single(
        keys.forall(k => (k._1 % 4).toInt == pid) && keys == keys.sortBy(k => (k._1, k._2)))
    }.collect()
    assert(check.forall(identity))
  }
}
