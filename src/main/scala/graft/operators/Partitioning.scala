package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Physical-distribution facades (ref: DataStream.shuffle:353,
  * rebalance:377, rescale:407, global:421, partitionCustom:338 —
  * DataStream.java; DataSet.partitionByHash:1379, partitionByRange:1429,
  * sortPartition:1479 — DataSet.java).
  *
  * Everything that CAN stay declarative does — `repartition`/`coalesce`/
  * `repartitionByRange`/`sortWithinPartitions` keep Catalyst in charge
  * (AQE may still coalesce post-shuffle partitions). Only
  * `partitionCustom`, whose contract is an arbitrary user routing
  * function, drops to the RDD `Partitioner` API — and there it uses
  * `repartitionAndSortWithinPartitions`, the shuffle-with-sort operator
  * that spills instead of buffering, so the per-partition order arrives
  * "for free" with the exchange (the same fusion the reference does in
  * its sort-partition operator).
  */
object Partitioning {

  /** round-robin/random uniform redistribution (ref: shuffle, rebalance) */
  def rebalance[T](ds: Dataset[T], n: Int): Dataset[T] = ds.repartition(n)

  /** local fan-in, no shuffle (ref: rescale — neighbor-local rebalance) */
  def rescale[T](ds: Dataset[T], n: Int): Dataset[T] = ds.coalesce(n)

  /** everything into one task (ref: global) */
  def global[T](ds: Dataset[T]): Dataset[T] = ds.coalesce(1)

  /** hash-distribute on key columns (ref: DataSet.partitionByHash) */
  def byHash(df: DataFrame, n: Int, cols: String*): DataFrame =
    df.repartition(n, cols.map(col): _*)

  /** range-distribute on sampled boundaries (ref: DataSet.partitionByRange) */
  def byRange(df: DataFrame, n: Int, cols: String*): DataFrame =
    df.repartitionByRange(n, cols.map(col): _*)

  /** per-partition sort with no global exchange (ref: DataSet.sortPartition;
    * also the batch form of the planner's temporal-sort node)
    */
  def sortPartition(df: DataFrame, cols: String*): DataFrame =
    df.sortWithinPartitions(cols.map(col): _*)

  /** explicit user routing (ref: partitionCustom(Partitioner, keySelector)) */
  def custom[K: ClassTag, V: ClassTag](rdd: RDD[(K, V)], p: Partitioner): RDD[(K, V)] =
    rdd.partitionBy(p)

  /** partitionCustom fused with sortPartition: one shuffle whose merge
    * phase emits each partition ordered by the full key (ref: the
    * sortPartition-after-partitionByHash plan; Spark's
    * repartitionAndSortWithinPartitions is sort-spill-safe at scale).
    */
  def customSorted[K: Ordering: ClassTag, V: ClassTag](rdd: RDD[(K, V)], p: Partitioner): RDD[(K, V)] =
    rdd.repartitionAndSortWithinPartitions(p)

  /** Routes a (Long, ...) tuple key by `key % n` — the "explicit modulo"
    * partitioner every partitionCustom example starts from.
    */
  final class ModPartitioner(n: Int, key: Any => Long) extends Partitioner {
    override def numPartitions: Int = n
    override def getPartition(k: Any): Int = (((key(k) % n) + n) % n).toInt
  }
}
