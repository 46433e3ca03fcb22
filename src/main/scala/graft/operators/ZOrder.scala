package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write clustering for multi-dimensional data
  * skipping: sort the data along the interleaved-bit curve of two
  * bucketized dimensions before writing, and every file / parquet
  * row group ends up with a NARROW min–max range in BOTH dimensions —
  * so an engine evaluating a 2-D box predicate prunes most files from
  * their footer stats alone, where a single-column sort only prunes on
  * its leading column. (The reference's batch sinks offer single-key
  * `sortPartition` grouping, `DataSet.sortPartition`/
  * `flink-java/.../SortPartitionOperator.java:45`; the curve layout is
  * the standard lakehouse upgrade of that idea, public in the Hudi /
  * Delta / Iceberg literature.)
  *
  * Everything is Column arithmetic (codegen'd, no UDF): the classic
  * mask-ladder bit spread, 16 bits per dimension → a 32-bit z-value.
  * At 100 TB the layout pass is one range exchange on the z-value (the
  * same cost as any global sort-write) paid once at ingest, and every
  * box query after it reads only the curve segments that intersect the
  * box.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (0, 2, 4, …)
    * — the textbook Morton mask ladder.
    */
  private[operators] def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit bucket ids: a in even bits, b in
    * odd bits.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Equi-width bucketization of `c` into [0, buckets) over a KNOWN
    * value range — the z-curve needs bounded integer coordinates; out
    * of range clamps to the edge buckets (stats stay correct, skipping
    * just degrades for outliers).
    */
  def bucketize(c: Column, min: Double, max: Double, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 65536 && max > min, s"bad bucket spec")
    least(lit(buckets - 1), greatest(lit(0),
      floor((c.cast("double") - lit(min)) / lit((max - min) / buckets)).cast("long")))
  }

  /** Write `df` z-order-clustered on two bucketized dimensions into
    * `numFiles` range-partitioned files, each internally sorted along
    * the curve; the helper column is dropped — skipping reads the
    * ORIGINAL columns' footer stats.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int): Unit =
    df.withColumn("__z", zValue(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
