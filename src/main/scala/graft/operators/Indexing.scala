package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Index assignment over distributed data (ref: DataSetUtils.java:89
  * zipWithIndex, :149 zipWithUniqueId, :69 countElementsPerPartition —
  * the flink-java utility surface).
  *
  * zipWithIndex is the reference's exact two-pass design re-expressed
  * on Spark: count elements per partition (pass 1), broadcast the
  * per-partition offsets, then number each partition from its offset
  * (pass 2) — `RDD.zipWithIndex` IS that algorithm, so the operator
  * composes range partitioning (for a deterministic total order) with
  * it. No global window, no single-partition funnel: the only
  * exchange is the range partitioner, and the count pass is a cheap
  * metadata job. At 100 TB the index assignment stays embarrassingly
  * parallel.
  *
  * zipWithUniqueId is the reference's shifted-bits formula
  * (id = localCounter << ceil(log2(P)) | partitionId): unique without
  * ANY extra pass or exchange — the ids are not contiguous, which is
  * the documented trade.
  */
object Indexing {

  /** Contiguous ids 0..n−1 in the total order of `order` columns.
    * `buckets` bounds the range partitioner (each bucket numbers
    * independently after the offset broadcast).
    */
  def zipWithIndex(df: DataFrame, order: Seq[Column], idCol: String,
      buckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val arranged = df.repartitionByRange(buckets, order: _*)
      .sortWithinPartitions(order: _*)
    val indexed = arranged.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(indexed,
      StructType(arranged.schema.fields :+ StructField(idCol, LongType, nullable = false)))
  }

  /** Unique (non-contiguous) ids with zero extra passes: the
    * reference's `(counter << bitsize(P−1)) + taskId` label, applied
    * per partition. Fails fast on Long overflow exactly like the
    * reference ("Exceeded Long value range").
    */
  def zipWithUniqueId(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = df.rdd.getNumPartitions
    val shifter = 64 - java.lang.Long.numberOfLeadingZeros(math.max(p - 1, 0).toLong)
    val indexed = df.rdd.mapPartitionsWithIndex { case (task, rows) =>
      rows.zipWithIndex.map { case (row, i) =>
        val counterBits = 64 - java.lang.Long.numberOfLeadingZeros(i.toLong)
        require(counterBits + shifter < 63,
          "Exceeded Long value range while generating labels")
        Row.fromSeq(row.toSeq :+ ((i.toLong << shifter) + task))
      }
    }
    spark.createDataFrame(indexed,
      StructType(df.schema.fields :+ StructField(idCol, LongType, nullable = false)))
  }

  /** ref DataSetUtils.countElementsPerPartition:69 — the diagnostic
    * pass zipWithIndex builds on, exposed directly.
    */
  def countElementsPerPartition(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(spark_partition_id().as("pid"))
      .groupBy("pid").count()
      .select($"pid".cast("int"), $"count".as("n"))
  }
}
