package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Dataset profiling (ref: DataSetUtils.java:311 summarize +
  * the flink-java summarize package — NumericColumnSummary / StringColumnSummary
  * computed by a per-partition aggregate + combine; and
  * DataSetUtils.java:347 checksumHashCode — count + order-insensitive
  * content checksum).
  *
  * summarize is ONE map-side-combined aggregate over the input — every
  * statistic here (counts, nulls, min/max, sums, means, lengths,
  * empties, stddev) combines associatively, so the reference's
  * aggregate-then-reduce design maps to a single Spark hash aggregate
  * producing ONE row, exploded to a per-column long-form report. No
  * second scan, no per-column jobs: at 100 TB the profile costs one
  * pass.
  *
  * checksumHashCode replaces Java's hashCode (JVM-specific) with a
  * portable md5-derived 32-bit row hash summed in DECIMAL(38,0) —
  * overflow-free at any row count, reproducible by any engine that has
  * md5, and order-insensitive like the reference's accumulator.
  */
object Profiling {

  /** Long-form per-column summary: numeric columns report
    * min/max/sum/mean/stddev, string columns report length stats and
    * empty counts; both report non-null and null counts. Floats are
    * rounded (sum 4, mean 6, stddev 4) to pin cross-engine compare.
    */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perCol: Seq[Column] = cols.map { c =>
      df.schema(c).dataType match {
        case _: NumericType => struct(
          lit(c).as("col_name"), lit("numeric").as("kind"),
          count(col(c)).as("n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("nulls"),
          min(col(c)).cast("double").as("min_v"),
          max(col(c)).cast("double").as("max_v"),
          round(sum(col(c).cast("double")), 4).as("sum_v"),
          round(avg(col(c).cast("double")), 6).as("mean"),
          round(stddev_samp(col(c).cast("double")), 4).as("std"),
          lit(null).cast("long").as("min_len"),
          lit(null).cast("long").as("max_len"),
          lit(null).cast("long").as("empties"))
        case StringType => struct(
          lit(c).as("col_name"), lit("string").as("kind"),
          count(col(c)).as("n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("nulls"),
          lit(null).cast("double").as("min_v"),
          lit(null).cast("double").as("max_v"),
          lit(null).cast("double").as("sum_v"),
          lit(null).cast("double").as("mean"),
          lit(null).cast("double").as("std"),
          min(length(col(c))).cast("long").as("min_len"),
          max(length(col(c))).cast("long").as("max_len"),
          sum(when(col(c) === "", 1L).otherwise(0L)).as("empties"))
        case other => throw new IllegalArgumentException(
          s"summarize($c): unsupported type $other — project to numeric/string first")
      }
    }
    df.aggNamed(perCol)
      .select(explode(array(cols.indices.map(i => col(s"__s$i")): _*)).as("s"))
      .select("s.*")
  }

  // agg() names positional outputs; alias them predictably
  implicit private class AggNames(df: DataFrame) {
    def aggNamed(cs: Seq[Column]): DataFrame =
      df.agg(cs.head.as("__s0"), cs.tail.zipWithIndex.map {
        case (c, i) => c.as(s"__s${i + 1}")
      }: _*)
  }

  /** ref Utils.ChecksumHashCode — (count, checksum) where checksum is
    * the sum of per-row portable hashes: 32 bits each, summed exactly
    * in DECIMAL(38,0). `rowRepr` must canonicalize the row (e.g.
    * concat_ws over a stable column order).
    */
  def checksumHashCode(df: DataFrame, rowRepr: Column): DataFrame =
    df.select(
        conv(substring(md5(rowRepr), 1, 8), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("h").cast("decimal(38,0)")).as("checksum"))
}
