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

  /** MERGEABLE form of the profile — raw moments instead of finished
    * statistics (sum² in place of stddev): two moment frames over
    * disjoint row sets union+merge to the moments of the union, which
    * is what lets a streaming maintainer keep a constant-size profile
    * state per column (the mergeable-summaries discipline). Finish
    * with [[report]].
    */
  def moments(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perCol: Seq[Column] = cols.map { c =>
      df.schema(c).dataType match {
        case _: NumericType => struct(
          lit(c).as("col_name"), lit("numeric").as("kind"),
          count(col(c)).as("n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("nulls"),
          min(col(c)).cast("double").as("min_v"),
          max(col(c)).cast("double").as("max_v"),
          sum(col(c).cast("double")).as("sum_v"),
          sum(col(c).cast("double") * col(c).cast("double")).as("sum2"),
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
          lit(null).cast("double").as("sum2"),
          min(length(col(c))).cast("long").as("min_len"),
          max(length(col(c))).cast("long").as("max_len"),
          sum(when(col(c) === "", 1L).otherwise(0L)).as("empties"))
        case other => throw new IllegalArgumentException(
          s"moments($c): unsupported type $other — project to numeric/string first")
      }
    }
    df.aggNamed(perCol)
      .select(explode(array(cols.indices.map(i => col(s"__s$i")): _*)).as("s"))
      .select("s.*")
  }

  /** Merge moment frames over disjoint row sets (sums add, bounds
    * min/max) — the combine step of the reference's summary
    * aggregators.
    */
  def mergeMoments(frames: DataFrame*): DataFrame =
    frames.reduce(_ unionByName _)
      .groupBy("col_name", "kind")
      .agg(sum("n").as("n"), sum("nulls").as("nulls"),
        min("min_v").as("min_v"), max("max_v").as("max_v"),
        sum("sum_v").as("sum_v"), sum("sum2").as("sum2"),
        min("min_len").as("min_len"), max("max_len").as("max_len"),
        sum("empties").as("empties"))

  /** Finish moments into the [[summarize]] report schema. */
  def report(m: DataFrame): DataFrame =
    m.select(col("col_name"), col("kind"), col("n"), col("nulls"),
      col("min_v"), col("max_v"),
      round(col("sum_v"), 4).as("sum_v"),
      round(col("sum_v") / col("n"), 6).as("mean"),
      when(col("n") > 1, round(sqrt(
        (col("sum2") - col("sum_v") * col("sum_v") / col("n")) / (col("n") - 1)), 4))
        .otherwise(lit(null).cast("double")).as("std"),
      col("min_len"), col("max_len"), col("empties"))

  // agg() names positional outputs; alias them predictably
  implicit private class AggNames(df: DataFrame) {
    def aggNamed(cs: Seq[Column]): DataFrame =
      df.agg(cs.head.as("__s0"), cs.tail.zipWithIndex.map {
        case (c, i) => c.as(s"__s${i + 1}")
      }: _*)
  }

  /** ref Utils.ChecksumHashCode — (count, checksum) where checksum is
    * the sum of per-row portable hashes: 32 bits each, summed exactly
    * in DECIMAL(38,0), then reduced mod 2^62 ONCE at emission so the
    * emitted column is a plain BIGINT (order-insensitive: the mod of
    * an exact sum is independent of partitioning). `rowRepr` must
    * canonicalize the row (e.g. concat_ws over a stable column order).
    */
  def checksumHashCode(df: DataFrame, rowRepr: Column): DataFrame =
    df.select(
        graft.functions.GraftFunctions.md5_prefix(rowRepr, 8).as("h"))
      .agg(count(lit(1)).as("cnt"),
        (sum(col("h").cast("decimal(38,0)")) % lit(4611686018427387904L))
          .cast("long").as("checksum"))
}
