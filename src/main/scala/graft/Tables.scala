package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md).
  *
  * All tables are plain parquet reads — filters/projections placed on top
  * by callers reach the scan via Catalyst pushdown, so no caching or
  * materialization happens here.
  *
  * The one normalization: `events.ts` is written as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (long nanos) and convert to
  * a microsecond TimestampType with integer division — `div 1000`, not
  * `/1000.0`, because epoch-nanos (~1.7e18) exceed the 2^53 exact-integer
  * range of doubles and a float division would corrupt low microseconds.
  * DuckDB oracles must mirror this with `ts::TIMESTAMP` (ns → µs
  * truncation, same floor behavior).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) file read as long nanos — floor-divide to µs.
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // TIMESTAMP(MICROS) file (isAdjustedToUTC=false reads as NTZ) —
      // reinterpret as a UTC instant (session TZ is pinned to UTC, so
      // the cast is value-preserving) to keep downstream arithmetic on
      // one type.
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Oracle-side CTE mirroring the events ns→µs truncation. Prepend to any
    * DuckDB oracle that touches `events`.
    */
  val eventsCte: String =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"
}
