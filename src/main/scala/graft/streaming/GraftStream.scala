package graft.streaming

import graft.cep.{CEP, Pattern, PatternMatch}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** DataStream-like fluent facade (ref: DataStream.java:128 API surface —
  * map/flatMap/filter/union/keyBy/window/process) over batch or
  * streaming Datasets. Thin by design: every call lowers to the
  * declarative Dataset API so Catalyst/Structured Streaming stay in
  * charge of planning; the stateful gaps route to StreamingOps / CEP.
  */
final class GraftStream[T](val ds: Dataset[T]) {
  def map[U: Encoder](f: T => U): GraftStream[U] = new GraftStream(ds.map(f))
  def flatMap[U: Encoder](f: T => IterableOnce[U]): GraftStream[U] =
    new GraftStream(ds.flatMap(f))
  def filter(f: T => Boolean): GraftStream[T] = new GraftStream(ds.filter(f))
  def union(other: GraftStream[T]): GraftStream[T] = new GraftStream(ds.union(other.ds))

  /** ref: DataStream.assignTimestampsAndWatermarks — bounded-out-of-
    * orderness maps to withWatermark.
    */
  def assignTimestampsAndWatermarks(tsCol: String, delay: String): GraftStream[T] =
    new GraftStream(ds.withWatermark(tsCol, delay))

  def keyBy[K: Encoder](f: T => K): KeyedGraftStream[K, T] =
    new KeyedGraftStream(this, f)

  def toDF: DataFrame = ds.toDF()
}

final class KeyedGraftStream[K, T](stream: GraftStream[T], keyFn: T => K)(implicit ke: Encoder[K]) {

  /** ref: KeyedStream.reduce — running per-key reduction (batch form;
    * update-mode running emission in streaming is reduceGroups per
    * micro-batch).
    */
  def reduce(f: (T, T) => T)(implicit te: Encoder[T]): Dataset[(K, T)] =
    stream.ds.groupByKey(keyFn).reduceGroups(f)

  /** ref: KeyedStream.process(KeyedProcessFunction). */
  def process[S: Encoder, O: Encoder](
      tsUsFn: T => Long,
      proc: StreamingOps.KeyedProcess[K, T, S, O])(implicit te: Encoder[T]): Dataset[O] =
    StreamingOps.process(stream.ds, keyFn, tsUsFn, proc)

  /** ref: CEP.pattern(keyedStream, pattern) — batch variant. */
  def matchPattern[O: Encoder](tsUsFn: T => Long, pattern: Pattern[T])(
      emit: (K, PatternMatch[T]) => O): Dataset[O] =
    CEP.batch(stream.ds, keyFn, tsUsFn, pattern, emit)
}

object GraftStream {
  def apply[T](ds: Dataset[T]): GraftStream[T] = new GraftStream(ds)

  /** Early-fire emit strategy for streaming window aggregates (ref: the
    * planner's WindowEmitStrategy + the early-fire emit options — emit
    * partial window results every `interval` BEFORE the watermark
    * closes the window). Spark mapping: Update output mode (each
    * micro-batch upserts the windows it changed) paced by a
    * processing-time trigger — batch cadence IS the early-fire delay.
    * Downstream consumes the result as an upsert stream keyed by the
    * window (same contract as the reference's early-fire changelog).
    *
    * Late fire — emitting ANOTHER update after the watermark has closed
    * a window — is NOT expressible: Structured Streaming evicts window
    * state at the watermark, and by design there is nothing left to
    * re-aggregate a late row into (the allowed-lateness surface in
    * LateData.scala routes those rows to a side output instead). This
    * is the documented gap in COVERAGE.md §2.6.
    */
  def earlyFire(windowAgg: DataFrame, interval: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    windowAgg.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(interval))

  /** Tumbling/sliding/session window aggregation helpers (ref:
    * WindowedStream.java — the window()/aggregate() pairing). DataFrame
    * level because window assignment is a Column expression.
    */
  def tumble(df: DataFrame, tsCol: String, size: String): org.apache.spark.sql.RelationalGroupedDataset =
    df.groupBy(window(col(tsCol), size))
  def slide(df: DataFrame, tsCol: String, size: String, slide: String): org.apache.spark.sql.RelationalGroupedDataset =
    df.groupBy(window(col(tsCol), size, slide))
  def session(df: DataFrame, tsCol: String, gap: String): org.apache.spark.sql.RelationalGroupedDataset =
    df.groupBy(session_window(col(tsCol), gap))
}
