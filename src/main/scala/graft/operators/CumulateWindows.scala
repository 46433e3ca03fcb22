package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUMULATE windows (ref: the windowing TVF family in the reference's
  * table planner — CumulativeWindowSpec / StreamExecWindowAggregate
  * slicing): expanding windows that share a start aligned to `maxK·step`
  * and grow by `step` until flushing at the full size. E.g. step 15 min,
  * maxK 4 → [H,H:15), [H,H:30), [H,H:45), [H,H+1:00) per hour H.
  *
  * Two shapes, matching the reference's own execution strategy:
  *  - [[assign]] — batch: each row explodes to the `maxK − k0` windows
  *    that contain it (k0 = its pane index); one shuffle to the grouped
  *    aggregate. Row growth is bounded by maxK (a constant), not data.
  *  - [[assemblePanes]] — streaming: the stream aggregates step-sized
  *    PANES (a plain watermark-legal tumbling-window agg), and the panes
  *    are assembled into cumulate windows statelessly downstream. This
  *    is the slicing optimization the reference applies to cumulate
  *    aggregations: each input row is touched once, state is one pane
  *    per key, and the late assembly is a constant-factor expansion of
  *    the (tiny) pane aggregates, not of the input.
  */
object CumulateWindows {

  /** Batch assignment: adds `wstart`/`wend` (exploded) to each row. */
  def assign(df: DataFrame, tsCol: String, stepSec: Long, maxK: Int): DataFrame = {
    val stepUs = stepSec * 1000000L
    df.withColumn("wstart", timestamp_micros(
        expr(s"(unix_micros($tsCol) div ${stepUs * maxK}) * ${stepUs * maxK}")))
      .withColumn("__k0", floor((unix_micros(col(tsCol)) - unix_micros(col("wstart"))) / stepUs))
      .withColumn("__k", explode(sequence(col("__k0") + 1, lit(maxK.toLong))))
      .withColumn("wend", timestamp_micros(unix_micros(col("wstart")) + col("__k") * stepUs))
      .drop("__k0", "__k")
  }

  /** Streaming assembly: `panes` carries one row per step-sized pane
    * (columns `pstart` + pre-aggregated measures); each pane explodes to
    * the cumulate windows it feeds. Aggregate the result by
    * (wstart, wend) with SUM-mergeable measures.
    */
  def assemblePanes(panes: DataFrame, pstartCol: String, stepSec: Long, maxK: Int): DataFrame = {
    val stepUs = stepSec * 1000000L
    panes.withColumn("wstart", timestamp_micros(
        expr(s"(unix_micros($pstartCol) div ${stepUs * maxK}) * ${stepUs * maxK}")))
      .withColumn("__i", floor((unix_micros(col(pstartCol)) - unix_micros(col("wstart"))) / stepUs))
      .withColumn("__k", explode(sequence(col("__i") + 1, lit(maxK.toLong))))
      .withColumn("wend", timestamp_micros(unix_micros(col("wstart")) + col("__k") * stepUs))
      .drop("__i", "__k")
  }
}
