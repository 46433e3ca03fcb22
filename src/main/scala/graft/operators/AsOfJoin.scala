package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / as-of join (ref: StreamExecTemporalJoin.scala:51,
  * TemporalRowTimeJoinOperator.java — `FOR SYSTEM_TIME AS OF` semantics):
  * for each left row, attach the payload of the LATEST right row with
  * `right.ts <= left.ts` for the same key.
  *
  * Spark-first plan: instead of a per-row range probe (quadratic) or a
  * range join (explodes then filters), we UNION the tagged sides, shuffle
  * ONCE on the key, sort each partition by (ts, side), and carry the
  * right payload forward with `last(_, ignoreNulls) OVER (ROWS UNBOUNDED
  * PRECEDING)`. At 100 TB this is one exchange + one sort — the same cost
  * as a single sort-merge join — with O(1) running state per payload
  * column and no build-side explosion; skew maps to ordinary sort-agg
  * skew which AQE handles.
  */
object AsOfJoin {

  /** @param left     probe side
    * @param right    versioned side
    * @param keys     equi-join key columns (present on both sides)
    * @param leftTs   event-time column on `left`
    * @param rightTs  event-time column on `right`
    * @param payload  right-side columns to attach (must not collide with
    *                 left column names; alias beforehand)
    * @param tieBreak optional right-side column ordering concurrent
    *                 right versions (latest wins deterministically)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Option[String] = None
  ): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side"
    val tie = "__asof_tie"
    val pack = "__asof_pack"

    val tieCol = tieBreak.map(col).getOrElse(lit(0L))
    // Right rows sort BEFORE left rows at an equal timestamp so the
    // inclusive bound (right.ts <= left.ts) holds. The payload travels
    // as ONE non-null struct per right row (not bare columns): a right
    // version whose payload VALUE is NULL must still win over older
    // versions — last(_, ignoreNulls) over bare columns would skip it.
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as(ts), lit(0).as(side), tieCol.cast("long").as(tie),
        struct(payload.map(col): _*).as(pack)): _*)
    val l = left.withColumn(ts, col(leftTs)).withColumn(side, lit(1)).withColumn(tie, lit(0L))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).asc, col(side).asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPayload = unioned.withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
    payload.foldLeft(withPayload)((df, p) => df.withColumn(p, col(s"$pack.$p")))
      .filter(col(side) === 1)
      .drop(ts, side, tie, pack)
  }
}
