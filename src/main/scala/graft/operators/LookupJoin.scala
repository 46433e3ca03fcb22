package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Lookup join (ref: StreamExecLookupJoin.scala:40, LookupJoinRunner
  * .java, LookupableTableSource): enrich a (possibly streaming) fact
  * side by point lookups into a dimension.
  *
  * Two strategies, mirroring the reference's sync path and the scale
  * guidance in SURVEY §2.4:
  *  - [[viaBroadcast]]: dimension snapshot broadcast to every task —
  *    the right answer when the dim fits in memory (the overwhelmingly
  *    common case; refresh per micro-batch via foreachBatch re-read).
  *  - async external lookups: use
  *    [[AsyncEnrich.mapAsyncOrdered]] with a connection created per
  *    partition (the AsyncLookupJoinRunner mapping).
  */
object LookupJoin {

  def viaBroadcast(
      facts: DataFrame,
      dim: DataFrame,
      cond: Column,
      joinType: String = "left"
  ): DataFrame =
    facts.join(broadcast(dim), cond, joinType)
}
