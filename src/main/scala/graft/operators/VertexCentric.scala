package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic scatter-gather (signal/collect) iteration — the reference's
  * Gelly RUNTIME surface (`ScatterGatherIteration.java:66`,
  * `Graph.runScatterGatherIteration`), previously a SURVEY non-goal with
  * only the LIBRARY algorithms covered. The engine is three expression
  * hooks around a fixed per-round dataflow:
  *
  *  - SCATTER: every edge joins its source's current value and emits
  *    `msgExpr` (over `value` + the edge's own columns) to its `dst`;
  *  - GATHER: messages aggregate per target with `aggMsg` (any
  *    aggregate — `min`, `sum`, or `collect_list` for a fold-style
  *    gather over the full message list);
  *  - APPLY: `updateExpr(oldValue, gathered)` produces the new value;
  *    `gathered` is null when a vertex received no messages this round
  *    (the reference skips the update there — express that with a
  *    null-check in the hook).
  *
  * Each round is exactly one node-keyed join + one partial-aggregated
  * exchange + one left-join update — the same wire cost as the
  * hand-written library algorithms ([[Graph.sssp]],
  * [[Graph.labelPropagation]]), because this IS their common shape
  * extracted. Rounds stage so the loop's lineage stays linear
  * ([[Iterations]] discipline). Vertex state is node-linear; the edge
  * frame is read once per round and should be staged by the caller
  * when it is itself derived.
  *
  * Directed semantics: messages flow src → dst; mirror the edge table
  * first for undirected graphs (as the library algorithms do).
  */
object VertexCentric {

  def scatterGather(
      edges: DataFrame, // (src, dst, ...payload columns visible to msgExpr)
      vertices: DataFrame, // (node, value)
      msgExpr: Column, // over value + edge columns → message for dst
      aggMsg: Column => Column, // aggregate over col("msg")
      updateExpr: (Column, Column) => Column, // (oldValue, gathered|null) → newValue
      rounds: Int
  ): DataFrame = {
    var v = vertices.select(col("node"), col("value"))
    for (_ <- 1 to rounds) {
      val msgs = edges
        .join(v.select(col("node").as("src"), col("value")), "src")
        .select(col("dst").as("node"), msgExpr.as("msg"))
        .groupBy("node").agg(aggMsg(col("msg")).as("g"))
      v = Funnel.stageLazy(v.join(msgs, Seq("node"), "left")
        .select(col("node"), updateExpr(col("value"), col("g")).as("value")))
    }
    v
  }

  /** [[Graph.sssp]] re-expressed on the generic engine — the Gelly
    * quickstart's own demo pairing (`SingleSourceShortestPaths` IS a
    * scatter-gather program in the reference). Unreached vertices carry
    * a null value and emit null messages, which `min` ignores; the
    * apply step is a null-safe least. Produces exactly
    * [[Graph.sssp]]'s (node, d) rows for reached nodes.
    */
  def ssspOnEngine(edges: DataFrame, source: DataFrame, rounds: Int): DataFrame = {
    val und = Funnel.stageLazy(edges.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst"), col("w")),
        struct(col("b").as("src"), col("a").as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w")))
    val nodes = und.select(col("src").as("node")).distinct()
    val init = nodes
      .join(source.select(col("node"), col("d")), Seq("node"), "left")
      .select(col("node"), col("d").cast("double").as("value"))
    scatterGather(und, init,
      msgExpr = col("value") + col("w"),
      aggMsg = min,
      updateExpr = (old, g) =>
        when(g.isNull, old).when(old.isNull, g).otherwise(least(old, g)),
      rounds = rounds)
      .filter(col("value").isNotNull)
      .select(col("node"), col("value").as("d"))
  }
}
