package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components by graph contraction — the shared
  * engine behind every "which row do I keep" dedup contract
  * ([[Dedup.minHashClusters]], [[Similarity.nearDupKeeper]]).
  *
  * Each round every node relabels to the min of itself and its
  * neighborhood, then the edge list is rewritten in label space
  * (self-loops dropped, parallel edges merged). Near-dup components are
  * dense (near-cliques), so almost everything collapses in the first
  * round and the edge list shrinks brutally — the loop runs O(log
  * component-diameter) rounds on rapidly vanishing data instead of
  * O(diameter) rounds over the full adjacency. For adversarially
  * path-shaped graphs the alternating large-star/small-star rounds of
  * Kiveris et al. (2014) bound the iteration count; dedup graphs do not
  * need them.
  *
  * ONE checkpoint job per round (the contracted edge list): the round's
  * label table is not materialized — its two references inside the
  * contraction job dedupe via exchange reuse — and the node mapping is
  * composed once after the loop by replaying the per-round label
  * aggregates over the already-checkpointed (tiny) edge lists. The
  * driver sees nothing but each round's emptiness flag.
  */
object Components {

  private def labels(edges: DataFrame): DataFrame =
    edges.groupBy("u").agg(min("v").as("mn"))
      .select(col("u").as("x"), least(col("u"), col("mn")).as("lx"))

  /** Connected-component minimum per node: `edges` are undirected pairs
    * (da, db); `nodes` is the full (id) universe — nodes absent from
    * every edge keep their own id. Returns (id, lbl) with lbl the
    * minimum id in the node's component.
    */
  def minLabel(edges: DataFrame, nodes: DataFrame, maxIter: Int = 25): DataFrame = {
    // mirror each edge in the SAME pass that materializes it (explode of
    // the two orientations): one checkpoint job over the expensive
    // upstream candidate+verify pipeline
    var e = edges.select(explode(array(
        struct(col("da").as("u"), col("db").as("v")),
        struct(col("db").as("u"), col("da").as("v")))).as("uv"))
      .select(col("uv.u").as("u"), col("uv.v").as("v"))
      .localCheckpoint()
    var rounds = List.empty[DataFrame] // checkpointed edge list per round
    var i = 0
    while (i < maxIter && !e.isEmpty) {
      rounds :+= e
      val l = labels(e)
      e = e.join(l.toDF("u", "lu"), "u").join(l.toDF("v", "lv"), "v")
        .select(col("lu").as("u"), col("lv").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      i += 1
    }
    // exhausting maxIter with edges left means the labeling below would
    // be silently PARTIAL (wrong keepers, no signal) — fail fast; the
    // final isEmpty is free when the loop already drained (cached flag)
    require(i < maxIter || e.isEmpty,
      s"minLabel: $maxIter rounds exhausted with edges remaining — " +
        "component labeling would be partial; raise maxIter (path-shaped " +
        "graphs contract ~1 node/round, not O(log d))")
    // compose the node mapping through the per-round label tables (nodes
    // absent from a round's edges keep their label) — a ~rounds-deep
    // lazy join chain folded into the caller's final join, one job total
    rounds.foldLeft(nodes.select(col("id"), col("id").as("lbl"))) { (m, er) =>
      m.join(labels(er).withColumnRenamed("x", "lbl"), Seq("lbl"), "left")
        .select(col("id"), coalesce(col("lx"), col("lbl")).as("lbl"))
    }
  }
}
