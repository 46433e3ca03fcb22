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

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al. 2014, "Connected Components in
    * MapReduce and Beyond") — the general-graph engine for shapes
    * [[minLabel]] is wrong for. Plain neighborhood-min contraction is
    * the right tool for dedup graphs (near-cliques collapse in one or
    * two rounds) but on PATH-shaped graphs the min label travels only a
    * couple of hops per round, so a chain of length L needs Θ(L) rounds
    * and [[minLabel]]'s fail-fast fires. The star steps instead
    * re-point whole neighborhoods at their minimum each round:
    *
    *  - large-star: for every node u, each strictly-larger neighbor is
    *    connected to min(Γ(u) ∪ u);
    *  - small-star: for every node u, each not-larger neighbor and u
    *    itself are connected to min(Γ⁻(u) ∪ u);
    *
    * which provably converges in O(log² n) rounds (O(log n) observed)
    * to a star forest rooted at each component's minimum — on ANY
    * shape, skewed or path-like. Each step is one node-keyed
    * aggregation plus one equi-join; nothing quadratic, no driver
    * state beyond the per-round fixed-point signature (count +
    * order-independent hash), and the per-round edge list is
    * checkpointed so the loop's lineage stays flat.
    *
    * Same contract as [[minLabel]]: `edges` are undirected pairs
    * (da, db), `nodes` the full (id) universe; returns (id, lbl) with
    * lbl the component minimum.
    */
  def minLabelStar(edges: DataFrame, nodes: DataFrame, maxIter: Int = 40): DataFrame = {
    val f = starForest(edges, maxIter)
    // fixed point is a star forest (child, root): roots and isolated
    // nodes label themselves
    nodes.select(col("id"))
      .join(f.select(col("da").as("id"), col("db").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("lbl"))
  }

  /** The star-contraction fixed point itself: (da, db) = (child, root)
    * pairs with db the component minimum among edge-covered nodes.
    * Exposed separately because the forest is the natural INCREMENTAL
    * state: CC(forest ∪ new-edges) = CC(all edges so far) — the forest
    * preserves connectivity in |nodes| rows — so a streaming maintainer
    * stores the forest, unions each arriving edge batch, and
    * re-contracts (cheap: the forest is depth-1 already).
    */
  def starForest(edges: DataFrame, maxIter: Int = 40): DataFrame = {
    // canonicalize u > v once: self-loops dropped, parallel edges merged
    // LAZY local checkpoints (r13 opt): every round's edge list is
    // immediately consumed by the full-scan signature aggregate, which
    // materializes the checkpoint blocks inside that same job — an
    // eager checkpoint paid a second, redundant pass per round (the
    // round loop is pure job-count floor on small rounds; see
    // COVERAGE r12's 2-jobs/round profile).
    var e = edges
      .filter(col("da") =!= col("db"))
      .select(greatest(col("da"), col("db")).as("u"), least(col("da"), col("db")).as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    // order-independent, overflow-free fixed-point signature: XOR of the
    // per-edge hashes (the edge list is distinct, so no self-cancel)
    def signature(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = signature(e)
    var stable = prev._1 == 0L
    var i = 0
    while (i < maxIter && !stable) {
      val bi = e.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("x"))
        .select(col("x.u").as("u"), col("x.v").as("v"))
      val lm = bi.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // large-star output is canonical by construction: v > u >= m.
      // NOT deduplicated here: emissions are one per oriented edge
      // (O(E) rows), the small-star aggregation consumes them with
      // map-side combine, and the round's single distinct happens once
      // on the small-star output — one exchange per round, not two
      val ls = bi.join(lm, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val sm = ls.groupBy("u").agg(min("v").as("mv"))
      val ss = ls.join(sm, "u").filter(col("v") =!= col("mv"))
        .select(col("v").as("u"), col("mv").as("v"))
        .unionByName(sm.select(col("u"), col("mv").as("v")))
        .distinct()
        .localCheckpoint(eager = false) // materialized by signature(ss) below
      val cur = signature(ss)
      stable = cur == prev || cur._1 == 0L
      prev = cur
      e = ss
      i += 1
    }
    require(stable,
      s"starForest: no fixed point after $maxIter rounds — raise maxIter " +
        "(expected O(log n) rounds; this indicates a pathological input)")
    e.select(col("u").as("da"), col("v").as("db"))
  }

  /** Fold a batch of NEW edges into an existing star forest without
    * re-contracting history — the incremental-maintenance step whose
    * cost tracks the DELTA, not the accumulated graph. New edge
    * endpoints first RELABEL through the forest (old child → its root,
    * unknown node → itself; one left join per side), so the contraction
    * runs entirely in root space over |new edges| rows; the resulting
    * root mapping then rewrites the old forest's root column with one
    * more join. Old children never re-enter a contraction, so a 100×
    * history costs the same per batch as an empty one.
    *
    * Input/output: (da = child, db = root) canonical star-forest rows,
    * plus (da, db) new undirected edge pairs.
    */
  def incrementalForest(forest: DataFrame, newEdges: DataFrame,
      maxIter: Int = 40): DataFrame = {
    val f = forest.select(col("da").as("child"), col("db").as("root"))
    val relabeled = newEdges
      .join(f.select(col("child").as("da"), col("root").as("ra")), Seq("da"), "left")
      .join(f.select(col("child").as("db"), col("root").as("rb")), Seq("db"), "left")
      .select(coalesce(col("ra"), col("da")).as("da"),
        coalesce(col("rb"), col("db")).as("db"))
    // contraction over root-space edges only: nodes are old roots and
    // genuinely new ids — old children cannot appear (they were
    // relabeled away), so the union below is disjoint by construction
    val rf = starForest(relabeled, maxIter)
    val remapped = f
      .join(rf.select(col("da").as("root"), col("db").as("newRoot")), Seq("root"), "left")
      .select(col("child").as("da"), coalesce(col("newRoot"), col("root")).as("db"))
    remapped.unionByName(rf)
  }
}
