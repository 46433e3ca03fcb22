package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over relational edge tables — the
  * library algorithms of the reference's graph API (flink-gelly:
  * `TriangleEnumerator.java`, `LabelPropagation.java`; the iteration
  * engines behind them are covered by [[Iterations]]). Here a graph is
  * just a DataFrame of undirected canonical edges `(a, b)` with
  * `a < b`, so every algorithm is joins + aggregations Catalyst can
  * plan — no vertex-centric runtime required.
  */
object Graph {

  /** Undirected co-occurrence edges from entity×block membership — the
    * classic "users who acted in the same context" graph constructor,
    * with the two levers that keep it bounded at 100 TB:
    *
    *  - `blockCap` drops blocks with more than `cap` members BEFORE
    *    pair generation (a hot block is non-discriminative anyway and
    *    its pair count is quadratic — the same df-cap discipline as
    *    [[Dedup.jaccardPairs]]' inverted index), so the pair join is
    *    an equi-join on the block key with ≤ cap² output per block,
    *    never a cartesian;
    *  - `minSupport` keeps only pairs co-occurring in ≥ that many
    *    blocks, turning incidental co-presence into an edge signal.
    *
    * Input: one row per (block..., id) membership (deduplicated
    * internally). Output: canonical edges (a, b), a < b.
    */
  def coOccurrenceEdges(members: DataFrame, blockCols: Seq[String], idCol: String,
      blockCap: Int, minSupport: Int): DataFrame = {
    val bc = blockCols.map(col)
    val m = members.select(bc :+ col(idCol).as("id"): _*).distinct()
    val kept = m.join(
      m.groupBy(bc: _*).agg(count(lit(1)).as("n")).filter(col("n") <= blockCap)
        .drop("n"),
      blockCols)
    kept.select(bc :+ col("id").as("a"): _*)
      .join(kept.select(bc :+ col("id").as("b"): _*), blockCols)
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSupport)
      .select(col("a"), col("b"))
  }

  /** Per-node triangle count + local clustering coefficient via the
    * degree-ordered (compact-forward) algorithm (ref: flink-gelly
    * `TriangleEnumerator.java:66` — the same edge-orientation-by-degree
    * idea; Suri & Vassilvitskii 2011): orient every edge from its
    * lower (degree, id) endpoint to the higher, build wedges by
    * joining oriented edges on their source, close each wedge with one
    * semi-probe of the oriented edge set. Orientation bounds wedge
    * fan-out by O(E^1.5) overall instead of Σ deg² — the "curse of the
    * last reducer" fix that makes triangle counting survive skewed
    * degree distributions at scale. Each triangle is produced exactly
    * once (its vertices appear in (deg, id) order).
    *
    * Output: (node, degree, tri_cnt, coeff) with coeff =
    * 2·tri/(deg·(deg−1)) rounded to 6, 0.0 below degree 2.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val deg = Funnel.stage(edges
      .select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg")))
    val dj = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oriented = Funnel.stage(dj.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst"), col("db").as("dd")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst"), col("da").as("dd")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.dd").as("dd")))
    val wedges = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
      .join(oriented.select(col("src"), col("dst").as("w"), col("dd").as("dw")), "src")
      .filter(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
    val tris = wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(col("src").as("n1"), col("v").as("n2"), col("w").as("n3"))
    val perNode = tris
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v").as("node"), col("deg").cast("long").as("degree"),
        coalesce(col("tri"), lit(0L)).cast("long").as("tri_cnt"))
      .withColumn("coeff", when(col("degree") < 2, lit(0.0))
        .otherwise(round((col("tri_cnt") * 2).cast("double")
          / (col("degree") * (col("degree") - 1)).cast("double"), 6)))
  }

  /** Connected components over an undirected edge table (ref:
    * flink-gelly `ConnectedComponents.java:48` — the library algorithm
    * its iterate-delta engine exists for; [[Iterations.deltaIterate]]
    * covers the engine itself). Delegates to
    * [[Components.minLabelStar]] — alternating large-star/small-star
    * contraction, O(log n) rounds on any graph shape including the
    * long-path chains where plain neighborhood-min contraction
    * degenerates to Θ(diameter) rounds. Output: (node, component) with
    * component = the minimum node id in the component.
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame, maxIter: Int = 40): DataFrame =
    Components.minLabelStar(
      edges.select(col("a").as("da"), col("b").as("db")),
      nodes, maxIter)
      .select(col("id").as("node"), col("lbl").as("component"))

  /** Synchronous label propagation (ref: flink-gelly
    * `LabelPropagation.java:47` — "takes the most frequent label among
    * neighbors", scatter-gather): labels init to the node id; each
    * round every node adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label (the deterministic
    * tie-break the reference's min-comparison update also yields).
    * Each round is one neighbor join + one (node, label) count + one
    * `max_by` argmax over `struct(cnt, -label)` — all map-side-partial
    * aggregations on node-keyed exchanges; per-round results stage so
    * the loop's lineage stays linear ([[Iterations]] discipline).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val nbrs = Funnel.stage(edges.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v")))
    var labels = nbrs.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      labels = Funnel.stage(nbrs
        .join(labels.select(col("node").as("v"), col("label")), "v")
        .groupBy("u", "label").agg(count(lit(1)).as("cnt"))
        .groupBy("u").agg(expr("max_by(label, struct(cnt, -label))").as("label"))
        .select(col("u").as("node"), col("label")))
    }
    labels
  }

  /** Fixed-round Bellman–Ford single-source shortest paths (ref:
    * flink-gelly `SingleSourceShortestPaths.java` — the Gelly
    * quickstart's scatter-gather iteration: scatter `dist + w` along
    * edges, gather `min`). `edges` carries (a, b, w) undirected;
    * `source` is a ONE-ROW (node, d=0) frame (a broadcastable
    * aggregate, never a collected scalar). Each of the `rounds`
    * synchronous relaxations is one node-keyed join + one min
    * aggregate, staged so the loop's lineage stays linear. Fixed
    * rounds rather than convergence detection, so an oracle can unroll
    * the identical recurrence; nodes not reached within `rounds` hops
    * are absent (their distance is the recurrence's, not ∞-filled).
    */
  def sssp(edges: DataFrame, source: DataFrame, rounds: Int): DataFrame = {
    val und = Funnel.stage(edges.select(explode(array(
        struct(col("a").as("u"), col("b").as("v"), col("w")),
        struct(col("b").as("u"), col("a").as("v"), col("w")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.w").as("w")))
    var dist = source.select(col("node"), col("d"))
    for (_ <- 1 to rounds) {
      dist = Funnel.stage(dist
        .unionByName(dist.select(col("node").as("u"), col("d"))
          .join(und, "u")
          .select(col("v").as("node"), (col("d") + col("w")).as("d")))
        .groupBy("node").agg(min("d").as("d")))
    }
    dist
  }
}
