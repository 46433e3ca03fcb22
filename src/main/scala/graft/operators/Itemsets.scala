package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair mining and association rules over basket-shaped data
  * (Apriori, Agrawal & Srikant 1994) — the market-basket member of the
  * event-OLAP family. [[Graph.coOccurrenceEdges]] is this operator's
  * edges-only cousin (same candidate discipline, graph output); here
  * the contract is the MEASURES: support, directional confidence, and
  * lift.
  *
  * The two levers that bound it at 100 TB, both applied BEFORE any
  * pair is materialized:
  *
  *  - item-level support pruning — the Apriori property: a pair can be
  *    frequent only if both items are, so infrequent items leave the
  *    pipeline at the first aggregation and never enter the
  *    (quadratic) pair join;
  *  - a basket-size cap — a degenerate hot basket ("everything bought
  *    by the QA bot") contributes cap² candidate pairs; over `cap` it
  *    is dropped whole, the same df-cap discipline as
  *    [[Dedup.jaccardPairs]]' inverted index.
  *
  * The pair join is an equi-join on the basket key with ≤ cap² output
  * per basket — never a cartesian — and pair support is a map-side
  * partial count on (a, b).
  */
object Itemsets {

  /** Frequent item pairs: canonical (a < b) with `pair_sup` (baskets
    * containing both) and each side's item support, all ≥ minSupport.
    * Baskets are (basketCols..., item) memberships, deduplicated
    * internally.
    */
  def frequentPairs(baskets: DataFrame, basketCols: Seq[String], itemCol: String,
      minSupport: Long, basketCap: Int): DataFrame = {
    val bc = basketCols.map(col)
    val b = baskets.select(bc :+ col(itemCol).as("item"): _*).distinct()
    val freqItems = Funnel.stageLazy(
      b.groupBy("item").agg(count(lit(1)).cast("long").as("item_sup"))
        .filter(col("item_sup") >= minSupport))
    val kept = b.join(freqItems.select("item"), "item")
    // basket cap via a basket-keyed window (high-cardinality partition,
    // never a funnel): one exchange on the basket key, which the pair
    // self-join below reuses — a groupBy+join-back here would reference
    // `kept` twice and double its lineage
    val sized = Funnel.stageLazy(kept
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(bc: _*)))
      .filter(col("bn") <= basketCap).drop("bn"))
    sized.select(bc :+ col("item").as("a"): _*)
      .join(sized.select(bc :+ col("item").as("b"): _*), basketCols)
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).cast("long").as("pair_sup"))
      .filter(col("pair_sup") >= minSupport)
      .join(freqItems.select(col("item").as("a"), col("item_sup").as("sup_a")), "a")
      .join(freqItems.select(col("item").as("b"), col("item_sup").as("sup_b")), "b")
      .select("a", "b", "pair_sup", "sup_a", "sup_b")
  }

  /** Directional association rules from the frequent pairs: each pair
    * emits both orientations with
    * `confidence = sup(a∪b) / sup(antecedent)` and
    * `lift = sup(a∪b)·N / (sup(a)·sup(b))`, N = TOTAL basket count of
    * the raw input (computed before any pruning, so lift is an honest
    * independence ratio). The N table is one row, crossed in by
    * broadcast.
    */
  def pairRules(baskets: DataFrame, basketCols: Seq[String], itemCol: String,
      minSupport: Long, basketCap: Int): DataFrame = {
    val bc = basketCols.map(col)
    val fp = frequentPairs(baskets, basketCols, itemCol, minSupport, basketCap)
    val n = baskets.select(bc: _*).distinct()
      .agg(count(lit(1)).cast("double").as("nb"))
    val directed = fp.select(
        col("a").as("antecedent"), col("b").as("consequent"),
        col("pair_sup"), col("sup_a").as("sup_ante"), col("sup_b").as("sup_cons"))
      .unionByName(fp.select(
        col("b").as("antecedent"), col("a").as("consequent"),
        col("pair_sup"), col("sup_b").as("sup_ante"), col("sup_a").as("sup_cons")))
    directed.crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("pair_sup"),
        round(col("pair_sup").cast("double") / col("sup_ante"), 6).as("confidence"),
        round(col("pair_sup").cast("double") * col("nb")
          / (col("sup_ante") * col("sup_cons")), 6).as("lift"))
  }
}
