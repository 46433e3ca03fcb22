package graft.operators

import graft.SparkSpec

/** Hand-computed fixtures for [[Itemsets]]: support counts, the
  * Apriori item-pruning and basket-cap levers, and the directional
  * confidence / lift arithmetic.
  */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  // 6 baskets: {x,y} ×3, {x,y,z} ×1, {x} ×1, {z} ×1
  private def baskets = Seq(
    (1, "x"), (1, "y"),
    (2, "x"), (2, "y"),
    (3, "x"), (3, "y"),
    (4, "x"), (4, "y"), (4, "z"),
    (5, "x"),
    (6, "z")
  ).toDF("bid", "item")

  test("frequentPairs: supports and Apriori pruning") {
    // minSupport 3: items x(5), y(4) survive; z(2) is pruned, so no
    // pair containing z is ever materialized
    val fp = Itemsets.frequentPairs(baskets, Seq("bid"), "item",
        minSupport = 3L, basketCap = 10)
      .as[(String, String, Long, Long, Long)].collect()
    assert(fp.toSeq == Seq(("x", "y", 4L, 5L, 4L)))
  }

  test("frequentPairs: basket cap drops oversized baskets whole (post-pruning size)") {
    // the cap measures the basket's FREQUENT-item count — that is the
    // quantity whose square bounds the pair join. minSupport 2 keeps
    // x, y AND z, so basket 4 holds 3 kept items and cap 2 drops it
    // whole: (x,y) falls to 3 and the z-pairs (support 1) vanish,
    // while item supports (computed pre-cap) are untouched
    val fp = Itemsets.frequentPairs(baskets, Seq("bid"), "item",
        minSupport = 2L, basketCap = 2)
      .as[(String, String, Long, Long, Long)].collect()
    assert(fp.toSeq == Seq(("x", "y", 3L, 5L, 4L)))
  }

  test("frequentPairs agrees with driver brute force across seeded random baskets") {
    for (seed <- Seq(3, 7, 11)) {
      val rnd = new scala.util.Random(seed)
      val items = ('a' to 'h').map(_.toString)
      val rows = for {
        b <- 0 until 40
        it <- items if rnd.nextDouble() < 0.3
      } yield (b, it)
      val minSup = 4L
      val got = Itemsets.frequentPairs(rows.toDF("bid", "item"), Seq("bid"), "item",
          minSup, basketCap = 100)
        .as[(String, String, Long, Long, Long)].collect().toSet
      // brute force on the driver: same pruning order (items first)
      val byBasket = rows.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
      val itemSup = items.map(i => i -> byBasket.values.count(_.contains(i)).toLong).toMap
      val freq = items.filter(itemSup(_) >= minSup)
      val want = (for {
        a <- freq; b <- freq if a < b
        sup = byBasket.values.count(s => s.contains(a) && s.contains(b)).toLong
        if sup >= minSup
      } yield (a, b, sup, itemSup(a), itemSup(b))).toSet
      assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
    }
  }

  test("pairRules: directional confidence and lift over the raw basket universe") {
    val rules = Itemsets.pairRules(baskets, Seq("bid"), "item",
        minSupport = 3L, basketCap = 10)
      .orderBy("antecedent")
      .as[(String, String, Long, Double, Double)].collect()
    // N = 6 raw baskets; conf(x→y) = 4/5, conf(y→x) = 4/4,
    // lift = 4·6/(5·4) = 1.2 both ways
    assert(rules.toSeq == Seq(
      ("x", "y", 4L, 0.8, 1.2),
      ("y", "x", 4L, 1.0, 1.2)))
  }
}
