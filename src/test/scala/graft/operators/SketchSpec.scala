package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the probabilistic summaries ([[Sketches]]): the
  * DuckDB oracles prove cross-engine agreement; these prove the
  * guarantees the structures are FOR — HLL estimates land inside the
  * published error band, count-min never undercounts, Bloom never
  * false-negatives.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hllRegisters: exactly m rows, ranks within [0, wBits+1], duplicate-insensitive") {
    val items = (0 until 5000).map(i => s"item-${i % 1000}").toDF("v")
    val regs = Sketches.hllRegisters(items, "v", m = 64, wBits = 54)
    val rows = regs.collect()
    assert(rows.length == 64)
    assert(rows.forall { r => val x = r.getLong(1); x >= 0 && x <= 55 })
    // max is idempotent: the 5x-duplicated stream builds the same sketch
    val dedup = Sketches.hllRegisters(items.distinct(), "v", m = 64, wBits = 54)
    assert(regs.orderBy("bucket").collect().toSeq == dedup.orderBy("bucket").collect().toSeq)
  }

  test("hllEstimate: inside the 1.04/sqrt(m) band (x3) across decades of cardinality") {
    for (n <- Seq(1000, 10000, 50000)) {
      val items = (0 until n).map(i => s"card-$i").toDF("v")
      val regs = Sketches.hllRegisters(items, "v", m = 64, wBits = 54)
      val est = Sketches.hllEstimate(regs, m = 64, wBits = 54, alpha = 0.709)
        .head().getDouble(0)
      val relErr = math.abs(est - n) / n
      assert(relErr < 3 * 1.04 / math.sqrt(64), s"n=$n est=$est relErr=$relErr")
    }
  }

  test("count-min: estimate >= exact for every probe (collisions only add)") {
    val items = (0 until 20000).map(i => s"tok-${i % 300}").toDF("v")
    val cells = Sketches.cmsCells(items, "v", depth = 4, width = 64)
    val exact = items.groupBy("v").agg(count(lit(1)).as("exact"))
    val looked = Sketches.cmsLookup(cells, exact, "v", depth = 4, width = 64)
      .select(col("v"), col("exact").cast("long"), col("est_cnt"))
      .as[(String, Long, Long)].collect()
    assert(looked.length == 300)
    assert(looked.forall { case (_, ex, est) => est >= ex },
      looked.filter { case (_, ex, est) => est < ex }.take(3).mkString(","))
    // with width >> heavy-hitter count the heaviest item is estimated tightly:
    // its cell holds at most its own count plus colliding light items
    val heavy = looked.maxBy(_._2)
    assert(heavy._3 <= heavy._2 * 2, s"heavy hitter wildly overcounted: $heavy")
  }

  test("bloom: no false negatives; misses are definite") {
    val base = (0 until 2000).map(i => s"key-$i").toDF("v")
    val probes = (1500 until 3000).map(i => s"key-$i").toDF("v")
    val bits = Sketches.bloomBits(base, "v", k = 3, mBits = 4096)
    val hit = Sketches.bloomProbe(bits, probes, "v", k = 3, mBits = 4096)
      .as[(String, Long)].collect().toMap
    // every inserted key must hit
    assert((1500 until 2000).forall(i => hit(s"key-$i") == 1L))
    // non-inserted keys may false-positive but must mostly miss at this
    // load (n=2000, m=4096, k=3 -> fp rate ~ (1 - e^(-3*2000/4096))^3 ~ 0.45);
    // the structural claim is just that misses EXIST and are correct
    val misses = (2000 until 3000).count(i => hit(s"key-$i") == 0L)
    assert(misses > 0)
  }

  test("misra-gries: verified output equals the exact threshold set under any partitioning") {
    val rnd = new scala.util.Random(3)
    // zipf-ish: item i appears ~ 4000/i times, 40 items
    val stream = (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"item$i"))
    val shuffled = rnd.shuffle(stream)
    val n = stream.length.toLong
    for (k <- Seq(4, 10); parts <- Seq(1, 7, 32)) {
      val df = shuffled.toDF("item").repartition(parts)
      val got = Sketches.mgHeavyHitters(df, "item", k)
        .as[(String, Long)].collect().toMap
      val exact = stream.groupBy(identity).view.mapValues(_.length.toLong)
        .filter { case (_, c) => c * (k + 1) > n }.toMap
      assert(got === exact, s"k=$k parts=$parts")
    }
  }

  test("kmv: exact below k, duplicate-insensitive, values sorted distinct") {
    val items = (0 until 600).map(i => s"kmv-${i % 120}").toDF("v")
    val vals = Sketches.kmvValues(items, "v", k = 256).orderBy("rank").collect()
    // 120 distinct < k: the sketch IS the distinct hash set and est is exact
    assert(vals.length == 120)
    val hs = vals.map(_.getLong(1))
    assert(hs.toSeq == hs.sorted.toSeq && hs.distinct.length == hs.length)
    val est = Sketches.kmvEstimate(
      Sketches.kmvValues(items, "v", k = 256), k = 256).head().getDouble(0)
    assert(est == 120.0)
    // duplicate-insensitive: the 5x-duplicated stream builds the same sketch
    val dedup = Sketches.kmvValues(items.distinct(), "v", k = 256)
      .orderBy("rank").collect()
    assert(vals.toSeq == dedup.toSeq)
  }

  test("kmv estimate: inside ~1/sqrt(k-2) band (x3) across decades of cardinality") {
    for (n <- Seq(2000, 20000, 80000)) {
      val items = (0 until n).map(i => s"kcard-$i").toDF("v")
      val est = Sketches.kmvEstimate(
        Sketches.kmvValues(items, "v", k = 256), k = 256).head().getDouble(0)
      val relErr = math.abs(est - n) / n
      assert(relErr < 3.0 / math.sqrt(254), s"n=$n est=$est relErr=$relErr")
    }
  }

  test("kmv union-merge is lossless: bottom-k of A∪B equals merge of the sketches") {
    val a = (0 until 5000).map(i => s"ka-$i").toDF("v")
    val b = (2500 until 7500).map(i => s"ka-$i").toDF("v") // overlaps a
    val direct = Sketches.kmvValues(a.union(b), "v", k = 128)
      .select("h").as[Long].collect().sorted.toSeq
    // merge the two value tables the windowed-union way: union the raw
    // h values, distinct, keep the bottom k
    val mergedRaw = Sketches.kmvValues(a, "v", k = 128).select("h")
      .union(Sketches.kmvValues(b, "v", k = 128).select("h"))
      .distinct().orderBy("h").limit(128)
      .as[Long].collect().sorted.toSeq
    assert(mergedRaw == direct)
  }

  test("hdr histogram: ub covers v within 12.5%, exact below 16, bins monotone") {
    val vs = (1L to 5000L) ++ Seq(123456L, 999999L, (1L << 40) + 12345L)
    val rows = vs.toDF("v")
      .select(col("v"), Sketches.hdrBin(col("v")).as("bin"))
      .select(col("v"), col("bin"), Sketches.hdrUb(col("bin")).as("ub"))
      .orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (v, _, ub) =>
      assert(ub >= v, s"ub $ub < v $v")
      assert((ub - v).toDouble / v <= 0.125, s"v=$v ub=$ub exceeds the bucket-width bound")
      if (v < 16) assert(ub == v, s"small values must be exact: v=$v ub=$ub")
    }
    // bin id and ub are monotone in v — quantile scan order is value order
    assert(rows.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    // sum-merge = histogram of the union, by construction: cells of a
    // split stream sum to the cells of the whole
    val all = vs.toDF("v").withColumn("key", lit("a"))
    val whole = Sketches.hdrCellsBy(all, "key", "v")
      .select("bin", "cnt").as[(Long, Long)].collect().toMap
    val parts = vs.zipWithIndex.map { case (v, i) => (v, s"p${i % 3}") }
      .toDF("v", "key")
    val mergedParts = Sketches.hdrCellsBy(parts, "key", "v")
      .groupBy("bin").agg(sum("cnt").as("cnt"))
      .select("bin", "cnt").as[(Long, Long)].collect().toMap
    assert(whole == mergedParts)
  }

  test("theta intersection: direct sample overlap lands near exact on planted overlap") {
    // A = 0..5999, B = 4000..9999 -> |A∩B| = 2000, |A∪B| = 10000
    val a = (0 until 6000).map(i => s"tv-$i").toDF("v")
    val b = (4000 until 10000).map(i => s"tv-$i").toDF("v")
    val k = 256
    import org.apache.spark.sql.DataFrame
    def vals(df: DataFrame) = Sketches.kmvValues(df, "v", k).select("h").as[Long].collect().sorted
    val va = vals(a); val vb = vals(b)
    def theta(v: Array[Long]) = if (v.length == k) v.last else Sketches.KmvDomain
    val tu = math.min(theta(va), theta(vb))
    val inter = va.toSet.intersect(vb.toSet).count(_ < tu)
    val estInter = inter.toDouble * Sketches.KmvDomain.toDouble / tu.toDouble
    assert(math.abs(estInter - 2000) / 2000 < 0.5, s"estInter=$estInter")
    val union = (va.toSet ++ vb.toSet).count(_ < tu)
    val estUnion = union.toDouble * Sketches.KmvDomain.toDouble / tu.toDouble
    assert(math.abs(estUnion - 10000) / 10000 < 0.3, s"estUnion=$estUnion")
  }
}
