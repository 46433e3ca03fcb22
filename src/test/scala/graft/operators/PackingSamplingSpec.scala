package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 100L

  private def docs = (0L until 200L)
    .map(i => (i, 1L + (i * 37 % 150))) // token counts 1..150, some oversize
    .toDF("doc_id", "n_tokens")

  test("packGreedy: every doc assigned exactly once, order preserved") {
    val packed = Packing.packGreedy(docs, budget, shards = 8,
      idCol = "doc_id", tokensCol = col("n_tokens"))
    assert(packed.count() === 200)
    assert(packed.select("doc_id").distinct().count() === 200)
    // n_tokens carried through unchanged
    val joined = packed.join(docs.withColumnRenamed("n_tokens", "orig"), "doc_id")
      .filter(col("n_tokens") =!= col("orig"))
    assert(joined.count() === 0)
  }

  test("packGreedy: bins respect the budget except oversize singletons") {
    val packed = Packing.packGreedy(docs, budget, shards = 8,
      idCol = "doc_id", tokensCol = col("n_tokens")).cache()
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
    val bad = bins.filter(col("fill") > budget && col("n") > 1)
    assert(bad.count() === 0, "multi-doc bin over budget")
    // oversize docs land alone in their bin
    val oversize = packed.filter(col("n_tokens") > budget)
      .join(bins, Seq("shard", "bin")).filter(col("n") > 1)
    assert(oversize.count() === 0, "oversize doc shares a bin")
    packed.unpersist()
  }

  test("packGreedy: bin ids are contiguous from 0 per shard and follow doc order") {
    val packed = Packing.packGreedy(docs, budget, shards = 8,
      idCol = "doc_id", tokensCol = col("n_tokens")).cache()
    val perShard = packed.groupBy("shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"), countDistinct("bin").as("nb"))
      .filter(col("lo") =!= 0 || col("nb") =!= col("hi") + 1)
    assert(perShard.count() === 0, "bin ids not contiguous from 0")
    // within a shard, bin is monotone in doc_id (greedy never goes back)
    val rows = packed.orderBy("shard", "doc_id")
      .select("shard", "doc_id", "bin").as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).values.foreach { sh =>
      val bins = sh.sortBy(_._2).map(_._3)
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a && b - a <= 1 })
    }
    packed.unpersist()
  }

  test("balancedHashSample: deterministic, subset, strata rebalanced") {
    val df = (0L until 2000L)
      .map(i => (i, if (i % 10 < 7) "en" else if (i % 10 < 9) "de" else "fr"))
      .toDF("doc_id", "lang")
    val s1 = Sampling.balancedHashSample(df, "lang", "doc_id")
    val s2 = Sampling.balancedHashSample(df, "lang", "doc_id")
    val ids1 = s1.select("doc_id").as[Long].collect().sorted
    assert(ids1.sameElements(s2.select("doc_id").as[Long].collect().sorted), "non-deterministic")
    assert(ids1.toSet.subsetOf((0L until 2000L).toSet))
    // every stratum within ±50% of the smallest stratum's size (binomial slack)
    val target = 200.0 // fr count
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("en", "de", "fr"))
    counts.values.foreach(c => assert(c > target * 0.5 && c < target * 1.5, s"count $c vs target $target"))
  }

  test("temperatureSample: alpha<1 upsamples the tail; alpha=1 keeps proportions") {
    val df = (0L until 1000L)
      .map(i => (i, if (i % 10 < 8) "en" else "is")) // 800 en / 200 is
      .toDF("doc_id", "lang")
    def rates(alpha: Double): Map[String, Double] =
      Sampling.temperatureSample(df, "lang", "doc_id", alpha, targetTotal = 500L)
        .groupBy("lang").agg(first("rate").as("r"))
        .as[(String, Double)].collect().toMap
    val r1 = rates(1.0)
    assert(math.abs(r1("en") - 0.5) < 1e-6 && math.abs(r1("is") - 0.5) < 1e-6,
      s"alpha=1 must keep proportions: $r1")
    val r07 = rates(0.7)
    assert(r07("is") > r07("en"), s"alpha<1 must upsample the tail stratum: $r07")
    // expected-kept stays ~targetTotal: sum over strata of rate*n
    val exp = r07("en") * 800 + r07("is") * 200
    assert(math.abs(exp - 500.0) < 1.0, s"expected kept $exp drifted from target")
  }

  test("dsirWeights: target-like docs outweigh target-unlike docs; weights deterministic") {
    val target = (0L until 40L).map(i => (i, "alpha beta gamma delta " * 5)).toDF("doc_id", "text")
    val source = Seq(
      (100L, "alpha beta gamma delta alpha beta gamma delta"), // target-like
      (101L, "zip zap zop quux corge grault garply waldo")     // target-unlike
    ).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(source, target, buckets = 128)
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(w.map(_._1).toSeq === Seq(100L, 101L))
    assert(w(0)._3 > w(1)._3,
      s"target-like doc must score higher: ${w(0)._3} vs ${w(1)._3}")
    assert(w(0)._3 > 0 && w(1)._3 < 0, "signs should separate like from unlike")
    val w2 = Sampling.dsirWeights(source, target, buckets = 128)
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(w.sameElements(w2), "weights must be deterministic")
  }
}
