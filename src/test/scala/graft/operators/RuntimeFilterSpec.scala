package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the Bloom semi-join reduction ([[RuntimeFilter]]):
  * no false negatives (every dim key passes the probe), real reduction
  * (non-matching big rows are dropped before the join), and exactness
  * of the composed join (identical to the plain inner join).
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val M = 1 << 12

  test("bloomFiltered: no false negatives, near-total reduction of non-members") {
    val dim = (0L until 50L).map(_ * 97L).toDF("k")
    val words = RuntimeFilter.bloomWords(dim, "k", K, M)
    // every inserted key passes
    val members = dim.withColumnRenamed("k", "key")
    assert(RuntimeFilter.bloomFiltered(members, "key", words, K, M).count() == 50L)
    // of 5000 non-member keys, the survivors are FPs only: with
    // n=50, m=4096, k=5 the FP rate is ~1e-6 — allow a generous margin
    val non = (1L to 5000L).map(_ * 97L + 13L).toDF("key")
    val fps = RuntimeFilter.bloomFiltered(non, "key", words, K, M).count()
    assert(fps <= 5L, s"false positives: $fps")
  }

  test("bloomReducedJoin equals the plain inner join") {
    val big = (0L until 2000L).map(i => (i % 500L, i)).toDF("bk", "payload")
    val dim = Seq(3L, 77L, 410L, 499L).toDF("dk").withColumn("tag", concat(lit("d"), col("dk")))
    val reduced = RuntimeFilter.bloomReducedJoin(big, "bk", dim, "dk", K, M)
      .select("bk", "payload", "tag").as[(Long, Long, String)].collect().toSet
    val plain = big.join(dim, col("bk") === col("dk"))
      .select("bk", "payload", "tag").as[(Long, Long, String)].collect().toSet
    assert(reduced == plain && plain.size == 16)
  }

  test("bloomWords packs exactly the bloomBits positions") {
    val dim = (1L to 30L).toDF("k")
    val words = RuntimeFilter.bloomWords(dim, "k", K, M)
    val setBits = words.zipWithIndex.flatMap { case (w, wi) =>
      (0 until 64).collect { case b if ((w >> b) & 1L) == 1L => wi * 64L + b }
    }.toSet
    val positions = Sketches.bloomBits(dim, "k", K, M).as[Long].collect().toSet
    assert(setBits == positions)
  }
}
