package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAndIvfSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals direct aggregation") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k${i % 37}", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    val salted = Skew.saltedAgg(df, Seq("k"), buckets = 8, saltBy = col("v"),
        partial = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
        finalAgg = Seq(sum("ps").as("s"), sum("pc").as("c")))
      .as[(String, Double, Long)].collect().map { case (k, s, c) => k -> ((s, c)) }.toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(c === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
  }

  test("saltedJoin equals plain join") {
    val left = Seq.tabulate(500)(i => (if (i % 5 == 0) 1L else (i % 23).toLong, i)).toDF("k", "lv")
    val right = Seq.tabulate(23)(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val direct = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 4, leftSaltBy = col("lv"))
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted === direct)
  }

  test("ivfTopK recall vs brute force on clustered data") {
    val dim = 16
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat; v.map(_ / n)
    }
    val bases = (0 until 16).map(i => (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian().toFloat))))
    val near = bases.flatMap { case (i, v) =>
      (0 until 3).map(j => (1000L + i * 10 + j,
        unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))))
    }
    val corpus = (bases ++ near).toDF("vec_id", "embedding")
    val queries = bases.toDF("qid", "qe")
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, corpus, k = 3, nlist = 16, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (ivf & truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }
}
