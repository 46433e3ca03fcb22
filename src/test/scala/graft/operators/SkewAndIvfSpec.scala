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

  test("kmeansCentroids separates two obvious clusters and tracks their means") {
    // ids 0 and 1 seed one init centroid inside each true cluster
    val a = Seq((0L, Seq(1f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f)), (4L, Seq(0.95f, 0f, 0.05f)))
    val b = Seq((1L, Seq(0f, 1f, 0f)), (3L, Seq(0.1f, 0.9f, 0f)), (5L, Seq(0f, 0.95f, 0.05f)))
    val corpus = (a ++ b).toDF("vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(corpus, k = 2, iters = 3)
      .as[(Int, Seq[Double])].collect().toMap
    assert(cent.keySet == Set(0, 1))
    // centroid 0 ≈ mean of cluster a: first component dominant; centroid 1 mirrors
    assert(cent(0)(0) > 0.8 && cent(0)(1) < 0.1)
    assert(cent(1)(1) > 0.8 && cent(1)(0) < 0.1)
    val meanA0 = a.map(_._2(0).toDouble).sum / 3
    assert(math.abs(cent(0)(0) - meanA0) < 1e-6)
  }

  test("kmeansCentroids drops empty clusters like the oracle does") {
    // every vector sits on centroid 0's side; centroid 1 loses all members
    val corpus = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(-1f, 0.001f)),
      (2L, Seq(1f, 0.01f)), (3L, Seq(1f, -0.01f))).toDF("vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(corpus, k = 2, iters = 2)
      .as[(Int, Seq[Double])].collect().toMap
    // iter 1: vec 1 is alone with centroid 1; after it reassigns (its own
    // centroid persists only while it is nearest) the set can shrink —
    // assert the operator returns SOME centroid per surviving cluster
    // and never a NaN component
    assert(cent.nonEmpty && cent.values.forall(_.forall(d => !d.isNaN)))
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

  test("pqTopK recall vs brute force on clustered data") {
    val dim = 16
    val rnd = new scala.util.Random(13)
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat; v.map(_ / n)
    }
    val bases = (0 until 8).map(i => (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian().toFloat))))
    val near = bases.flatMap { case (i, v) =>
      (0 until 4).map(j => (1000L + i * 10 + j,
        unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))))
    }
    val corpus = (bases ++ near).toDF("vec_id", "embedding")
    val queries = bases.toDF("qid", "qe")
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(queries, corpus,
        dims = dim, m = 4, ksub = 8, iters = 3, topK = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (pq & truth).size.toDouble / truth.size
    // PQ quantizes both sides to 4 codes; on tightly clustered data the
    // cluster members collapse to the same code word, so recall of the
    // planted near-copies must stay high
    assert(recall >= 0.6, s"PQ recall $recall too low")
  }

  test("rqTopK recall vs brute force on clustered data") {
    val dim = 16
    val rnd = new scala.util.Random(17)
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat; v.map(_ / n)
    }
    // DENSE 0-based ids: rqTopK stage s seeds from ids [s*k, (s+1)*k)
    val bases = (0 until 8).map(i => unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val all = bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      bases.zipWithIndex.flatMap { case (v, i) =>
        (0 until 4).map(j => ((8 + i * 4 + j).toLong,
          unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))))
      }
    val corpus = all.toDF("vec_id", "embedding")
    val queries = all.take(8).map { case (id, v) => (id, v) }.toDF("qid", "qe")
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val rq = Similarity.rqTopK(queries, corpus, k = 8, stages = 2, iters = 2, topK = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (rq & truth).size.toDouble / truth.size
    // two whole-vector stages: stage 0 lands the cluster, the residual
    // stage separates members within it — planted near-copies must rank
    assert(recall >= 0.6, s"RQ recall $recall too low")
  }

  test("ivfSelfTopK: recall vs brute-force self-probe; candidates meet on an equi-join") {
    val dim = 16
    val rnd = new scala.util.Random(19)
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat; v.map(_ / n)
    }
    // dense 0-based ids (the kmeansCentroids seed contract)
    val bases = (0 until 8).map(i => unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val all = bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      bases.zipWithIndex.flatMap { case (v, i) =>
        (0 until 4).map(j => ((8 + i * 4 + j).toLong,
          unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))))
      }
    val corpus = all.toDF("vec_id", "embedding").localCheckpoint()
    val truth = Similarity.bruteForceTopK(
        corpus.selectExpr("vec_id AS qid", "embedding AS qe"), corpus, k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val cent = Similarity.kmeansCentroids(corpus, k = 8, iters = 2).localCheckpoint()
    val ivfDf = Similarity.ivfSelfTopK(corpus, cent, k = 3, nprobe = 3)
    val ivf = ivfDf.select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (ivf & truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"ivfSelfTopK recall $recall too low")
    // the scale contract: the corpus meets itself through a cid
    // EQUI-join — no nested-loop join may survive into the plan beyond
    // the k-row centroid broadcast (which Spark plans as hash/BNL over
    // 8 rows); assert no CartesianProduct anywhere
    val plan = ivfDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in IVF self-probe:\n$plan")
  }
}
