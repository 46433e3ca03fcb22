package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(7)

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    v.map(_ / n)
  }
  private def randVec(): Array[Float] = unit(Array.fill(dim)(rnd.nextGaussian().toFloat))
  private def jitter(v: Array[Float]): Array[Float] =
    unit(v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))

  /** 20 base vectors; for each base, 3 jittered near-neighbors. */
  private lazy val (queries, corpus) = {
    val bases = (0 until 20).map(i => (i.toLong, randVec()))
    val near = bases.flatMap { case (i, v) =>
      (0 until 3).map(j => (1000L + i * 10 + j, jitter(v)))
    }
    val q = bases.toDF("qid", "qe")
    val c = (bases.map { case (i, v) => (i, v) } ++ near).toDF("vec_id", "embedding")
    (q, c)
  }

  test("bruteForceTopK returns k ranked neighbors, nearest are the jittered copies") {
    val res = Similarity.bruteForceTopK(queries, corpus, k = 3).collect()
    assert(res.length === 20 * 3)
    // for each query, all top-3 are its own jittered family (cos ~0.999)
    res.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val nid = r.getAs[Long]("nid")
      assert(nid >= 1000L + qid * 10 && nid < 1000L + qid * 10 + 3,
        s"qid=$qid got unexpected neighbor $nid")
      assert(r.getAs[Double]("cos") > 0.9)
    }
  }

  test("annTopK recall vs brute force on clustered data") {
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(queries, corpus, k = 3, numPlanes = 6, dim = dim)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (ann & truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
    // ANN never invents non-corpus neighbors and respects the qid exclusion
    assert(ann.forall { case (q, n) => n != q })
  }

  test("kCenterCoreset: farthest-point picks are maximal and never near-duplicates") {
    val res = Similarity.kCenterCoreset(corpus, k = 5)
      .as[(Long, Long, Option[Double])].collect()
    assert(res.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(res.map(_._2).distinct.length === 5)
    // the greedy never selects a jittered copy of an already-selected
    // base (its distance to the set is ~0 while orthogonal bases sit
    // at distance ~1)
    val picked = res.map(_._2)
    val bases = picked.map(id => if (id >= 1000) id / 10 - 100 else id)
    assert(bases.distinct.length === 5, s"picked near-duplicates: ${picked.toSeq}")
    // selection distances are non-increasing (greedy max shrinks)
    val ds = res.sortBy(_._1).flatMap(_._3)
    assert(ds.toSeq === ds.sortBy(-_).toSeq)
  }

  test("mmrTopK: first pick is the top candidate; later picks avoid its near-copies") {
    val res = Similarity.mmrTopK(queries, corpus, candK = 8, selectK = 3, lambda = 0.3)
      .as[(Long, Long, Double, Double, Long)].collect()
    val byQ = res.groupBy(_._1)
    assert(byQ.forall(_._2.length == 3))
    byQ.foreach { case (q, rows) =>
      val picks = rows.sortBy(_._5).map(_._2)
      assert(picks.distinct.length == 3, s"q=$q duplicate selection")
      // step 1 = pure relevance: one of q's jittered copies
      assert(picks.head / 10 - 100 == q && picks.head >= 1000)
      // at λ=0.3 the ~0.99 mutual similarity of the other two copies
      // outweighs their relevance edge: not all three picks are copies
      assert(!picks.forall(n => n >= 1000 && n / 10 - 100 == q),
        s"q=$q picked only near-copies ${picks.toSeq} — no diversification")
    }
  }

  test("sq8TopK: byte codes track exact cosine; planted near-dup stays rank 1") {
    val res = Similarity.sq8TopK(queries, corpus, topK = 3)
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(res.length === 20 * 3)
    // 8-bit per-dim reconstruction error is tiny on unit vectors
    res.foreach { case (_, _, sq8, exact, _) =>
      assert(math.abs(sq8 - exact) < 0.02, s"sq8=$sq8 exact=$exact")
    }
    // every query's rank-1 is one of its 3 jittered copies
    res.filter(_._5 == 1).foreach { case (q, nid, _, _, _) =>
      assert(nid / 10 - 100 == q && nid >= 1000, s"q=$q rank1=$nid")
    }
  }

  test("ivfPqTopK: planted near-duplicates dominate the top ranks; self excluded") {
    // dim=16, m=4, subDim=4; 4 coarse cells from the first 4 bases,
    // sub-codebook seeds from vec ids 4..7
    val res = Similarity.ivfPqTopK(queries, corpus, dims = dim, nlist = 4,
        nprobe = 2, m = 4, ksub = 4, iters = 2, topK = 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(res.nonEmpty)
    // ranks are 1..k per query, distances ascending, no self-match
    val byQ = res.groupBy(_._1)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(identity).toSeq)
      sorted.foreach(r => assert(r._1 != r._2))
    }
    // ADC on residuals is approximate, but a jittered copy of the query
    // (cos ≈ 0.999) should appear in the top-3 for most queries
    val hit = byQ.count { case (q, rows) =>
      rows.exists(r => r._2 / 10 - 100 == q && r._2 >= 1000)
    }
    assert(hit >= 12, s"only $hit/20 queries surfaced a planted near-dup in top-3")
  }

  test("nearDupPairs finds every planted near-duplicate, no sub-threshold pair") {
    // plant 10 near-dup pairs (cos > 0.98: tiny seeded perturbation) in a
    // sea of 200 random vectors — banded LSH must recover ALL of them
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 200).map(i => (i.toLong, vec()))
    val planted = (0 until 10).map { i =>
      val (origId, v) = base(i)
      (1000L + origId, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(corpus, minCos = 0.95)
      .as[(Long, Long, Double)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    (0 until 10).foreach { i =>
      assert(found.contains((i.toLong, 1000L + i)), s"missed planted pair $i")
    }
    // exact verification: nothing below the threshold leaks through
    assert(pairs.forall(_._3 >= 0.95))
  }

  test("nearDupKeeper assigns planted duplicates to their original; singletons keep themselves") {
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 100).map(i => (i.toLong, vec()))
    // two copies of vector 3 → a 3-node component {3, 1003, 2003}
    val planted = Seq(
      (1003L, base(3)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat)),
      (2003L, base(3)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat)),
      (1007L, base(7)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat)))
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val keepers = Similarity.nearDupKeeper(corpus, minCos = 0.95)
      .as[(Long, Long)].collect().toMap
    assert(keepers.size == 103)
    assert(keepers(1003L) == 3L && keepers(2003L) == 3L && keepers(3L) == 3L)
    assert(keepers(1007L) == 7L && keepers(7L) == 7L)
    // untouched vectors are their own keeper
    assert(keepers(50L) == 50L)
  }

  test("cosine_sim kernel matches scala computation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(graft.functions.GraftFunctions.cosine_sim(col("a"), col("b")))
      .head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("deltaAssign routes arrivals to their cluster and ranks in-cell neighbors") {
    // fresh deterministic fixture: 10 well-separated cluster seeds, 4
    // jittered members each; arrivals are new jitters of clusters 0 and
    // 5 — each must route to its cluster's cell and rank that cluster's
    // members on top
    val local = new scala.util.Random(42)
    def lUnit(v: Array[Float]) = unit(v)
    def lRand() = lUnit(Array.fill(dim)(local.nextGaussian().toFloat))
    def lJitter(v: Array[Float]) = lUnit(v.map(x => x + 0.05f * local.nextGaussian().toFloat))
    val seeds = (0 until 10).map(i => (i.toLong, lRand()))
    val members = seeds.flatMap { case (i, v) =>
      (0 until 4).map(j => (1000L + i * 10 + j, lJitter(v)))
    }
    val base = (seeds ++ members).toDF("vec_id", "embedding")
    val delta = Seq((9000L, lJitter(seeds(0)._2)), (9001L, lJitter(seeds(5)._2)))
      .toDF("vec_id", "embedding")
    val r = Similarity.deltaAssign(base, delta, k = 8, iters = 2, topK = 3)
      .orderBy("qid", "rn").collect()
    assert(r.length == 6, s"two arrivals x top-3 expected, got ${r.length}")
    // rank-1 neighbor of each arrival is a member of its own cluster
    val top1 = r.filter(_.getLong(3) == 1L).map(x => x.getLong(0) -> x.getLong(1)).toMap
    def cluster(nid: Long): Long = if (nid < 1000) nid else (nid - 1000) / 10
    assert(cluster(top1(9000L)) == 0L, s"arrival 9000 nearest ${top1(9000L)}")
    assert(cluster(top1(9001L)) == 5L, s"arrival 9001 nearest ${top1(9001L)}")
    // arrivals never appear as neighbors: the index is base-only
    assert(r.forall(_.getLong(1) < 9000L), "delta vectors leaked into the index")
  }

  test("decontaminate flags corpus vectors near an eval vector, ties break to min eval id") {
    val ex = Array(1.0f, 0.0f, 0.0f)
    val ey = Array(0.0f, 1.0f, 0.0f)
    val evalSet = Seq((100L, ex), (200L, ey)).toDF("eval_id", "ee")
    val corpus = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f)),  // ≈ eval 100 → contaminated
      (2L, Array(0.0f, 0.0f, 1.0f)),   // orthogonal to both → clean
      (3L, Array(1.0f, 1.0f, 0.0f))    // equidistant → tie → eval 100
    ).toDF("vec_id", "embedding")
    val r = Similarity.decontaminate(corpus, evalSet, minCos = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "nearest_eval", "contaminated")
      .as[(Long, Long, Boolean)].collect()
    assert(r.toSeq === Seq((1L, 100L, true), (2L, 100L, false), (3L, 100L, false)))
  }

  test("decontaminateAnn: colliders score exactly, non-colliders surface as clean NULL rows") {
    val dim = 64
    val e = Array.tabulate(dim)(i => math.sin(i + 1).toFloat)
    val near = e.map(v => v * 0.99f) // same direction → same bucket in every band
    val anti = e.map(v => -v) // every sign bit flips → no shared bucket in ANY band
    val evalSet = Seq((100L, e)).toDF("eval_id", "ee")
    val corpus = Seq((1L, near), (2L, anti)).toDF("vec_id", "embedding")
    val r = Similarity.decontaminateAnn(corpus, evalSet, minCos = 0.9, dim = dim)
      .orderBy("vec_id").collect()
    assert(r(0).getLong(1) === 100L && r(0).getDouble(2) > 0.99 && r(0).getBoolean(3))
    assert(r(1).isNullAt(1) && r(1).isNullAt(2) && !r(1).getBoolean(3))
  }

  test("randomProjection approximately preserves strong cosine structure") {
    // 64-d clustered fixture: 10 bases × 3 jittered copies. Projection
    // to 32 dims must keep within-cluster cosine far above cross-cluster
    // cosine on average (JL distance preservation — the contract that
    // makes the 2× payload cut usable for candidate generation).
    val d = 64
    val r2 = new scala.util.Random(11)
    def u(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat; v.map(_ / n)
    }
    val bases = (0 until 10).map(i => (i.toLong, u(Array.fill(d)(r2.nextGaussian().toFloat))))
    val rows = bases.flatMap { case (i, v) =>
      (0 until 3).map(j =>
        (i * 10 + j, i, u(v.map(x => x + 0.05f * r2.nextGaussian().toFloat))))
    }
    val df = rows.toDF("id", "cluster", "emb")
    val pl = graft.functions.SignLshBuckets.planes(numPlanes = 32, dim = d, seed = 137L)
      .toSeq.map(_.toSeq)
    val proj = df.select(col("id"), col("cluster"),
      Similarity.randomProjection(col("emb"), pl).as("pe"))
    val pairs = proj.as("x").join(proj.as("y"), col("x.id") < col("y.id"))
      .select((col("x.cluster") === col("y.cluster")).as("same"),
        Similarity.cosineDouble(col("x.pe"), col("y.pe")).as("c"))
      .groupBy("same").agg(avg("c").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(pairs(true) > 0.7, s"within-cluster projected cosine collapsed: ${pairs(true)}")
    assert(math.abs(pairs(false)) < 0.3, s"cross-cluster projected cosine inflated: ${pairs(false)}")
  }

  test("semDeDup keeps exactly one member per planted near-dup group, the farthest from centroid") {
    val d = 16
    val r = new scala.util.Random(7)
    def u(v: Array[Float]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n).toSeq
    }
    // 6 well-separated unit gaussians, 3 tight copies each (within-group
    // cos ≈ 1, cross-group |cos| ≪ tau); ids g, g+10, g+20 so the k=3
    // seeds (vec_id < 3) land on three DISTINCT groups
    val bases = (0 until 6).map(g => (g, Array.fill(d)(r.nextGaussian().toFloat)))
    val rows = bases.flatMap { case (g, v) =>
      (0 until 3).map(j => (g.toLong + 10L * j, g,
        u(v.map(x => x + 0.01f * r.nextGaussian().toFloat))))
    }
    val df = rows.toDF("vec_id", "grp", "embedding")
    val out = Similarity.semDeDup(df.select("vec_id", "embedding"), k = 3, iters = 2, tau = 0.8)
    val j = out.join(df.select(col("vec_id"), col("grp")), "vec_id")
    val kept = j.filter(!col("dup")).groupBy("grp").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(kept.size == 6 && kept.values.forall(_ == 1L),
      s"expected exactly one survivor per group, got $kept")
    // the survivor is its group's least-typical member: min (ccos, vec_id)
    val surv = j.filter(!col("dup")).select("grp", "vec_id")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = j.select("grp", "ccos", "vec_id").collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2))))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min._2 }
    assert(surv == want, s"survivors $surv != farthest-from-centroid picks $want")
  }

  test("kmeansParSeed weights partition the corpus and chosen points are never re-drawn") {
    val r = new scala.util.Random(11)
    val rows = (0L until 40L).map(i => (i, Seq.fill(8)(r.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.kmeansParSeed(df, l = 3, rounds = 3).collect()
    val cids = out.map(_.getLong(0))
    assert(cids.distinct.length == cids.length, s"a chosen point was re-drawn: ${cids.mkString(",")}")
    // every corpus point is nearest to exactly one candidate
    assert(out.map(_.getLong(2)).sum == 40L,
      s"weights must partition the corpus: ${out.map(_.getLong(2)).mkString(",")}")
    assert(out.exists(x => x.getLong(0) == 0L && x.getLong(1) == 0L),
      "seed vector 0 must be present with rnd = 0")
    assert(out.length > 1, "oversampling should draw beyond the seed on gaussian data")
  }

  test("cosineDouble matches driver-side double arithmetic") {
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(-1.0, 0.5, 2.0)
    val got = Seq((a, b)).toDF("a", "b")
      .select(Similarity.cosineDouble(col("a"), col("b")).as("c"))
      .head().getDouble(0)
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val want = dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(math.abs(got - want) < 1e-12)
  }
}
