package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-verifiable fixtures for [[Graph]]: known triangle counts on
  * constructed shapes, degree-ordered enumeration vs the naive count
  * on a seeded random graph, clique-structure recovery by label
  * propagation, and the cap/support contract of the edge constructor.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long)*) =
    es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")

  test("triangleStats: K4 plus a pendant — known counts and coefficients") {
    // K4 on 1-4 (4 triangles, every node in 3) plus pendant 5-1
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
    val rows = Graph.triangleStats(e).orderBy("node")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 5)
    val byNode = rows.map(r => r._1 -> r).toMap
    assert(byNode(1L) == ((1L, 4L, 3L, 0.5))) // deg 4: 3 tri / C(4,2)=6 pairs
    for (n <- 2L to 4L) assert(byNode(n) == ((n, 3L, 3L, 1.0)))
    assert(byNode(5L) == ((5L, 1L, 0L, 0.0)))
    // total triangles = sum(tri)/3 = 4
    assert(rows.map(_._3).sum == 12L)
  }

  test("triangleStats: degree-ordered count equals the naive canonical count") {
    // seeded pseudo-random graph over 40 nodes
    val rnd = new scala.util.Random(42)
    val es = (0 until 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*)
    val perNode = Graph.triangleStats(e).agg(sum("tri_cnt")).head().getLong(0)
    // naive: canonical 3-join on the driver
    val set = e.as[(Long, Long)].collect().toSet
    val naive = (for {
      (a, b) <- set; (b2, c) <- set if b2 == b && set.contains((a, c))
    } yield (a, b, c)).size
    assert(perNode == 3L * naive, s"perNodeSum=$perNode naive=$naive")
  }

  test("hits: hand-computed hub/authority counts on the classic 4-node shape") {
    // 1→2, 1→3, 2→3, 4→3: node 3 is the authority, node 1 the best hub
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 3L)).toDF("src", "dst")
    val r1 = Graph.hits(e, rounds = 1).orderBy("node")
      .as[(Long, Long, Long, Double, Double)].collect()
    // auth1 = in-sums of hub0=1: (0,1,3,0); hub1 = out-sums of auth1: (4,3,0,3)
    assert(r1.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 4L, 0L), (2L, 3L, 1L), (3L, 0L, 3L), (4L, 3L, 0L)))
    assert(r1.map(r => r._1 -> ((r._4, r._5))).toMap ===
      Map(1L -> ((0.4, 0.0)), 2L -> ((0.3, 0.25)), 3L -> ((0.0, 0.75)), 4L -> ((0.3, 0.0))))
    // a second round keeps 3 the sole authority and 1 the top hub
    val r2 = Graph.hits(e, rounds = 2).orderBy("node")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r2.maxBy(_._5)._1 === 3L)
    assert(r2.maxBy(_._4)._1 === 1L)
  }

  test("jaccardIndex: K4 plus pendant — all 9 sharing pairs with exact ratios") {
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
    val rows = Graph.jaccardIndex(e).orderBy("u", "w")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length === 9) // (1,5) shares no neighbor and must be absent
    val m = rows.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(m((2L, 3L)) === ((2L, 4L, 0.5)))
    assert(m((1L, 2L)) === ((2L, 5L, 0.4)))
    assert(m((2L, 5L)) === ((1L, 3L, 0.333333)))
    assert(!m.contains((1L, 5L)))
  }

  test("adamicAdar: integer-quantized weights sum exactly per shared neighbor") {
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
    val m = Graph.adamicAdar(e).as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val w4 = math.round(1e9 / math.log(4)) // center 1, degree 4
    val w3 = math.round(1e9 / math.log(3)) // centers 2/3/4, degree 3
    assert(m((2L, 3L)) === ((2L, w4 + w3))) // common neighbors {1, 4}
    assert(m((4L, 5L)) === ((1L, w4)))      // only common neighbor is 1
    assert(m.size === 9)
  }

  test("vertexMetrics + triadicCensus: closed forms match brute force on K4 plus pendant") {
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
    val vm = Graph.vertexMetrics(e).as[(Long, Long, Double, Long, Long)].head()
    assert(vm === ((5L, 7L, 2.8, 4L, 15L)))
    val tc = Graph.triadicCensus(e)
      .select("t0", "t1", "t2", "t3").as[(Long, Long, Long, Long)].head()
    assert(tc === ((0L, 3L, 3L, 4L))) // brute-force census of C(5,3)=10 triples
  }

  test("labelPropagation: two cliques with one bridge converge to per-clique labels") {
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val e = edges((cliqueA ++ cliqueB :+ (4L, 11L)): _*)
    val labels = Graph.labelPropagation(e, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // every node of clique A settles on a label from clique A, same for B
    assert((1L to 4L).forall(n => labels(n) <= 4L), labels.toString)
    assert((11L to 14L).forall(n => labels(n) >= 11L || labels(n) <= 4L))
    // within each clique the label is uniform for the non-bridge core
    assert((1L to 3L).map(labels).distinct.size == 1)
    assert((12L to 14L).map(labels).distinct.size == 1)
  }

  test("minLabelStar: 500-node path labels to its minimum in O(log n) rounds") {
    // the adversarial shape for neighborhood-min contraction: plain
    // minLabel needs ~Θ(L) rounds here and fails fast at its default cap
    val path = (0L until 500L).sliding(2).map(p => (p(0), p(1))).toSeq
    val e = path.toDF("da", "db")
    val nodes = (0L until 500L).toDF("id")
    val labels = Components.minLabelStar(e, nodes).as[(Long, Long)].collect()
    assert(labels.length == 500 && labels.forall(_._2 == 0L))
  }

  test("minLabelStar: mixed forest — path + clique + isolated node") {
    val path = (10L to 20L).sliding(2).map(p => (p(0), p(1))).toSeq
    val clique = for (i <- 30L to 33L; j <- (i + 1) to 33L) yield (i, j)
    val e = (path ++ clique).toDF("da", "db")
    val nodes = ((10L to 20L) ++ (30L to 33L) :+ 99L).toDF("id")
    val labels = Components.minLabelStar(e, nodes).as[(Long, Long)].collect().toMap
    assert((10L to 20L).forall(labels(_) == 10L))
    assert((30L to 33L).forall(labels(_) == 30L))
    assert(labels(99L) == 99L)
  }

  test("minLabelStar agrees with minLabel on a dense random graph") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val e = es.toDF("da", "db")
    val nodes = (0L until 30L).toDF("id")
    val star = Components.minLabelStar(e, nodes).as[(Long, Long)].collect().toMap
    val plain = Components.minLabel(e, nodes).as[(Long, Long)].collect().toMap
    assert(star == plain)
  }

  test("minLabelStar agrees with driver union-find across seeded shapes") {
    // independent reference: classic union-find with path compression
    def unionFind(n: Int, es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // root via repeated find = component min (union always keeps min)
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- Seq(1, 5, 9, 13)) {
      val rnd = new scala.util.Random(seed)
      val n = 50
      val density = seed % 3 + 1
      val es = ((0 until n * density / 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        (0L until 20L).sliding(2).map(p => (p(0), p(1)))) // path segment
        .filter { case (a, b) => a != b }.toSeq
      val got = Components.minLabelStar(es.toDF("da", "db"), (0L until n.toLong).toDF("id"))
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(n, es), s"seed $seed diverged from union-find")
    }
  }

  test("incrementalForest equals one-shot contraction across random edge splits") {
    val rnd = new scala.util.Random(23)
    // sparse random graph (forest-ish + some cycles) over 60 nodes
    val es = ((0 until 50).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)) ++
      (0L until 30L).sliding(2).map(p => (p(0), p(1)))) // plus a path segment
      .filter { case (a, b) => a != b }.toSeq
    val nodes = (0L until 60L).toDF("id")
    val oneShot = Components.minLabelStar(es.toDF("da", "db"), nodes)
      .as[(Long, Long)].collect().toMap
    // fold in 3 arbitrary batches
    val batches = es.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    var forest = spark.emptyDataFrame
      .sparkSession.range(0).select(col("id").as("da"), col("id").as("db"))
    for (b <- batches)
      forest = Components.incrementalForest(forest, b.toDF("da", "db")).localCheckpoint()
    val inc = nodes
      .join(forest.select(col("da").as("id"), col("db").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("lbl"))
      .as[(Long, Long)].collect().toMap
    assert(inc == oneShot)
  }

  test("sssp: multi-hop relaxation beats the direct edge; unreached nodes absent") {
    // 1—2 (w1), 2—3 (w1), 1—3 (w10): dist(3) must be 2 via the relay,
    // not 10 direct; 4—5 is a disconnected island (absent from source 1)
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 10L), (4L, 5L, 1L))
      .toDF("a", "b", "w")
    val src = spark.range(1).select(lit(1L).as("node"), lit(0L).as("d"))
    val got = Graph.sssp(e, src, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // undirected: distances from the island's side too
    val src4 = spark.range(1).select(lit(5L).as("node"), lit(0L).as("d"))
    assert(Graph.sssp(e, src4, rounds = 5).as[(Long, Long)].collect().toMap ===
      Map(5L -> 0L, 4L -> 1L))
    // fixed rounds: with 1 round the relay is not yet found
    assert(Graph.sssp(e, src, rounds = 1).as[(Long, Long)].collect().toMap
      .apply(3L) === 10L)
  }

  test("summarize: groups collapse to pair counts with member sizes, hand-checked") {
    // triangle {1,2,3} in group x, pair {4,5} in group y, bridge 3-4
    val e = edges((1, 2), (1, 3), (2, 3), (4, 5), (3, 4))
    val v = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y")).toDF("node", "grp")
    val r = Graph.summarize(e, v).orderBy("ga", "gb")
      .as[(String, String, Long, Long, Long)].collect()
    assert(r === Array(("x", "x", 3L, 3L, 3L), ("x", "y", 1L, 3L, 2L),
      ("y", "y", 1L, 2L, 2L)))
  }

  test("scatterGather: one-round neighbor sum, hand-checked; no-message vertices keep value") {
    // directed: 1→2, 1→3, 2→3; vertex 1 receives nothing
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val v = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("node", "value")
    val r = VertexCentric.scatterGather(e, v,
        msgExpr = col("value"),
        aggMsg = sum,
        updateExpr = (old, g) => coalesce(g, old),
        rounds = 1)
      .as[(Long, Double)].collect().toMap
    assert(r === Map(1L -> 10.0, 2L -> 10.0, 3L -> 30.0)) // 3 gathers 10+20
  }

  test("scatterGather fold-style gather: label propagation on the engine equals the library") {
    // collect_list gather + an array-expression apply — the reference's
    // GatherFunction-over-the-message-iterable shape
    val rnd = new scala.util.Random(13)
    val es = (0 until 150).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*)
    val und = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
    val init = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("value"))
    val eng = VertexCentric.scatterGather(und, init,
        msgExpr = col("value"),
        aggMsg = collect_list,
        updateExpr = (old, g) => when(g.isNull, old).otherwise(
          -array_max(transform(array_distinct(g), x =>
            struct(size(filter(g, y => y === x)).as("c"), (-x).as("nl"))))
            .getField("nl")),
        rounds = 2)
      .as[(Long, Long)].collect().toMap
    val lib = Graph.labelPropagation(e, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(eng === lib)
  }

  test("ssspOnEngine reproduces Graph.sssp exactly on a seeded random weighted graph") {
    val rnd = new scala.util.Random(11)
    val es = (0 until 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*).withColumn("w", lit(1L) + (col("a") * 7 + col("b")) % 5)
    val source = e.select(explode(array(col("a"), col("b"))).as("v"))
      .agg(min("v").as("node")).select(col("node"), lit(0L).as("d"))
    val lib = Graph.sssp(e, source, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val eng = VertexCentric.ssspOnEngine(e, source, rounds = 4)
      .select(col("node"), col("d").cast("long").as("d"))
      .as[(Long, Long)].collect().toMap
    assert(eng === lib)
  }

  test("coOccurrenceEdges: cap drops hot blocks, support filters incidental pairs") {
    // block X: members 1..5 appearing together twice (support 2 via two blocks)
    val rows =
      (for (b <- Seq("x1", "x2"); u <- 1L to 5L) yield (b, u)) ++
        // hot block with 20 members — must be dropped entirely at cap 10
        (for (u <- 100L to 119L) yield ("hot", u)) ++
        // pair (6,7) co-occurs once only — below support 2
        Seq(("y1", 6L), ("y1", 7L))
    val m = rows.toDF("blk", "id")
    val e = Graph.coOccurrenceEdges(m, Seq("blk"), "id", blockCap = 10, minSupport = 2)
      .as[(Long, Long)].collect().toSet
    assert(e == (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)).toSet)
  }

  test("kCorePeel: K4 with a tail — 2-core strips the tail, 3-core keeps only the clique") {
    // K4 on 1-4, path tail 4-5-6, and a triangle 7-8-9 hanging off 1-7
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5), (5, 6), (1, 7), (7, 8), (7, 9), (8, 9))
    val two = Graph.kCorePeel(e, 2, 10).as[(Long, Long)].collect().toSet
    // 2-core: the path tail 4-5-6 peels off (6 has degree 1, then 5);
    // the 1-7 bridge survives because both endpoints sit in cycles
    assert(two == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 7L), (7L, 8L), (7L, 9L), (8L, 9L)))
    // 3-core: triangle 7-8-9 (degree 2 within itself) and the bridge go;
    // only K4 remains
    val three = Graph.kCorePeel(two.toSeq.toDF("a", "b"), 3, 10)
      .as[(Long, Long)].collect().toSet
    assert(three == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // 4-core of K4 is empty (degree 3 < 4) — and the peel of an
    // already-empty frame stays empty
    val four = Graph.kCorePeel(three.toSeq.toDF("a", "b"), 4, 10)
    assert(four.count() == 0L)
    assert(Graph.kCorePeel(four, 5, 10).count() == 0L)
  }

  test("kCorePeel equals the naive driver-side peel on seeded random graphs") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 3) {
      val es = (0 until 120)
        .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      for (k <- Seq(2, 3, 4)) {
        // naive fixpoint peel on the driver
        var cur = es.toSet
        var changed = true
        while (changed) {
          val deg = cur.toSeq.flatMap { case (a, b) => Seq(a, b) }
            .groupBy(identity).map { case (v, vs) => v -> vs.size }
          val next = cur.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
          changed = next != cur
          cur = next
        }
        val got = Graph.kCorePeel(es.toDF("a", "b"), k, 10)
          .as[(Long, Long)].collect().toSet
        assert(got === cur, s"trial $trial k=$k")
      }
    }
  }

  test("kCorePeel: cascades resolve within the round budget — long path peels inward") {
    // path 1-2-...-12 plus triangle 20-21-22: the 2-core peel eats the
    // path one endpoint-pair per round (a 6-round cascade), the
    // triangle survives untouched
    val path = (1L to 11L).map(i => (i, i + 1))
    val e = edges(path ++ Seq((20L, 21L), (20L, 22L), (21L, 22L)): _*)
    val core = Graph.kCorePeel(e, 2, 10).as[(Long, Long)].collect().toSet
    assert(core == Set((20L, 21L), (20L, 22L), (21L, 22L)))
  }

  test("betweennessSampled: path P4 with all nodes as pivots — exact Brandes") {
    // 1-2-3-4: interior nodes carry every crossing pair; with D in
    // micro-units and all four pivots, bc(2) = bc(3) = 4.0 (directional
    // accumulation), endpoints 0 (node != seed rows only)
    val e = edges((1, 2), (2, 3), (3, 4))
    val seeds = Seq(1L, 2L, 3L, 4L).toDF("seed")
    val out = Graph.betweennessSampled(e, seeds, rounds = 6)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(2L)._2 === 4000000L)
    assert(out(2L)._3 === 4.0)
    assert(out(3L)._3 === 4.0)
    assert(out(1L)._3 === 0.0)
    assert(out(4L)._3 === 0.0)
  }

  test("betweennessSampled: diamond splits path mass by sigma") {
    // 1-2-4, 1-3-4 (diamond): two shortest 1->4 paths, sigma(4)=2;
    // from pivot 1: D(2) = floor(1*(1e6+0)/2) = 500000, same for 3
    val e = edges((1, 2), (1, 3), (2, 4), (3, 4))
    val seeds = Seq(1L).toDF("seed")
    val out = Graph.betweennessSampled(e, seeds, rounds = 6)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(2L)._2 === 500000L)
    assert(out(3L)._2 === 500000L)
    assert(out(4L)._2 === 0L)
  }

  test("personalizedPageRank: hand-computed integer walk on a single edge") {
    // seed {1} on edge 1-2 (both deg 1):
    //   p0:  1 -> 1e9
    //   p1:  2 -> (1e9*85)//100 = 85e7;  1 -> restart 15e7
    //   p2:  1 -> (85e7*85)//100 + 15e7 = 872_500_000;  2 -> (15e7*85)//100 = 127_500_000
    val e = edges((1L, 2L))
    val seeds = Seq(1L).toDF("node")
    val out = Graph.personalizedPageRank(e, seeds, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 872500000L, 2L -> 127500000L))
  }

  test("personalizedPageRank: mass stays in the seed component, sparsity holds") {
    // two disconnected triangles; seeds in the first only
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val seeds = Seq(1L, 2L).toDF("node")
    val out = Graph.personalizedPageRank(e, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L)) // other component never materializes
    assert(out.values.sum <= 1000000000L) // floor leaks only shrink the mass
    assert(out(1L) > out(3L) && out(2L) > out(3L)) // seeds outrank the non-seed
  }
}
