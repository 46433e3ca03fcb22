package graft.queries

import graft.Tables
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-library queries ([[graft.operators.Graph]]) over the user
  * co-engagement graph derived from `events`: users are linked when
  * they acted in the same (event_type, hour) block at least 4 times,
  * with blocks over 64 members dropped before pair generation (the
  * cap/support levers that keep the constructor bounded at scale).
  * Mirrors the reference's Gelly library algorithms
  * (flink-gelly `TriangleEnumerator.java`, `LabelPropagation.java`)
  * on top of plain joins + aggregations.
  */
object GraphQueries {

  private val BlockCap = 64
  private val MinSupport = 4

  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("user_id"))
    Graph.coOccurrenceEdges(m, Seq("event_type", "h"), "user_id", BlockCap, MinSupport)
  }

  private val edgesCte: String =
    """, m AS (SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id FROM ev),
      |s AS (SELECT event_type, h, count(*) AS n FROM m GROUP BY 1, 2),
      |k AS (SELECT m.* FROM m JOIN s USING (event_type, h) WHERE s.n <= 64),
      |pair AS (SELECT ka.user_id AS a, kb.user_id AS b, count(*) AS sup
      |         FROM k ka JOIN k kb ON kb.event_type = ka.event_type AND kb.h = ka.h
      |         WHERE ka.user_id < kb.user_id GROUP BY 1, 2),
      |e AS (SELECT a, b FROM pair WHERE sup >= 4)""".stripMargin

  /** Per-node triangle count + clustering coefficient, degree-ordered
    * enumeration; the DuckDB oracle counts the same triangles with the
    * naive canonical u<v<w three-way self-join (each triangle once on
    * both sides, by different routes — route-independence IS the
    * check).
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    Graph.triangleStats(coEdges(s, dir)).orderBy("node")

  val graphTrianglesSql: String =
    Tables.eventsCte + edgesCte +
      """
        |, deg AS (SELECT v, count(*)::BIGINT AS degree
        |          FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT v, count(*)::BIGINT AS tri_cnt
        |       FROM (SELECT u AS v FROM tri UNION ALL SELECT v FROM tri
        |             UNION ALL SELECT w FROM tri) GROUP BY 1)
        |SELECT deg.v AS node, degree, coalesce(tri_cnt, 0)::BIGINT AS tri_cnt,
        |  CASE WHEN degree < 2 THEN 0.0
        |       ELSE round((coalesce(tri_cnt, 0) * 2)::DOUBLE
        |                  / (degree * (degree - 1))::DOUBLE, 6) END AS coeff
        |FROM deg LEFT JOIN pn ON pn.v = deg.v ORDER BY node""".stripMargin

  /** Two rounds of synchronous label propagation over the same graph;
    * the oracle unrolls both rounds as CTEs with the identical
    * most-frequent-then-smallest tie-break.
    */
  def graphLabelProp(s: SparkSession, dir: String): DataFrame =
    Graph.labelPropagation(coEdges(s, dir), rounds = 2).orderBy("node")

  val graphLabelPropSql: String =
    Tables.eventsCte + edgesCte +
      """
        |, nbrs AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |l0 AS (SELECT v AS node, v AS label
        |       FROM (SELECT DISTINCT a AS v FROM e UNION SELECT DISTINCT b FROM e)),
        |c1 AS (SELECT nbrs.u, l0.label, count(*) AS cnt
        |       FROM nbrs JOIN l0 ON l0.node = nbrs.v GROUP BY 1, 2),
        |l1 AS (SELECT u AS node, label FROM
        |         (SELECT u, label,
        |            row_number() OVER (PARTITION BY u ORDER BY cnt DESC, label ASC) AS rn
        |          FROM c1) WHERE rn = 1),
        |c2 AS (SELECT nbrs.u, l1.label, count(*) AS cnt
        |       FROM nbrs JOIN l1 ON l1.node = nbrs.v GROUP BY 1, 2),
        |l2 AS (SELECT u AS node, label FROM
        |         (SELECT u, label,
        |            row_number() OVER (PARTITION BY u ORDER BY cnt DESC, label ASC) AS rn
        |          FROM c2) WHERE rn = 1)
        |SELECT node, label FROM l2 ORDER BY node""".stripMargin

  /** Connected components over a deliberately PATH-shaped graph — each
    * user's events chained in (ts, event_id) order, so every component
    * is a ~70-node path (the adversarial shape for neighborhood-min
    * contraction, where the min label crawls O(diameter) rounds). The
    * star-contraction engine converges in O(log n) rounds regardless;
    * the oracle derives each component independently from the chain
    * CONSTRUCTION (a user's chain is connected by construction, and
    * event ids are globally unique, so component = min event_id per
    * user) — the algorithm itself sees only the anonymous edge list.
    */
  def graphComponents(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val edges = ev
      .select(col("event_id").as("a"), lag("event_id", 1).over(w).as("b"))
      .filter(col("b").isNotNull)
    val nodes = ev.select(col("event_id").as("id"))
    Graph.connectedComponents(edges, nodes)
      .groupBy("component").agg(count(lit(1)).cast("long").as("size"))
      .orderBy("component")
  }

  val graphComponentsSql: String =
    Tables.eventsCte +
      """
        |SELECT min(event_id) AS component, count(*)::BIGINT AS size
        |FROM ev GROUP BY user_id ORDER BY component""".stripMargin

  /** Single-source shortest paths over the co-engagement graph —
    * deterministic integer weights `1 + (a+b) % 7`, source = the
    * global minimum node (a one-row aggregate, broadcast into the
    * round-0 frontier, never a collected scalar), 6 fixed Bellman–Ford
    * rounds ([[Graph.sssp]] — the Gelly quickstart algorithm). The
    * oracle unrolls the identical 6-round min-plus recurrence as CTEs,
    * like the PageRank oracle.
    */
  def graphSssp(s: SparkSession, dir: String): DataFrame = {
    // the weighted edge frame feeds BOTH the source aggregate and the
    // relaxation loop — one materialization of the constructor
    val e = graft.operators.Funnel.stageLazy(coEdges(s, dir)
      .withColumn("w", lit(1L) + (col("a") + col("b")) % 7))
    val source = e
      .select(explode(array(col("a"), col("b"))).as("v"))
      .agg(min("v").as("node"))
      .select(col("node"), lit(0L).as("d"))
    Graph.sssp(e, source, rounds = 6)
      .select(col("node"), col("d").cast("long").as("dist"))
      .orderBy("node")
  }

  private val SsspRounds = 6

  val graphSsspSql: String =
    Tables.eventsCte + edgesCte +
      """
        |, n AS (SELECT a AS u, b AS v, 1 + (a + b) % 7 AS w FROM e
        |        UNION ALL SELECT b, a, 1 + (a + b) % 7 FROM e),
        |d0 AS (SELECT min(v) AS node, 0 AS d
        |       FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e))""".stripMargin +
      (1 to SsspRounds).map { k =>
        s""",
           |d$k AS (SELECT node, min(d) AS d FROM (
           |  SELECT node, d FROM d${k - 1}
           |  UNION ALL
           |  SELECT n.v AS node, d${k - 1}.d + n.w AS d
           |  FROM d${k - 1} JOIN n ON n.u = d${k - 1}.node
           |) GROUP BY node)""".stripMargin
      }.mkString +
      s"""
         |SELECT node, d::BIGINT AS dist FROM d$SsspRounds ORDER BY node""".stripMargin

  /** Harmonic centrality by k-source approximation (Marchiori–Latora
    * 2000's harmonic form; the k-seed sampling posture of
    * Eppstein–Wang 2004 — exact all-pairs BFS is O(V·E) and does not
    * survive 100×, five pinned sources do): per node,
    * Σ_seeds 1/d(seed, node) over the 5 smallest node ids as seeds,
    * hop distances from SIX multi-source BFS rounds carried in ONE
    * (seed, node) frame ([[Graph.msBfs]]). INTEGER-EXACT by
    * construction: with d ≤ 6 every 1/d clears through lcm(1..6) = 60,
    * so the score is the BIGINT Σ 60/d and the emitted harmonic is one
    * division. Unreachable (seed, node) pairs contribute nothing —
    * absent rows, not infinities. Oracle = the 6-round min-plus
    * unrolled over the (seed, node) grid.
    */
  def graphHarmonic(s: SparkSession, dir: String): DataFrame = {
    val e = graft.operators.Funnel.stageLazy(coEdges(s, dir))
    val seeds = e.select(explode(array(col("a"), col("b"))).as("v")).distinct()
      .orderBy("v").limit(5).select(col("v").as("seed"))
    Graph.msBfs(e, seeds, rounds = 6)
      .filter(col("d") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_src"),
        sum((lit(60.0) / col("d")).cast("long")).as("h60"))
      .select(col("node"), col("n_src").cast("long").as("n_src"),
        col("h60").cast("long").as("h60"),
        (col("h60").cast("double") / 60.0).as("harmonic"))
      .orderBy("node")
  }

  private val BfsRounds = 6

  val graphHarmonicSql: String =
    Tables.eventsCte + edgesCte +
      """
        |, vs AS (SELECT DISTINCT v FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)),
        |seeds AS (SELECT v AS seed FROM vs ORDER BY v LIMIT 5),
        |n AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |d0 AS (SELECT seed, seed AS node, 0::BIGINT AS d FROM seeds)""".stripMargin +
      (1 to BfsRounds).map { k =>
        s""",
           |d$k AS (SELECT seed, node, min(d) AS d FROM (
           |  SELECT seed, node, d FROM d${k - 1}
           |  UNION ALL
           |  SELECT seed, n.v AS node, d${k - 1}.d + 1 AS d
           |  FROM d${k - 1} JOIN n ON n.u = d${k - 1}.node
           |) GROUP BY 1, 2)""".stripMargin
      }.mkString +
      s"""
         |SELECT node, count(*)::BIGINT AS n_src, sum(60 // d)::BIGINT AS h60,
         |  sum(60 // d)::DOUBLE / 60.0 AS harmonic
         |FROM d$BfsRounds WHERE d > 0 GROUP BY node ORDER BY node""".stripMargin

  /** Sampled Brandes betweenness ([[Graph.betweennessSampled]]): the
    * 5 smallest node ids as pivots (the harmonic-centrality seed rule),
    * 6-hop truncation, dependency accumulation quantized to integer
    * micro-units so every cross-row sum is an integer sum. The oracle
    * replays all three passes — the min-plus distance chain, the
    * per-level σ recurrence, and the descending floor-quantized
    * dependency walk — unrolled over the same (seed, node) frames.
    */
  def graphBetweenness(s: SparkSession, dir: String): DataFrame = {
    val e = graft.operators.Funnel.stageLazy(coEdges(s, dir))
    val seeds = e.select(explode(array(col("a"), col("b"))).as("v")).distinct()
      .orderBy("v").limit(5).select(col("v").as("seed"))
    Graph.betweennessSampled(e, seeds, rounds = BfsRounds)
  }

  lazy val graphBetweennessSql: String = {
    val R = BfsRounds
    val sigma = (1 to R).map { k =>
      s""",
         |sg$k AS MATERIALIZED (SELECT seed, node, sum(sig)::HUGEINT AS sig FROM (
         |  SELECT sg.seed, n.v AS node, sg.sig
         |  FROM sg${k - 1} sg JOIN n ON n.u = sg.node
         |  JOIN (SELECT seed, node FROM d$R WHERE d = $k) lv
         |    ON lv.seed = sg.seed AND lv.node = n.v
         |) GROUP BY 1, 2)""".stripMargin
      }.mkString
    val dep = ((R - 1) to 0 by -1).map { k =>
      s""",
         |dp$k AS MATERIALIZED (
         |  SELECT l.seed, l.node, coalesce(c.s, 0)::BIGINT AS dw FROM sg$k l
         |  LEFT JOIN (
         |    SELECT v.seed, v.node,
         |      sum((v.sig * (1000000 + w.dw)) // sw.sig)::BIGINT AS s
         |    FROM sg$k v
         |    JOIN n ON n.u = v.node
         |    JOIN sg${k + 1} sw ON sw.seed = v.seed AND sw.node = n.v
         |    JOIN dp${k + 1} w ON w.seed = v.seed AND w.node = n.v
         |    GROUP BY 1, 2) c ON c.seed = l.seed AND c.node = l.node)""".stripMargin
    }.mkString
    Tables.eventsCte + edgesCte +
      """
        |, vs AS (SELECT DISTINCT v FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)),
        |seeds AS MATERIALIZED (SELECT v AS seed FROM vs ORDER BY v LIMIT 5),
        |n AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |d0 AS (SELECT seed, seed AS node, 0::BIGINT AS d FROM seeds)""".stripMargin +
      (1 to R).map { k =>
        s""",
           |d$k AS MATERIALIZED (SELECT seed, node, min(d) AS d FROM (
           |  SELECT seed, node, d FROM d${k - 1}
           |  UNION ALL
           |  SELECT seed, n.v AS node, d${k - 1}.d + 1 AS d
           |  FROM d${k - 1} JOIN n ON n.u = d${k - 1}.node
           |) GROUP BY 1, 2)""".stripMargin
      }.mkString +
      s""",
         |sg0 AS (SELECT seed, seed AS node, 1::HUGEINT AS sig FROM seeds)""".stripMargin +
      sigma +
      s""",
         |dp$R AS (SELECT seed, node, 0::BIGINT AS dw FROM sg$R)""".stripMargin +
      dep +
      s"""
         |SELECT node, sum(dw)::BIGINT AS bc1e6, sum(dw)::DOUBLE / 1e6 AS bc
         |FROM (${(0 until R).map(k => s"SELECT * FROM dp$k").mkString(" UNION ALL ")})
         |WHERE node <> seed GROUP BY node ORDER BY node""".stripMargin
  }

  /** Three fixed HITS rounds over the co-engagement edges directed
    * low→high id (the canonical orientation — every node can hold both
    * roles, which is exactly what distinguishes hub from authority
    * scores on an asymmetric degree distribution). Scores stay integer
    * path counts until one final sum-normalization ([[Graph.hits]]);
    * the oracle unrolls the identical authorities-then-hubs recurrence.
    */
  def graphHits(s: SparkSession, dir: String): DataFrame =
    Graph.hits(coEdges(s, dir).select(col("a").as("src"), col("b").as("dst")),
      rounds = HitsRounds).orderBy("node")

  private val HitsRounds = 3

  val graphHitsSql: String =
    Tables.eventsCte + edgesCte +
      """
        |, nodes AS (SELECT DISTINCT v AS node
        |            FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)),
        |h0 AS (SELECT node, 1::BIGINT AS hub FROM nodes)""".stripMargin +
      (1 to HitsRounds).map { k =>
        s""",
           |a$k AS (SELECT n.node, coalesce(s.x, 0)::BIGINT AS auth
           |        FROM nodes n LEFT JOIN (
           |          SELECT e.b AS node, sum(h.hub)::BIGINT AS x
           |          FROM e JOIN h${k - 1} h ON h.node = e.a GROUP BY 1) s USING (node)),
           |h$k AS (SELECT n.node, coalesce(s.x, 0)::BIGINT AS hub
           |        FROM nodes n LEFT JOIN (
           |          SELECT e.a AS node, sum(a.auth)::BIGINT AS x
           |          FROM e JOIN a$k a ON a.node = e.b GROUP BY 1) s USING (node))""".stripMargin
      }.mkString +
      s"""
         |, tot AS (SELECT (SELECT sum(hub) FROM h$HitsRounds)::BIGINT AS th,
         |                 (SELECT sum(auth) FROM a$HitsRounds)::BIGINT AS ta)
         |SELECT h.node, h.hub AS hub_c, a.auth AS auth_c,
         |  round(h.hub / t.th, 6) AS hub_n, round(a.auth / t.ta, 6) AS auth_n
         |FROM h$HitsRounds h JOIN a$HitsRounds a USING (node) CROSS JOIN tot t
         |ORDER BY node""".stripMargin

  private val pairsCte: String =
    """
      |, nbrs AS (SELECT a AS c, b AS n FROM e UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT c AS v, count(*)::BIGINT AS deg FROM nbrs GROUP BY 1),
      |wedge AS (SELECT x.c, x.n AS u, y.n AS w
      |          FROM nbrs x JOIN nbrs y ON y.c = x.c AND x.n < y.n)""".stripMargin

  /** Jaccard index for every user pair sharing a co-engagement
    * neighbor; exact integer intersection/union, center-keyed wedge
    * enumeration ([[Graph.jaccardIndex]]).
    */
  def graphJaccard(s: SparkSession, dir: String): DataFrame =
    Graph.jaccardIndex(coEdges(s, dir)).orderBy("u", "w")

  val graphJaccardSql: String =
    Tables.eventsCte + edgesCte + pairsCte +
      """
        |, inter AS (SELECT u, w, count(*)::BIGINT AS cn FROM wedge GROUP BY 1, 2)
        |SELECT i.u, i.w, i.cn, (du.deg + dw.deg - i.cn)::BIGINT AS uni,
        |  round(i.cn / (du.deg + dw.deg - i.cn), 6) AS jaccard
        |FROM inter i JOIN deg du ON du.v = i.u JOIN deg dw ON dw.v = i.w
        |ORDER BY u, w""".stripMargin

  /** Adamic–Adar link prediction over the same wedges, center weights
    * 1/ln(deg) quantized to integers at 1e9 so the per-pair sums are
    * engine-exact ([[Graph.adamicAdar]]).
    */
  def graphAdamicAdar(s: SparkSession, dir: String): DataFrame =
    Graph.adamicAdar(coEdges(s, dir)).orderBy("u", "w")

  val graphAdamicAdarSql: String =
    Tables.eventsCte + edgesCte + pairsCte +
      """
        |, wt AS (SELECT v AS c, CAST(round(1e9 / ln(deg)) AS BIGINT) AS wt
        |         FROM deg WHERE deg >= 2)
        |SELECT wg.u, wg.w, count(*)::BIGINT AS cn, sum(wt.wt)::BIGINT AS aa_e9
        |FROM wedge wg JOIN wt ON wt.c = wg.c
        |GROUP BY 1, 2 ORDER BY u, w""".stripMargin

  /** Degree assortativity (Newman 2002, Phys. Rev. Lett. 89.208701) —
    * the Pearson correlation of degrees across edges, the one-number
    * answer to "do hubs link to hubs?". Undirected closed form: each
    * edge contributes both orientations, so Σx = Σy and Σx² = Σy² and
    * r = (2m·2Σd_a d_b − (Σ(d_a+d_b))²) / (2m·Σ(d_a²+d_b²) −
    * (Σ(d_a+d_b))²) — NO square root, a ratio of two integers. The
    * four sums come from ONE pass over the degree-joined edge list
    * (degrees broadcast); cross products are taken in DECIMAL(38,0) so
    * the arithmetic is exact at any edge count (BIGINT would overflow
    * near m ~ 10¹² edges).
    */
  def graphAssortativity(s: SparkSession, dir: String): DataFrame = {
    val e = graft.operators.Funnel.stageLazy(coEdges(s, dir))
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val sums = e
      .join(broadcast(deg.select(col("v").as("a"), col("deg").as("da"))), "a")
      .join(broadcast(deg.select(col("v").as("b"), col("deg").as("db"))), "b")
      .agg(count(lit(1)).as("m"),
        sum(col("da") + col("db")).cast("decimal(38,0)").as("sxy"),
        sum(col("da") * col("db")).cast("decimal(38,0)").as("sprod"),
        sum(col("da") * col("da") + col("db") * col("db")).cast("decimal(38,0)").as("ssq"))
    sums.select(col("m").cast("long").as("m"),
      round(((lit(2) * col("m") * lit(2) * col("sprod") - col("sxy") * col("sxy"))
        .cast("double")
        / (lit(2) * col("m") * col("ssq") - col("sxy") * col("sxy")).cast("double")), 6)
        .as("assortativity"))
  }

  val graphAssortativitySql: String =
    Tables.eventsCte + edgesCte +
      """
        |, deg AS (SELECT v, count(*)::BIGINT AS deg
        |          FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |j AS (SELECT da.deg AS da, db.deg AS db
        |      FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
        |sm AS (SELECT count(*)::BIGINT AS m, sum(da + db) AS sxy,
        |        sum(da * db) AS sprod, sum(da * da + db * db) AS ssq FROM j)
        |SELECT m, round((2 * m * 2 * sprod - sxy * sxy)::DOUBLE
        |  / (2 * m * ssq - sxy * sxy)::DOUBLE, 6) AS assortativity
        |FROM sm""".stripMargin

  /** One-row vertex metrics (counts, average/max degree, triplets) —
    * the analytic summary of [[Graph.vertexMetrics]].
    */
  def graphMetrics(s: SparkSession, dir: String): DataFrame =
    Graph.vertexMetrics(coEdges(s, dir))

  val graphMetricsSql: String =
    Tables.eventsCte + edgesCte + pairsCte +
      """
        |SELECT (SELECT count(*) FROM deg)::BIGINT AS vertices,
        |       (SELECT count(*) FROM e)::BIGINT AS edges,
        |       round(2.0 * (SELECT count(*) FROM e) / (SELECT count(*) FROM deg), 6)
        |         AS avg_degree,
        |       (SELECT max(deg) FROM deg)::BIGINT AS max_degree,
        |       ((SELECT sum(deg * (deg - 1)) FROM deg) // 2)::BIGINT AS triplets""".stripMargin

  /** Undirected triadic census via the closed-form identities over
    * (n, e, triplets, triangles) — [[Graph.triadicCensus]]; the oracle
    * recomputes triangles with the naive three-way join and applies
    * the same identities.
    */
  def graphTriads(s: SparkSession, dir: String): DataFrame =
    Graph.triadicCensus(coEdges(s, dir))

  val graphTriadsSql: String =
    Tables.eventsCte + edgesCte + pairsCte +
      """
        |, t3c AS (SELECT count(*)::BIGINT AS t3
        |          FROM e e1 JOIN e e2 ON e2.a = e1.b
        |          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |base AS (SELECT (SELECT count(*) FROM deg)::BIGINT AS vertices,
        |                (SELECT count(*) FROM e)::BIGINT AS edges,
        |                ((SELECT sum(deg * (deg - 1)) FROM deg) // 2)::BIGINT AS triplets,
        |                (SELECT t3 FROM t3c) AS t3)
        |SELECT vertices, edges, triplets,
        |  ((vertices * (vertices - 1) * (vertices - 2)) // 6
        |    - (edges * (vertices - 2) - triplets * 2 + t3 * 3)
        |    - (triplets - t3 * 3) - t3)::BIGINT AS t0,
        |  (edges * (vertices - 2) - triplets * 2 + t3 * 3)::BIGINT AS t1,
        |  (triplets - t3 * 3)::BIGINT AS t2, t3::BIGINT AS t3
        |FROM base""".stripMargin

  /** The same SSSP computed on the GENERIC scatter-gather engine
    * ([[graft.operators.VertexCentric.ssspOnEngine]] — the Gelly
    * runtime surface, with SSSP as the reference's own quickstart
    * scatter-gather program). Shares `graphSsspSql` verbatim: the
    * engine must reproduce the hand-written library algorithm's rows
    * bit-for-bit.
    */
  def graphSsspSg(s: SparkSession, dir: String): DataFrame = {
    val e = graft.operators.Funnel.stageLazy(coEdges(s, dir)
      .withColumn("w", lit(1L) + (col("a") + col("b")) % 7))
    val source = e
      .select(explode(array(col("a"), col("b"))).as("v"))
      .agg(min("v").as("node"))
      .select(col("node"), lit(0L).as("d"))
    graft.operators.VertexCentric.ssspOnEngine(e, source, rounds = 6)
      .select(col("node"), col("d").cast("long").as("dist"))
      .orderBy("node")
  }

  /** Graph summarization by each user's dominant event type (most
    * frequent, ties to the alphabetically smallest — the deterministic
    * vertex-value assignment): the co-engagement graph collapses to a
    * handful of (type, type) summary rows with edge and member counts
    * ([[Graph.summarize]]).
    */
  def graphSummarize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type"))
    val values = Tables.events(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").as("node"), col("event_type").as("grp"))
    Graph.summarize(coEdges(s, dir), values).orderBy("ga", "gb")
  }

  val graphSummarizeSql: String =
    Tables.eventsCte + edgesCte +
      """
        |, vv AS (SELECT user_id AS node, event_type AS grp FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY count(*) DESC, event_type) AS rn
        |    FROM ev GROUP BY 1, 2) WHERE rn = 1),
        |mem AS (SELECT grp, count(*)::BIGINT AS members FROM vv GROUP BY 1),
        |se AS (SELECT least(va.grp, vb.grp) AS ga, greatest(va.grp, vb.grp) AS gb,
        |         count(*)::BIGINT AS n_edges
        |       FROM e JOIN vv va ON va.node = e.a JOIN vv vb ON vb.node = e.b
        |       GROUP BY 1, 2)
        |SELECT ga, gb, n_edges, ma.members AS na_members, mb.members AS nb_members
        |FROM se JOIN mem ma ON ma.grp = se.ga JOIN mem mb ON mb.grp = se.gb
        |ORDER BY ga, gb""".stripMargin

  /** Rounds each k-stage of the k-core peel unrolls — both engines run
    * EXACTLY this many peels (with a no-op early exit on the Spark
    * side), so equality is unconditional; the fixture peels converge in
    * ≤7 rounds per stage (measured at sf0.01, the adversarial draw
    * whose 5-core is empty).
    */
  private val KcoreRounds = 10

  /** Nested k-core decomposition for k = 2..5 over the co-engagement
    * graph ([[Graph.kCorePeel]]): since the (k+1)-core is a subgraph of
    * the k-core, each stage peels the PREVIOUS stage's survivor edges,
    * never restarting from the full graph — at 100 TB the expensive
    * stage is only the first one, and the loop's per-round work is one
    * degree aggregate + two semi-joins on an ever-shrinking frame.
    * Output per k: surviving node/edge counts plus the node-id sum as
    * an integer-exact membership checksum (counts alone could match by
    * coincidence; the sum pins WHICH nodes survived). The sf0.01 draw
    * empties at k=5, exercising the empty-core path end to end.
    */
  def graphKcore(s: SparkSession, dir: String): DataFrame = {
    var e = coEdges(s, dir)
    val stats = Seq(2, 3, 4, 5).map { k =>
      e = Graph.kCorePeel(e, k, KcoreRounds)
      val nodes = e.select(explode(array(col("a"), col("b"))).as("v")).distinct()
      nodes.agg(
          count(lit(1)).cast("long").as("n_nodes"),
          coalesce(sum(col("v")), lit(0L)).cast("long").as("node_sum"))
        .crossJoin(e.agg(count(lit(1)).cast("long").as("n_edges")))
        .select(lit(k).as("k"), col("n_nodes"), col("n_edges"), col("node_sum"))
    }
    stats.reduce(_ unionAll _).orderBy("k")
  }

  /** The oracle unrolls the identical nested peel: per k-stage,
    * [[KcoreRounds]] rounds of (degree-filter, edge-restrict) CTEs,
    * each stage chained off the previous stage's final edge frame.
    */
  val graphKcoreSql: String = {
    val sb = new StringBuilder(Tables.eventsCte + edgesCte)
    sb.append(",\ne_2_0 AS (SELECT a, b FROM e)")
    var prev = "e_2_0"
    for (k <- Seq(2, 3, 4, 5)) {
      if (k > 2) {
        sb.append(s",\ne_${k}_0 AS (SELECT a, b FROM $prev)")
        prev = s"e_${k}_0"
      }
      for (r <- 1 to KcoreRounds) {
        // MATERIALIZED is load-bearing: each round references the previous
        // frame several times, and DuckDB's default CTE inlining would
        // otherwise expand the 40-round chain exponentially (observed as
        // "Too many open files" on the base parquet scan)
        sb.append(
          s""",
             |n_${k}_$r AS MATERIALIZED (
             |  SELECT v FROM (SELECT a AS v FROM $prev UNION ALL SELECT b FROM $prev)
             |  GROUP BY v HAVING count(*) >= $k),
             |e_${k}_$r AS MATERIALIZED (
             |  SELECT p.a, p.b FROM $prev p
             |  JOIN n_${k}_$r na ON na.v = p.a JOIN n_${k}_$r nb ON nb.v = p.b)""".stripMargin)
        prev = s"e_${k}_$r"
      }
      sb.append(
        s""",
           |v_$k AS (SELECT DISTINCT v FROM (SELECT a AS v FROM e_${k}_$KcoreRounds
           |  UNION ALL SELECT b FROM e_${k}_$KcoreRounds)),
           |stat_$k AS (SELECT $k AS k, (SELECT count(*) FROM v_$k)::BIGINT AS n_nodes,
           |  (SELECT count(*) FROM e_${k}_$KcoreRounds)::BIGINT AS n_edges,
           |  coalesce((SELECT sum(v) FROM v_$k), 0)::BIGINT AS node_sum)""".stripMargin)
    }
    sb.append("\nSELECT * FROM stat_2 UNION ALL SELECT * FROM stat_3 ")
    sb.append("UNION ALL SELECT * FROM stat_4 UNION ALL SELECT * FROM stat_5 ORDER BY k")
    sb.toString
  }

  /** Personalized PageRank from the three smallest user ids (see
    * [[graft.operators.Graph.personalizedPageRank]]): 4 integer-unit
    * power-iteration rounds over the co-engagement graph — the
    * seed-expansion / related-users primitive. The oracle unrolls the
    * rounds as CTEs over the identical integer walk (floor-division
    * edge flows, 85-div-100 damping, 15e7-div-|S| restart), so every
    * r9 cell is exact.
    */
  def graphPpr(s: SparkSession, dir: String): DataFrame = {
    val e = coEdges(s, dir)
    val nodes = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node"))).distinct()
    val seeds = nodes.orderBy("node").limit(3)
    Graph.personalizedPageRank(e, seeds, rounds = 4).orderBy("node")
  }

  val graphPprSql: String = {
    val iter = (i: Int) =>
      s"""p$i AS (SELECT node, r9 FROM (
         |  SELECT coalesce(inb.node, sd.node) AS node,
         |    ((coalesce(inb.m9, 0) * 85) // 100
         |      + CASE WHEN sd.node IS NOT NULL THEN 150000000 // ns.ns ELSE 0 END)::BIGINT AS r9
         |  FROM (SELECT g.dst AS node, sum(p.r9 // g.deg)::BIGINT AS m9
         |        FROM p${i - 1} p JOIN degd g ON p.node = g.src GROUP BY 1) inb
         |  FULL JOIN seeds sd ON sd.node = inb.node CROSS JOIN ns) WHERE r9 > 0)""".stripMargin
    Tables.eventsCte + edgesCte +
      s"""
         |, dir AS (SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
         |degd AS (SELECT d.src, d.dst, g.deg FROM dir d
         |         JOIN (SELECT src, count(*)::BIGINT AS deg FROM dir GROUP BY 1) g USING (src)),
         |seeds AS (SELECT node FROM (SELECT DISTINCT src AS node FROM dir)
         |          ORDER BY node LIMIT 3),
         |ns AS (SELECT count(*)::BIGINT AS ns FROM seeds),
         |p0 AS (SELECT node, (1000000000 // ns)::BIGINT AS r9 FROM seeds, ns),
         |${(1 to 4).map(iter).mkString(",\n")}
         |SELECT node, r9, round(r9 / 1000000000.0, 6) AS rank
         |FROM p4 ORDER BY node""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_graph_ppr", graphPpr, Some(graphPprSql)),
    Q("q_graph_triangles", graphTriangles, Some(graphTrianglesSql)),
    Q("q_graph_labelprop", graphLabelProp, Some(graphLabelPropSql)),
    Q("q_graph_components", graphComponents, Some(graphComponentsSql)),
    Q("q_graph_sssp", graphSssp, Some(graphSsspSql)),
    Q("q_graph_harmonic", graphHarmonic, Some(graphHarmonicSql)),
    Q("q_graph_betweenness", graphBetweenness, Some(graphBetweennessSql)),
    Q("q_graph_sssp_sg", graphSsspSg, Some(graphSsspSql)),
    Q("q_graph_hits", graphHits, Some(graphHitsSql)),
    Q("q_graph_jaccard", graphJaccard, Some(graphJaccardSql)),
    Q("q_graph_adamic_adar", graphAdamicAdar, Some(graphAdamicAdarSql)),
    Q("q_graph_metrics", graphMetrics, Some(graphMetricsSql)),
    Q("q_graph_assortativity", graphAssortativity, Some(graphAssortativitySql)),
    Q("q_graph_triads", graphTriads, Some(graphTriadsSql)),
    Q("q_graph_summarize", graphSummarize, Some(graphSummarizeSql)),
    Q("q_graph_kcore", graphKcore, Some(graphKcoreSql))
  )
}
