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
    val e = coEdges(s, dir)
      .withColumn("w", lit(1L) + (col("a") + col("b")) % 7)
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

  val all: Seq[Q] = Seq(
    Q("q_graph_triangles", graphTriangles, Some(graphTrianglesSql)),
    Q("q_graph_labelprop", graphLabelProp, Some(graphLabelPropSql)),
    Q("q_graph_components", graphComponents, Some(graphComponentsSql)),
    Q("q_graph_sssp", graphSssp, Some(graphSsspSql))
  )
}
