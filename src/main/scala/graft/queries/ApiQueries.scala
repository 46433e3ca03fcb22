package graft.queries

import graft.{TableEnv, Tables}
import graft.functions.WeightedMean
import graft.operators.{Iterations, SideOutputs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** API-surface queries: SQL via TableEnv (§3.1), typed Dataset APIs —
  * cogroup, flatMapGroups table-aggregate, Aggregator UDAF,
  * mapPartitions (§2.2/2.5/2.10), driver-loop iterations (§2.12), side
  * outputs (§2.2).
  */
object ApiQueries {

  /** Pure-SQL query through the TableEnv facade — TPC-H Q3 shape
    * (shipping priority): the whole §3.1 stack exercised as SQL text.
    */
  def sqlRevenue(s: SparkSession, dir: String): DataFrame =
    TableEnv(s, dir).sqlQuery(
      """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)

  val sqlRevenueSql: String =
    """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, o_orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** SQL join-strategy hints (ref: the query-hint family — BROADCAST,
    * SHUFFLE_HASH, SHUFFLE_MERGE hint comments;
    * JoinStrategy.java / JoinHintsResolver.java): the hint text rides
    * the statement through the TableEnv facade into Catalyst's
    * ResolveJoinStrategyHints, overriding the planner's own choice —
    * here SHUFFLE_MERGE forces a sort-merge join where stats would
    * pick broadcast. The hint changes the PHYSICAL strategy only
    * (TableEnvSpec asserts all three strategies flip on hint text);
    * results are hint-invariant, which is exactly what the oracle
    * checks.
    */
  def joinHinted(s: SparkSession, dir: String): DataFrame =
    TableEnv(s, dir).sqlQuery(
      """SELECT /*+ SHUFFLE_MERGE(c) */ c_nationkey,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM customer c JOIN orders o ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)

  val joinHintedSql: String =
    """SELECT c_nationkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      |FROM customer c JOIN orders o ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** ref DataSetUtils.zipWithIndex:89 — contiguous ids over a
    * distributed dataset: the reference's two-pass design (count per
    * partition, broadcast offsets, number from offset) via
    * [[Indexing.zipWithIndex]] on a range-partitioned order. The total
    * order here is event_id; the oracle is the row_number the index
    * must equal.
    */
  def apiZipIndex(s: SparkSession, dir: String): DataFrame =
    graft.operators.Indexing.zipWithIndex(
        Tables.events(s, dir).select(col("event_id"), col("user_id")),
        Seq(col("event_id")), "idx")
      .select(col("idx"), col("event_id"), col("user_id"))
      .orderBy("idx")

  val apiZipIndexSql: String =
    Tables.eventsCte +
      """
        |SELECT row_number() OVER (ORDER BY event_id) - 1 AS idx, event_id, user_id
        |FROM ev ORDER BY idx""".stripMargin

  /** ref DataSetUtils.summarize:311 — the per-column profile
    * (NumericColumnSummary / StringColumnSummary) as ONE
    * map-side-combined aggregate pass via [[Profiling.summarize]].
    */
  def apiSummarize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.summarize(
        Tables(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"))
      .orderBy("col_name")

  val apiSummarizeSql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS col_name, 'numeric' AS kind, count($c)::BIGINT AS n,
         |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
         |  min($c)::DOUBLE AS min_v, max($c)::DOUBLE AS max_v,
         |  round(sum($c), 4) AS sum_v, round(avg($c), 6) AS mean,
         |  round(stddev_samp($c), 4) AS std,
         |  NULL::BIGINT AS min_len, NULL::BIGINT AS max_len, NULL::BIGINT AS empties
         |FROM lineitem""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col_name, 'string' AS kind, count($c)::BIGINT AS n,
         |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
         |  NULL::DOUBLE AS min_v, NULL::DOUBLE AS max_v, NULL::DOUBLE AS sum_v,
         |  NULL::DOUBLE AS mean, NULL::DOUBLE AS std,
         |  min(length($c))::BIGINT AS min_len, max(length($c))::BIGINT AS max_len,
         |  sum(CASE WHEN $c = '' THEN 1 ELSE 0 END)::BIGINT AS empties
         |FROM lineitem""".stripMargin
    Seq(num("l_quantity"), num("l_extendedprice"),
        str("l_returnflag"), str("l_linestatus"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
  }

  /** ref DataSetUtils.checksumHashCode:347 — count + order-insensitive
    * content checksum, with a PORTABLE md5-derived 32-bit row hash in
    * place of Java hashCode and an exact DECIMAL(38,0) sum in place of
    * the overflow-prone long accumulator. The checksum is emitted as
    * (sum % 2^62) cast to BIGINT — the internal accumulation stays
    * exact, the one mod at emission keeps the output in the integer
    * width class instead of DECIMAL (whose cross-engine
    * canonicalization proved unobservable).
    */
  def apiChecksum(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.checksumHashCode(
      Tables.events(s, dir),
      concat_ws("|", col("event_id"), col("user_id"), col("event_type")))

  val apiChecksumSql: String =
    Tables.eventsCte +
      """
        |SELECT count(*)::BIGINT AS cnt,
        |  (sum(('0x' || substr(md5(event_id::VARCHAR || '|' || user_id::VARCHAR || '|' || event_type), 1, 8))::BIGINT) % 4611686018427387904)::BIGINT AS checksum
        |FROM ev""".stripMargin

  /** ref DataSetUtils.sampleWithSize:232 — a fixed-size sample, made
    * DETERMINISTIC the distributed-reproducible way: rank rows by a
    * content hash and keep the k smallest (a uniform sample under the
    * random-oracle view of md5, identical on every engine and every
    * re-run — the property the reference's seeded samplers are after).
    * The k-cut is TakeOrdered: no global sort materializes.
    */
  def apiSampleSize(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
      .limit(500)
      .select(col("event_id"), col("event_type"))
      .orderBy("event_id")

  val apiSampleSizeSql: String =
    Tables.eventsCte +
      """
        |SELECT event_id, event_type FROM (
        |  SELECT event_id, event_type FROM ev
        |  ORDER BY md5(event_id::VARCHAR), event_id LIMIT 500)
        |ORDER BY event_id""".stripMargin

  /** Typed coGroup (ref: DataSet.coGroup:1118 → KeyValueGroupedDataset
    * .cogroup): both sides grouped on the key, user code sees the two
    * iterators per key.
    */
  def cogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).select(col("c_custkey")).as[Long]
    val ords = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
    cust.groupByKey(identity)
      .cogroup(ords.groupByKey(_._1)) { (k, cs, os) =>
        val prices = os.map(_._2).toSeq
        Iterator.single((k, cs.nonEmpty, prices.length.toLong, prices.sum))
      }
      .toDF("k", "has_cust", "n_orders", "total")
      .select(col("k"), col("has_cust"), col("n_orders"), round(col("total"), 2).as("total"))
      .orderBy("k")
  }

  val cogroupSql: String =
    """SELECT coalesce(c.k, o.k) AS k, c.k IS NOT NULL AS has_cust,
      |  coalesce(o.n, 0) AS n_orders, coalesce(o.t, 0) AS total
      |FROM (SELECT c_custkey AS k FROM customer) c
      |FULL JOIN (SELECT o_custkey AS k, count(*) AS n, round(sum(o_totalprice), 2) AS t
      |           FROM orders GROUP BY 1) o ON c.k = o.k
      |ORDER BY k""".stripMargin

  /** Table aggregate — one group, many output rows (ref:
    * Table.flatAggregate:1115, GroupTableAggFunction.java): emit the
    * top-2 orders per status from a flatMapGroups.
    */
  def flatAggregate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice")).as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (status, it) =>
        it.toSeq.sortBy { case (_, k, p) => (-p, k) }.take(2).zipWithIndex.map {
          case ((_, k, p), i) => (status, k, p, i + 1L)
        }.iterator
      }
      .toDF("status", "o_orderkey", "total", "rnk")
      .orderBy("status", "rnk")
  }

  val flatAggregateSql: String =
    """SELECT o_orderstatus AS status, o_orderkey, o_totalprice AS total, rnk FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 2 ORDER BY status, rnk""".stripMargin

  /** Typed Aggregator UDAF (ref: AggregateFunction contract §2.10):
    * quantity-weighted mean price per return flag.
    */
  def udafWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wm = new WeightedMean[(String, Double, Double)](_._2, _._3)
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .agg(wm.toColumn.name("wmean"))
      .toDF("l_returnflag", "wmean")
      .select(col("l_returnflag"), round(col("wmean"), 4).as("wmean"))
      .orderBy("l_returnflag")
  }

  val udafWeightedSql: String =
    """SELECT l_returnflag,
      |  round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 4) AS wmean
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** mapPartitions (ref: DataSet.mapPartition:237): per-partition
    * imperative parse with a reused "parser" instance, then a normal
    * aggregation.
    */
  def mapPartitionsParse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parsed = Tables.events(s, dir).select(col("props")).as[String]
      .mapPartitions { it =>
        val pattern = java.util.regex.Pattern.compile("\\d+") // init once per partition
        it.map { props =>
          val m = pattern.matcher(props)
          if (m.find()) m.group().toLong % 10 else -1L
        }
      }
    parsed.toDF("k_mod").groupBy("k_mod").agg(count(lit(1)).as("cnt")).orderBy("k_mod")
  }

  val mapPartitionsParseSql: String =
    """SELECT json_extract_string(props, '$.k')::BIGINT % 10 AS k_mod, count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Driver-loop BSP iteration (ref: DataSet.iterate:1156): BFS over a
    * graph derived from nation/region, verified against a recursive CTE.
    */
  def iterateBfs(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val e1 = n.select(col("n_nationkey").cast("long").as("src"), (col("n_regionkey") + 100).cast("long").as("dst"))
    val e2 = e1.select(col("dst").as("src"), col("src").as("dst"))
    val e3 = n.select((col("n_regionkey") + 100).cast("long").as("src"),
      (pmod(col("n_regionkey") + 1, lit(5)) + 100).cast("long").as("dst")).distinct()
    val e4 = e3.select(col("dst").as("src"), col("src").as("dst"))
    // Materialize the static edge set ONCE: without this every iteration
    // re-executes the 4-scan + distinct subtree (8 iterations x 4 parquet
    // scans + a 32-partition shuffle each — the round-1 bench outlier).
    val edges = e1.union(e2).union(e3).union(e4).distinct()
      .coalesce(1).localCheckpoint()

    import s.implicits._
    val init = Seq((0L, 0L)).toDF("node", "dist")
    // maxIter 8 > graph diameter (≤6: nation→region→chain of 5); the
    // convergence exit stops as soon as no new node is reached (BFS
    // invariant: first discovery is shortest, so count-stable = fixpoint).
    // coalesce(1): the frontier is KB-sized — at production scale keep
    // partitioning proportional to |frontier| instead.
    val result = Iterations.loop(init, maxIter = 8,
        done = (prev, next) => next.count() == prev.count(),
        checkpointEvery = 1) { dist =>
      dist.union(
          dist.join(edges, dist("node") === edges("src"))
            .select(col("dst").as("node"), (col("dist") + 1).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        .coalesce(1)
    }
    result.orderBy("node")
  }

  val iterateBfsSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT n_nationkey::BIGINT AS src, (n_regionkey + 100)::BIGINT AS dst FROM nation
      |  UNION SELECT (n_regionkey + 100)::BIGINT, n_nationkey::BIGINT FROM nation
      |  UNION SELECT DISTINCT (n_regionkey + 100)::BIGINT, (((n_regionkey + 1) % 5) + 100)::BIGINT FROM nation
      |  UNION SELECT DISTINCT (((n_regionkey + 1) % 5) + 100)::BIGINT, (n_regionkey + 100)::BIGINT FROM nation),
      |walk AS (
      |  SELECT 0::BIGINT AS node, 0::BIGINT AS dist
      |  UNION
      |  SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON w.node = e.src WHERE w.dist < 12)
      |SELECT node, min(dist) AS dist FROM walk GROUP BY node ORDER BY node""".stripMargin

  /** Delta iteration (ref: DataSet.iterateDelta:1206): connected
    * components by min-label propagation over the nation→region star
    * graph (region-chain edges omitted, so there are 5 components — one
    * per region, labeled by its smallest nation key). The workset is the
    * set of nodes whose label improved; convergence = empty workset, the
    * reference's criterion. Verified against a recursive-CTE transitive
    * closure.
    */
  def iterateDelta(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val e1 = n.select(col("n_nationkey").cast("long").as("src"),
      (col("n_regionkey") + 100).cast("long").as("dst"))
    val edges = e1.union(e1.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().coalesce(1).localCheckpoint()
    val init = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
    val result = Iterations.deltaLoop(init, init, Seq("node"), maxIter = 10) {
      (solution, workset) =>
        val cand = workset.join(edges, workset("node") === edges("src"))
          .select(col("dst").as("node"), col("comp"))
          .groupBy("node").agg(min("comp").as("comp"))
        val delta = cand.join(solution.withColumnRenamed("comp", "old"), Seq("node"))
          .filter(col("comp") < col("old"))
          .select("node", "comp")
          .coalesce(1) // KB-sized here; keep ∝ |delta| at scale
        (delta, delta)
    }
    result.orderBy("node")
  }

  val iterateDeltaSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT n_nationkey::BIGINT AS src, (n_regionkey + 100)::BIGINT AS dst FROM nation
      |  UNION SELECT (n_regionkey + 100)::BIGINT, n_nationkey::BIGINT FROM nation),
      |reach AS (
      |  SELECT src AS node, src AS r FROM edges
      |  UNION
      |  SELECT re.node, e.dst FROM reach re JOIN edges e ON re.r = e.src)
      |SELECT node, min(r) AS comp FROM reach GROUP BY node ORDER BY node""".stripMargin

  /** PageRank (5 damped iterations, d = 0.85) over the same symmetric
    * nation/region graph as [[iterateBfs]] — the canonical
    * [[graft.operators.Iterations.loop]] workload. Symmetric edges ⇒ no
    * dangling mass; N comes from a broadcast one-row aggregate (never a
    * driver collect); out-degrees are pre-joined onto the checkpointed
    * edge table once; each round is one join + one dst-keyed partial
    * aggregation, ranks rounded to 9 so both engines walk the identical
    * trajectory. The oracle unrolls the five rounds as CTEs.
    */
  def iteratePagerank(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val e1 = n.select(col("n_nationkey").cast("long").as("src"), (col("n_regionkey") + 100).cast("long").as("dst"))
    val e2 = e1.select(col("dst").as("src"), col("src").as("dst"))
    val e3 = n.select((col("n_regionkey") + 100).cast("long").as("src"),
      (pmod(col("n_regionkey") + 1, lit(5)) + 100).cast("long").as("dst")).distinct()
    val e4 = e3.select(col("dst").as("src"), col("src").as("dst"))
    val edges = e1.union(e2).union(e3).union(e4).distinct().coalesce(1).localCheckpoint()
    val edgesD = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct()
    val nCnt = nodes.agg(count(lit(1)).as("n"))
    val init = nodes.crossJoin(broadcast(nCnt))
      .select(col("node"), round(lit(1.0) / col("n"), 9).as("rank"))
    val result = Iterations.loop(init, maxIter = 5, checkpointEvery = 1) { pr =>
      val inbound = pr.join(edgesD, pr("node") === edgesD("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("m"))
      nodes.join(inbound, Seq("node"), "left")
        .crossJoin(broadcast(nCnt))
        .select(col("node"),
          round(lit(0.15) / col("n") + lit(0.85) * coalesce(col("m"), lit(0.0)), 9).as("rank"))
        .coalesce(1) // KB-sized graph; keep ∝ |nodes| at scale
    }
    result.select(col("node"), round(col("rank"), 6).as("rank")).orderBy("node")
  }

  val iteratePagerankSql: String = {
    val iter = (i: Int) =>
      s"""r$i AS (
         |  SELECT n.node, round(0.15 / t.n + 0.85 * coalesce(s.m, 0), 9) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / e.deg) AS m
         |    FROM r${i - 1} r JOIN edgesd e ON r.node = e.src GROUP BY 1) s
         |  ON n.node = s.node CROSS JOIN total t)""".stripMargin
    s"""WITH edges AS (
       |  SELECT n_nationkey::BIGINT AS src, (n_regionkey + 100)::BIGINT AS dst FROM nation
       |  UNION SELECT (n_regionkey + 100)::BIGINT, n_nationkey::BIGINT FROM nation
       |  UNION SELECT DISTINCT (n_regionkey + 100)::BIGINT, (((n_regionkey + 1) % 5) + 100)::BIGINT FROM nation
       |  UNION SELECT DISTINCT (((n_regionkey + 1) % 5) + 100)::BIGINT, (n_regionkey + 100)::BIGINT FROM nation),
       |edgesd AS (SELECT e.src, e.dst, d.deg FROM edges e
       |           JOIN (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1) d USING (src)),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |total AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |r0 AS (SELECT node, round(1.0 / t.n, 9) AS rank FROM nodes, total t),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node, round(rank, 6) AS rank FROM r5 ORDER BY node""".stripMargin
  }

  /** partitionCustom + sortPartition + mapPartition in one pipeline (ref:
    * DataStream.partitionCustom:338, DataSet.sortPartition:1479): events
    * routed by an explicit `user_id % 8` Partitioner, each partition
    * delivered sorted by (user_id, ts, event_id) out of the shuffle merge
    * (repartitionAndSortWithinPartitions — spills, so partition size is
    * unbounded at scale), then a per-partition fold emits
    * (pid, cnt, first/last event, sum). Oracle-safe precisely because the
    * routing function is explicit: unlike murmur3-expression
    * repartitioning, DuckDB can recompute pid = user_id % 8.
    */
  def partitionCustom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 8
    val keyed = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .rdd.map { case (u, t, e, v) => ((u, t, e), v) }
    val parted = graft.operators.Partitioning.customSorted(keyed,
      new graft.operators.Partitioning.ModPartitioner(n, _.asInstanceOf[(Long, Long, Long)]._1))
    val stats = parted.mapPartitionsWithIndex { (pid, it) =>
      var cnt = 0L; var first = -1L; var last = -1L; var sv = 0.0
      it.foreach { case ((_, _, e), v) =>
        if (cnt == 0L) first = e
        last = e; cnt += 1; sv += v
      }
      if (cnt == 0L) Iterator.empty
      else Iterator.single((pid.toLong, cnt, first, last, sv))
    }
    s.createDataFrame(stats).toDF("pid", "cnt", "first_event", "last_event", "sv")
      .select(col("pid"), col("cnt"), col("first_event"), col("last_event"),
        round(col("sv"), 4).as("sv"))
      .orderBy("pid")
  }

  val partitionCustomSql: String =
    Tables.eventsCte +
      """
        |SELECT user_id % 8 AS pid, count(*) AS cnt,
        |  first(event_id ORDER BY user_id, ts, event_id) AS first_event,
        |  last(event_id ORDER BY user_id, ts, event_id) AS last_event,
        |  round(sum(value), 4) AS sv
        |FROM ev GROUP BY 1 ORDER BY pid""".stripMargin

  /** Side outputs (ref: OutputTag / ctx.output): first-match-wins
    * tagging, counted per tag.
    */
  def sideOutputs(s: SparkSession, dir: String): DataFrame = {
    val tagged = SideOutputs.tag(
      Tables.events(s, dir),
      Seq(
        "errors" -> (col("event_type") === "error"),
        "whales" -> (col("value") > 95.0)))
    tagged.groupBy(col(SideOutputs.TagCol).as("tag"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .orderBy("tag")
  }

  val sideOutputsSql: String =
    Tables.eventsCte +
      """
        |SELECT CASE WHEN event_type = 'error' THEN 'errors'
        |            WHEN value > 95.0 THEN 'whales'
        |            ELSE 'main' END AS tag,
        |  count(*) AS cnt, round(sum(value), 4) AS sv
        |FROM ev GROUP BY 1 ORDER BY tag""".stripMargin

  /** Two-phase salted aggregation on a genuinely hot grouping key
    * (l_returnflag — 3 values over the whole table): partial-aggregate
    * on (key, salt), final on key (ref: SplitAggregateRule /
    * PartialFinalType in StreamExecGroupAggregate). The oracle is the
    * PLAIN group-by — salting must be semantically invisible.
    */
  def skewSaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAgg(
      Tables.lineitem(s, dir),
      keys = Seq("l_returnflag"),
      buckets = 32,
      saltBy = col("l_orderkey"),
      partial = Seq(count(lit(1)).as("pc"), sum("l_quantity").as("ps")),
      finalAgg = Seq(sum("pc").as("cnt"), round(sum("ps"), 2).as("sq")))
      .orderBy("l_returnflag")

  val skewSaltedAggSql: String =
    """SELECT l_returnflag, count(*)::BIGINT AS cnt, round(sum(l_quantity), 2) AS sq
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** Salted join against a replicable dimension when every left row
    * shares 3 join keys (maximal skew — one partition per key without
    * salting): left rows salt by hash(l_orderkey) % 8, the 3-row dim is
    * replicated 8×. Aggregated so the oracle is a plain join+group-by:
    * replication must be semantically invisible.
    */
  def skewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Seq(("A", "returned"), ("N", "kept"), ("R", "refunded"))
      .toDF("l_returnflag", "label")
    graft.operators.Skew.saltedJoin(
      Tables.lineitem(s, dir), dim, keys = Seq("l_returnflag"),
      buckets = 8, leftSaltBy = col("l_orderkey"))
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("rev"))
      .orderBy("label")
  }

  val skewSaltedJoinSql: String =
    """WITH dim(l_returnflag, label) AS (VALUES ('A', 'returned'), ('N', 'kept'), ('R', 'refunded'))
      |SELECT label, count(*)::BIGINT AS cnt, round(sum(l_extendedprice), 2) AS rev
      |FROM lineitem JOIN dim USING (l_returnflag)
      |GROUP BY label ORDER BY label""".stripMargin

  /** Bloom-reduced fact-to-filtered-dim join
    * ([[graft.operators.RuntimeFilter.bloomReducedJoin]]): the dim
    * predicate keeps ~2 % of parts, the scan-stage Bloom probe drops
    * non-matching lineitem rows before the shuffle, and false
    * positives die in the join — so the oracle is the PLAIN join, the
    * reduction must be semantically invisible (the exactness contract).
    */
  def joinBloomReduce(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#4" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
    graft.operators.RuntimeFilter.bloomReducedJoin(
      Tables.lineitem(s, dir), "l_partkey", dim, "p_partkey")
      .groupBy("p_partkey", "p_name")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("p_partkey")
  }

  val joinBloomReduceSql: String =
    """SELECT p_partkey, p_name, count(*)::BIGINT AS cnt,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#4' AND p_size <= 10
      |GROUP BY p_partkey, p_name ORDER BY p_partkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_skew_salted_agg", skewSaltedAgg, Some(skewSaltedAggSql)),
    Q("q_skew_salted_join", skewSaltedJoin, Some(skewSaltedJoinSql)),
    Q("q_join_bloom_reduce", joinBloomReduce, Some(joinBloomReduceSql)),
    Q("q_sql_revenue", sqlRevenue, Some(sqlRevenueSql)),
    Q("q_join_hinted", joinHinted, Some(joinHintedSql)),
    Q("q_api_zip_index", apiZipIndex, Some(apiZipIndexSql)),
    Q("q_api_summarize", apiSummarize, Some(apiSummarizeSql)),
    Q("q_api_checksum", apiChecksum, Some(apiChecksumSql)),
    Q("q_api_sample_size", apiSampleSize, Some(apiSampleSizeSql)),
    Q("q_cogroup", cogroup, Some(cogroupSql)),
    Q("q_flat_agg", flatAggregate, Some(flatAggregateSql)),
    Q("q_udaf_weighted", udafWeighted, Some(udafWeightedSql)),
    Q("q_map_partitions", mapPartitionsParse, Some(mapPartitionsParseSql)),
    Q("q_iterate_bfs", iterateBfs, Some(iterateBfsSql)),
    Q("q_partition_custom", partitionCustom, Some(partitionCustomSql)),
    Q("q_iterate_delta", iterateDelta, Some(iterateDeltaSql)),
    Q("q_iterate_pagerank", iteratePagerank, Some(iteratePagerankSql)),
    Q("q_side_outputs", sideOutputs, Some(sideOutputsSql))
  )
}
