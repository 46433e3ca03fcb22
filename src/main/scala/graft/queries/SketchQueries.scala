package graft.queries

import graft.Tables
import graft.operators.{Funnel, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic-summary queries over the documents table
  * ([[graft.operators.Sketches]]): HyperLogLog distinct counting,
  * count-min heavy-hitter estimation, Bloom-filter membership for
  * incremental dedup. Each query carries the EXACT answer alongside
  * the estimate as an audit column — at test scale both are cheap, and
  * the driver's DuckDB oracle replays sketch and audit bit-for-bit
  * (all-integer register/cell/bit arithmetic; the only floats are one
  * literal-identical IEEE op chain per estimate, rounded). At 100 TB
  * the audit column is what you DROP: the sketches are the scalable
  * path, constant-size state built from map-side partials.
  */
object SketchQueries {

  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** HLL over distinct 3-gram shingles: 64 registers on the low 6 hash
    * bits, rank of the remaining 54. Registers are staged (64 rows)
    * so the estimate and the register dump share one corpus aggregate;
    * the exact-distinct audit is the second, independent scan.
    */
  def docHll(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
    val regs = Funnel.stageLazy(Sketches.hllRegisters(sh, "sh", m = 64, wBits = 54))
    val est = Sketches.hllEstimate(regs, m = 64, wBits = 54, alpha = 0.709)
    val exact = sh.agg(count_distinct(col("sh")).as("n_exact"))
    regs.crossJoin(broadcast(est)).crossJoin(broadcast(exact))
      .select(col("bucket"), col("reg"), col("est_distinct"),
        col("n_exact").cast("long").as("n_exact"))
      .orderBy("bucket")
  }

  val docHllSql: String =
    s"""WITH d AS (SELECT string_split($normSql, ' ') AS t FROM documents),
       |g AS (SELECT unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d WHERE len(t) >= 3),
       |h AS (SELECT ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM g),
       |r AS (SELECT h % 64 AS bucket, h // 64 AS w FROM h),
       |rho AS (SELECT bucket, CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho FROM r),
       |reg AS (SELECT b.bucket::BIGINT AS bucket, coalesce(max(rho.rho), 0)::BIGINT AS reg
       |        FROM range(0, 64) b(bucket) LEFT JOIN rho ON rho.bucket = b.bucket GROUP BY 1),
       |s AS (SELECT sum((1::BIGINT << (55 - reg)::INTEGER))::BIGINT AS s FROM reg),
       |est AS (SELECT round(0.709::DOUBLE * 4096 * power(2.0, 55) / s, 3) AS est_distinct FROM s),
       |ex AS (SELECT count(DISTINCT sh)::BIGINT AS n_exact FROM g)
       |SELECT bucket, reg, est_distinct, n_exact FROM reg, est, ex ORDER BY bucket""".stripMargin

  /** Per-source HLL — the sketch as a GROUPED aggregation, the form a
    * real pipeline runs ("distinct n-grams per source"): |sources|·64
    * register rows replace a shuffle of every (source, shingle) pair.
    * Output is one row per source with the estimate and the exact
    * audit; registers feed the estimate directly (single reference —
    * no stage boundary needed, per the Funnel rule).
    */
  def docHllBySource(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
    val regs = Sketches.hllRegistersBy(sh, "source", "sh", m = 64, wBits = 54)
    val est = Sketches.hllEstimateBy(regs, m = 64, wBits = 54, alpha = 0.709)
    val exact = sh.groupBy("source").agg(count_distinct(col("sh")).as("n_exact"))
    est.select(col("key").as("source"), col("est_distinct"))
      .join(exact, "source")
      .select(col("source"), col("est_distinct"), col("n_exact").cast("long").as("n_exact"))
      .orderBy("source")
  }

  val docHllBySourceSql: String =
    s"""WITH d AS (SELECT source, string_split($normSql, ' ') AS t FROM documents),
       |g AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d WHERE len(t) >= 3),
       |h AS (SELECT source, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM g),
       |r AS (SELECT source, h % 64 AS bucket, h // 64 AS w FROM h),
       |rho AS (SELECT source, bucket,
       |          CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho FROM r),
       |reg AS (SELECT k.source, b.bucket, coalesce(max(rho.rho), 0)::BIGINT AS reg
       |        FROM (SELECT DISTINCT source FROM g) k
       |        CROSS JOIN range(0, 64) b(bucket)
       |        LEFT JOIN rho ON rho.source = k.source AND rho.bucket = b.bucket
       |        GROUP BY 1, 2),
       |s AS (SELECT source, sum((1::BIGINT << (55 - reg)::INTEGER))::BIGINT AS s
       |      FROM reg GROUP BY 1),
       |est AS (SELECT source, round(0.709::DOUBLE * 4096 * power(2.0, 55) / s, 3) AS est_distinct
       |        FROM s),
       |ex AS (SELECT source, count(DISTINCT sh)::BIGINT AS n_exact FROM g GROUP BY 1)
       |SELECT source, est_distinct, n_exact FROM est JOIN ex USING (source)
       |ORDER BY source""".stripMargin

  /** HLL set algebra across two sources: union = per-bucket register
    * MAX (exact sketch of A∪B — merge is lossless, the property that
    * lets per-partition/per-day sketches roll up), intersection by
    * inclusion–exclusion on the three estimates (approximate — error
    * compounds, which is why the exact audit rides along). One row:
    * estimates vs exact distinct-shingle counts for src0/src1.
    */
  def docHllSetops(s: SparkSession, dir: String): DataFrame = {
    val sh = Funnel.stageLazy(Tables.documents(s, dir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), explode(TextAnalysis.shingles(col("text"), 3)).as("sh")))
    def regs(src: String) = Funnel.stageLazy(
      Sketches.hllRegisters(sh.filter(col("source") === src).select("sh"),
        "sh", m = 64, wBits = 54))
    val ra = regs("src0")
    val rb = regs("src1")
    val ru = ra.select(col("bucket"), col("reg").as("a"))
      .join(rb.select(col("bucket"), col("reg").as("b")), "bucket")
      .select(col("bucket"), greatest(col("a"), col("b")).as("reg"))
    def est(r: DataFrame, as: String) =
      Sketches.hllEstimate(r, m = 64, wBits = 54, alpha = 0.709)
        .select(col("est_distinct").as(as))
    val exacts = sh.groupBy("sh").agg(count_distinct(col("source")).as("ns"))
      .agg(count(lit(1)).cast("long").as("n_union"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).cast("long").as("n_inter"))
    est(ra, "est_a").crossJoin(est(rb, "est_b")).crossJoin(est(ru, "est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 3).as("est_inter"))
      .crossJoin(broadcast(exacts))
      .orderBy("est_a")
  }

  val docHllSetopsSql: String =
    s"""WITH d AS (SELECT source, string_split($normSql, ' ') AS t FROM documents
       |           WHERE source IN ('src0', 'src1')),
       |g AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d WHERE len(t) >= 3),
       |h AS (SELECT source, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM g),
       |rho AS (SELECT source, h % 64 AS bucket,
       |          CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - length(bin(h // 64)) END AS rho FROM h),
       |ra AS (SELECT b.bucket, coalesce(max(rho.rho), 0)::BIGINT AS reg
       |       FROM range(0, 64) b(bucket)
       |       LEFT JOIN rho ON rho.bucket = b.bucket AND rho.source = 'src0' GROUP BY 1),
       |rb AS (SELECT b.bucket, coalesce(max(rho.rho), 0)::BIGINT AS reg
       |       FROM range(0, 64) b(bucket)
       |       LEFT JOIN rho ON rho.bucket = b.bucket AND rho.source = 'src1' GROUP BY 1),
       |ru AS (SELECT ra.bucket, greatest(ra.reg, rb.reg) AS reg FROM ra JOIN rb USING (bucket)),
       |sa AS (SELECT sum((1::BIGINT << (55 - reg)::INTEGER))::BIGINT AS s FROM ra),
       |sb AS (SELECT sum((1::BIGINT << (55 - reg)::INTEGER))::BIGINT AS s FROM rb),
       |su AS (SELECT sum((1::BIGINT << (55 - reg)::INTEGER))::BIGINT AS s FROM ru),
       |ea AS (SELECT round(0.709::DOUBLE * 4096 * power(2.0, 55) / s, 3) AS est_a FROM sa),
       |eb AS (SELECT round(0.709::DOUBLE * 4096 * power(2.0, 55) / s, 3) AS est_b FROM sb),
       |eu AS (SELECT round(0.709::DOUBLE * 4096 * power(2.0, 55) / s, 3) AS est_union FROM su),
       |ex AS (SELECT count(*)::BIGINT AS n_union,
       |         sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END)::BIGINT AS n_inter
       |       FROM (SELECT sh, count(DISTINCT source) AS ns FROM g GROUP BY 1))
       |SELECT est_a, est_b, est_union, round(est_a + est_b - est_union, 3) AS est_inter,
       |  n_union, n_inter
       |FROM ea, eb, eu, ex ORDER BY est_a""".stripMargin

  /** Count-min heavy hitters: 4×256 sketch over all tokens, probed
    * with the exact top-20 (the audit side). The estimate is min over
    * the 4 addressed cells — an upper bound on the true count; the
    * oracle hash-checks the bound is the SAME bound.
    */
  def docCms(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val cells = Sketches.cmsCells(toks, "tok", depth = 4, width = 256)
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    Sketches.cmsLookup(cells, top, "tok", depth = 4, width = 256)
      .select(col("tok"), col("exact_cnt").cast("long").as("exact_cnt"), col("est_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  val docCmsSql: String =
    s"""WITH t AS (SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents),
       |c AS (SELECT r, ('0x' || substr(md5(r::VARCHAR || '|' || tok), 1, 15))::BIGINT % 256 AS b,
       |        count(*)::BIGINT AS c FROM t, range(0, 4) rr(r) GROUP BY 1, 2),
       |e AS (SELECT tok, count(*)::BIGINT AS exact_cnt FROM t GROUP BY 1),
       |top AS (SELECT * FROM e ORDER BY exact_cnt DESC, tok LIMIT 20),
       |p AS (SELECT tok, exact_cnt, r,
       |        ('0x' || substr(md5(r::VARCHAR || '|' || tok), 1, 15))::BIGINT % 256 AS b
       |      FROM top, range(0, 4) rr(r))
       |SELECT p.tok, p.exact_cnt, min(c.c)::BIGINT AS est_cnt
       |FROM p JOIN c ON p.r = c.r AND p.b = c.b
       |GROUP BY 1, 2 ORDER BY exact_cnt DESC, tok""".stripMargin

  /** Misra–Gries heavy hitters (see
    * [[graft.operators.Sketches.mgHeavyHitters]]) over the
    * token-prefix stream (first letter — the fixture's one genuinely
    * skewed token statistic: 20 %/6.6 %/3.3 % tiers): one k=24 counter
    * summary reduces the stream to a candidate set, a candidate-
    * restricted exact pass keeps prefixes with frequency > n/25 (7 of
    * 19 pass — real discrimination). The oracle is simply the exact
    * threshold query: the MG guarantee (candidates ⊇ the threshold set
    * under any partitioning/merge order) is precisely what makes the
    * verified output deterministic; a dropped candidate would fail the
    * row count.
    */
  def docMgHeavy(s: SparkSession, dir: String): DataFrame = {
    val toks = Funnel.stageLazy(Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(substring(col("tok"), 1, 1).as("pfx")))
    Sketches.mgHeavyHitters(toks, "pfx", k = 24)
      .withColumnRenamed("item", "pfx")
      .orderBy(col("cnt").desc, col("pfx"))
  }

  val docMgHeavySql: String =
    s"""WITH t AS (SELECT substr(unnest(string_split($normSql, ' ')), 1, 1) AS pfx
       |           FROM documents),
       |n AS (SELECT count(*)::BIGINT AS n FROM t)
       |SELECT pfx, count(*)::BIGINT AS cnt
       |FROM t, n GROUP BY pfx, n.n HAVING count(*) * 25 > n.n
       |ORDER BY cnt DESC, pfx""".stripMargin

  /** Bloom-filter incremental dedup: the base corpus's fingerprints
    * set a 4096-bit / 3-hash filter; the daily delta (every 10th doc
    * plus planted re-crawls, the [[PipelineQueries.docDeltaDedup]]
    * fixture) probes it. `bloom_hit` = all 3 positions set;
    * `exact_dup` = the audit join against the real fingerprint set.
    * No false negatives by construction — the property a production
    * ingest relies on (a miss is DEFINITELY new, skip the expensive
    * verify); hits fall through to exact verification, so false
    * positives cost work, never data.
    */
  def docBloomDelta(s: SparkSession, dir: String): DataFrame = {
    // the fingerprint projection fans out six ways (bits build, the
    // two-part delta union's probe and audit sides, the audit's base
    // set) — a stage boundary computes it once (Funnel scaladoc)
    val docs = Funnel.stageLazy(Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")))
    val base = docs.filter(col("doc_id") % 10 =!= 7)
    val delta = docs.filter(col("doc_id") % 10 === 7)
      .unionByName(docs.filter(col("doc_id") % 100 === 1)
        .select((col("doc_id") + 1000000).as("doc_id"), col("fp")))
    val bits = Sketches.bloomBits(base, "fp", k = 3, mBits = 4096)
    val hits = Sketches.bloomProbe(bits, delta, "fp", k = 3, mBits = 4096)
    val exact = delta.join(base.select("fp").distinct().withColumn("dup", lit(1)),
        Seq("fp"), "left")
      .select(col("doc_id"), coalesce(col("dup"), lit(0)).cast("long").as("exact_dup"))
    hits.select(col("doc_id"), col("bloom_hit"))
      .join(exact, "doc_id")
      .orderBy("doc_id")
  }

  val docBloomDeltaSql: String =
    s"""WITH f AS (SELECT doc_id, md5($normSql) AS fp FROM documents),
       |b AS (SELECT * FROM f WHERE doc_id % 10 <> 7),
       |d AS (SELECT * FROM f WHERE doc_id % 10 = 7
       |      UNION ALL SELECT doc_id + 1000000 AS doc_id, fp FROM f WHERE doc_id % 100 = 1),
       |bits AS (SELECT DISTINCT ('0x' || substr(md5(i::VARCHAR || '|' || fp), 1, 15))::BIGINT % 4096 AS pos
       |         FROM b, range(0, 3) t(i)),
       |p AS (SELECT doc_id, ('0x' || substr(md5(i::VARCHAR || '|' || fp), 1, 15))::BIGINT % 4096 AS pos
       |      FROM d, range(0, 3) t(i)),
       |h AS (SELECT p.doc_id, (count(bits.pos) = 3)::BIGINT AS bloom_hit
       |      FROM p LEFT JOIN bits ON p.pos = bits.pos GROUP BY 1),
       |e AS (SELECT d.doc_id, (count(bb.fp) > 0)::BIGINT AS exact_dup
       |      FROM d LEFT JOIN (SELECT DISTINCT fp FROM b) bb ON d.fp = bb.fp GROUP BY 1)
       |SELECT doc_id, bloom_hit, exact_dup FROM h JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Sliding-window distinct via HLL register union: trailing-7-day
    * active users per day, computed by MERGING the per-day sketches
    * (per-bucket max — union is the register max, the property that
    * makes HLL windowable) instead of re-scanning 7 days of raw
    * activity per target day. At 100 TB the daily registers are 64
    * rows/day persisted once; any window (7/28/90-day) is a max-merge
    * over a few hundred tiny rows — the exact path
    * ([[AnalyticsQueries.evtActiveUsers]]) re-shuffles every (user,
    * day) pair per window definition. Exact WAU rides along as the
    * audit column.
    */
  def evtWauHll(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id").cast("string").as("uid"))
    val regs = Sketches.hllRegistersBy(ud, "day", "uid", m = 64, wBits = 54)
    val union = regs
      .select(col("key").as("src"), col("bucket"), col("reg"),
        explode(expr("sequence(0, 6)")).as("off"))
      .select(date_add(col("src"), col("off")).as("key"), col("bucket"), col("reg"))
      .groupBy("key", "bucket").agg(max("reg").as("reg"))
    val est = Sketches.hllEstimateBy(union, m = 64, wBits = 54, alpha = 0.709)
    val exact = ud.distinct()
      .select(col("uid"), explode(expr("sequence(day, date_add(day, 6))")).as("day"))
      .groupBy("day").agg(count_distinct(col("uid")).as("n_exact"))
    val days = ud.select(col("day")).distinct()
    days.join(est.withColumnRenamed("key", "day"), Seq("day"))
      .join(exact, Seq("day"))
      .select(col("day").cast("string").as("day"),
        col("est_distinct").as("est_wau"), col("n_exact"))
      .orderBy("day")
  }

  val evtWauHllSql: String =
    Tables.eventsCte +
      """
        |, ud AS (SELECT DISTINCT ts::DATE AS day, user_id::VARCHAR AS uid FROM ev),
        |h AS (SELECT day, ('0x' || substr(md5(uid), 1, 15))::BIGINT AS h FROM ud),
        |r AS (SELECT day, h % 64 AS bucket,
        |        CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - length(bin(h // 64)) END AS rho FROM h),
        |p AS (SELECT day, bucket, max(rho)::BIGINT AS reg FROM r GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM ud),
        |grid AS (SELECT d.day, b.bucket, coalesce(p.reg, 0)::BIGINT AS reg
        |         FROM days d CROSS JOIN range(0, 64) b(bucket)
        |         LEFT JOIN p ON p.day = d.day AND p.bucket = b.bucket),
        |sl AS (SELECT (g.day + o.off * INTERVAL 1 DAY)::DATE AS tday, bucket, reg
        |       FROM grid g, range(0, 7) o(off)),
        |u AS (SELECT tday, bucket, max(reg)::BIGINT AS reg FROM sl GROUP BY 1, 2),
        |s AS (SELECT tday, sum(1::BIGINT << (55 - reg)::INTEGER)::BIGINT AS s FROM u GROUP BY 1),
        |est AS (SELECT tday, round(0.709::DOUBLE * 4096 * power(2.0, 55) / s, 3) AS est_wau FROM s),
        |exw AS (SELECT (d.day + o.off * INTERVAL 1 DAY)::DATE AS tday, uid
        |        FROM ud d, range(0, 7) o(off)),
        |ex AS (SELECT tday, count(DISTINCT uid)::BIGINT AS n_exact FROM exw GROUP BY 1)
        |SELECT d.day::VARCHAR AS day, est_wau, n_exact
        |FROM days d JOIN est ON est.tday = d.day JOIN ex ON ex.tday = d.day
        |ORDER BY day""".stripMargin

  /** Sliding-window frequency via count-min cell SUM-merge — the
    * additive dual of [[evtWauHll]]'s register max-merge: per-day 3×128
    * cells persist once; the trailing-3-day sketch for any target day
    * is a sum over tiny cell rows, and per-user activity estimates
    * come from min-over-rows probes against the merged cells. Exact
    * window counts ride along as the audit column (the estimate is an
    * upper bound; at this width they coincide for most probes).
    */
  def evtCmsWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id").cast("string").as("uid"))
    val daily = Sketches.cmsCellsBy(ev, "day", "uid", depth = 3, width = 128)
    val merged = daily
      .select(col("key").as("src"), col("r"), col("b"), col("c"),
        explode(expr("sequence(0, 2)")).as("off"))
      .select(date_add(col("src"), col("off")).as("day"), col("r"), col("b"), col("c"))
      .groupBy("day", "r", "b").agg(sum("c").as("c"))
    val days = ev.select(col("day")).distinct()
    val probes = days.crossJoin(
      ev.filter(col("uid").cast("long") < 10).select(col("uid")).distinct())
    val addressed = probes
      .withColumn("r", explode(array((0 until 3).map(lit): _*)))
      .withColumn("b", graft.functions.GraftFunctions.md5_prefix(
        concat(col("r").cast("string"), lit("|"), col("uid")), 15) % 128)
    val est = addressed.join(merged, Seq("day", "r", "b"))
      .groupBy("day", "uid").agg(min("c").cast("long").as("est_cnt"))
    val exact = ev
      .select(col("uid"), explode(expr("sequence(day, date_add(day, 2))")).as("day"))
      .filter(col("uid").cast("long") < 10)
      .groupBy("day", "uid").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("day", "uid"), "left")
      .join(days, Seq("day"))
      .select(col("day").cast("string").as("day"), col("uid").cast("long").as("uid"),
        col("est_cnt"), coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .orderBy("day", "uid")
  }

  val evtCmsWindowSql: String =
    Tables.eventsCte +
      """
        |, e AS (SELECT ts::DATE AS day, user_id::VARCHAR AS uid FROM ev),
        |cells AS (SELECT day, r.r, ('0x' || substr(md5(r.r::VARCHAR || '|' || uid), 1, 15))::BIGINT % 128 AS b,
        |            count(*)::BIGINT AS c
        |          FROM e, range(0, 3) r(r) GROUP BY 1, 2, 3),
        |m AS (SELECT (day + o.off * INTERVAL 1 DAY)::DATE AS day, r, b, sum(c)::BIGINT AS c
        |      FROM cells, range(0, 3) o(off) GROUP BY 1, 2, 3),
        |days AS (SELECT DISTINCT day FROM e),
        |us AS (SELECT DISTINCT uid FROM e WHERE uid::BIGINT < 10),
        |pr AS (SELECT d.day, us.uid, r.r,
        |         ('0x' || substr(md5(r.r::VARCHAR || '|' || us.uid), 1, 15))::BIGINT % 128 AS b
        |       FROM days d, us, range(0, 3) r(r)),
        |est AS (SELECT day, uid, min(c)::BIGINT AS est_cnt
        |        FROM pr JOIN m USING (day, r, b) GROUP BY 1, 2),
        |exw AS (SELECT (day + o.off * INTERVAL 1 DAY)::DATE AS day, uid
        |        FROM e, range(0, 3) o(off) WHERE uid::BIGINT < 10),
        |ex AS (SELECT day, uid, count(*)::BIGINT AS n_exact FROM exw GROUP BY 1, 2)
        |SELECT est.day::VARCHAR AS day, est.uid::BIGINT AS uid, est_cnt,
        |  coalesce(n_exact, 0)::BIGINT AS n_exact
        |FROM est JOIN days USING (day) LEFT JOIN ex ON ex.day = est.day AND ex.uid = est.uid
        |ORDER BY day, uid""".stripMargin

  /** Heavy-CHANGE detection via count-min difference (Cormode &
    * Muthukrishnan 2005's change-detection application — the fourth
    * leg of the sketch-algebra family: [[evtWauHll]] max-merges,
    * [[evtCmsWindow]] sum-merges, [[evtBloomWindow]] set-unions, here
    * the sketches SUBTRACT): per half-month window a CMS over user
    * activity, then each watchlist user's estimated count DELTA
    * between the halves, audited against the exact deltas. The change
    * monitor never touches either window's raw rows at probe time —
    * the two ≤384-cell grids answer everything, which is the whole
    * point at 100 TB: yesterday's traffic shifted, and the evidence
    * fits in a broadcast. All counts integer; estimates are min-cell
    * upper bounds on both engines bit-for-bit.
    */
  def evtCmsChange(s: SparkSession, dir: String): DataFrame = {
    val ev0 = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id").cast("string").as("uid"))
    val minDay = ev0.agg(min("day").as("d0"))
    val ev = ev0.crossJoin(broadcast(minDay))
      .withColumn("w", (datediff(col("day"), col("d0")) >= 15).cast("long"))
    val cells = Sketches.cmsCellsBy(
      ev.select(col("w").as("wk"), col("uid")), "wk", "uid", depth = 3, width = 128)
    val probes = ev.filter(col("uid").cast("long") < 15).select(col("uid")).distinct()
    val addressed = probes
      .crossJoin(s.range(2).select(col("id").as("wk")))
      .withColumn("r", explode(array((0 until 3).map(lit): _*)))
      .withColumn("b", graft.functions.GraftFunctions.md5_prefix(
        concat(col("r").cast("string"), lit("|"), col("uid")), 15) % 128)
    val est = addressed.join(broadcast(cells), addressed("wk") === cells("key")
        && addressed("r") === cells("r") && addressed("b") === cells("b"))
      .groupBy("uid", "wk").agg(min("c").cast("long").as("est"))
      .groupBy("uid")
      .agg(sum(when(col("wk") === 0, col("est")).otherwise(0L)).as("est_w0"),
        sum(when(col("wk") === 1, col("est")).otherwise(0L)).as("est_w1"))
    val exact = ev.filter(col("uid").cast("long") < 15)
      .groupBy("uid")
      .agg(sum(when(col("w") === 0, 1L).otherwise(0L)).as("n_w0"),
        sum(when(col("w") === 1, 1L).otherwise(0L)).as("n_w1"))
    est.join(exact, Seq("uid"), "left")
      .select(col("uid").cast("long").as("uid"),
        col("est_w0"), col("est_w1"), (col("est_w1") - col("est_w0")).as("delta_est"),
        coalesce(col("n_w0"), lit(0L)).as("n_w0"),
        coalesce(col("n_w1"), lit(0L)).as("n_w1"),
        (coalesce(col("n_w1"), lit(0L)) - coalesce(col("n_w0"), lit(0L)))
          .as("delta_exact"))
      .orderBy("uid")
  }

  val evtCmsChangeSql: String =
    Tables.eventsCte +
      """
        |, e0 AS (SELECT ts::DATE AS day, user_id::VARCHAR AS uid FROM ev),
        |d0 AS (SELECT min(day) AS d0 FROM e0),
        |e AS (SELECT uid, (day - (SELECT d0 FROM d0) >= 15)::BIGINT AS w FROM e0),
        |cells AS (SELECT w AS wk, r.r,
        |            ('0x' || substr(md5(r.r::VARCHAR || '|' || uid), 1, 15))::BIGINT % 128 AS b,
        |            count(*)::BIGINT AS c
        |          FROM e, range(0, 3) r(r) GROUP BY 1, 2, 3),
        |probes AS (SELECT DISTINCT uid FROM e WHERE uid::BIGINT < 15),
        |pr AS (SELECT uid, wk.wk, r.r,
        |         ('0x' || substr(md5(r.r::VARCHAR || '|' || uid), 1, 15))::BIGINT % 128 AS b
        |       FROM probes, range(0, 2) wk(wk), range(0, 3) r(r)),
        |est0 AS (SELECT uid, wk, min(c)::BIGINT AS est
        |         FROM pr JOIN cells USING (wk, r, b) GROUP BY 1, 2),
        |est AS (SELECT uid,
        |          sum(CASE WHEN wk = 0 THEN est ELSE 0 END)::BIGINT AS est_w0,
        |          sum(CASE WHEN wk = 1 THEN est ELSE 0 END)::BIGINT AS est_w1
        |        FROM est0 GROUP BY 1),
        |ex AS (SELECT uid, sum(CASE WHEN w = 0 THEN 1 ELSE 0 END)::BIGINT AS n_w0,
        |         sum(CASE WHEN w = 1 THEN 1 ELSE 0 END)::BIGINT AS n_w1
        |       FROM e WHERE uid::BIGINT < 15 GROUP BY 1)
        |SELECT est.uid::BIGINT AS uid, est_w0, est_w1, est_w1 - est_w0 AS delta_est,
        |  coalesce(n_w0, 0)::BIGINT AS n_w0, coalesce(n_w1, 0)::BIGINT AS n_w1,
        |  coalesce(n_w1, 0) - coalesce(n_w0, 0) AS delta_exact
        |FROM est LEFT JOIN ex USING (uid)
        |ORDER BY uid""".stripMargin

  /** Recency-scoped membership via Bloom bit OR-merge — the third leg
    * of the windowable-sketch algebra ([[evtWauHll]] max, [[evtCmsWindow]]
    * sum, here set-union): per-day filters over (user, event_type)
    * behavior pairs persist once; "seen in the prior 3 days" for any
    * probe day is a distinct-union of tiny position rows, the
    * recency-scoped dedup/decontamination primitive (probe TODAY's
    * arrivals against last week's filter without touching last week's
    * raw data). Bloom guarantees no false negatives — the spec-level
    * invariant `bloom_hits ≥ exact_hits` is visible per row in the
    * audit columns.
    */
  def evtBloomWindow(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"),
        concat(col("user_id").cast("string"), lit("|"), col("event_type")).as("item"))
      .distinct()
    val daily = Sketches.bloomBitsBy(pairs, "day", "item", k = 4, mBits = 1024)
    // bits visible ON day d = union of filters from days d-3 .. d-1
    val visible = daily
      .select(col("key").as("src"), col("pos"), explode(expr("sequence(1, 3)")).as("off"))
      .select(date_add(col("src"), col("off")).as("day"), col("pos"))
      .distinct()
    val addressed = pairs
      .withColumn("i", explode(array((0 until 4).map(lit): _*)))
      .withColumn("pos", graft.functions.GraftFunctions.md5_prefix(
        concat(col("i").cast("string"), lit("|"), col("item")), 15) % 1024)
    val bloom = addressed
      .join(visible.withColumn("set", lit(1)), Seq("day", "pos"), "left")
      .groupBy("day", "item")
      .agg((count(col("set")) === 4).cast("long").as("bloom_hit"))
    val seen = pairs
      .select(col("item"), explode(expr("sequence(date_add(day, 1), date_add(day, 3))")).as("day"))
      .distinct()
      .withColumn("ex", lit(1L))
    bloom.join(seen, Seq("day", "item"), "left")
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        sum("bloom_hit").as("bloom_hits"),
        sum(coalesce(col("ex"), lit(0L))).as("exact_hits"))
      .orderBy("day")
  }

  val evtBloomWindowSql: String =
    Tables.eventsCte +
      """
        |, p AS (SELECT DISTINCT ts::DATE AS day,
        |          user_id::VARCHAR || '|' || event_type AS item FROM ev),
        |bits AS (SELECT DISTINCT day,
        |           ('0x' || substr(md5(i.i::VARCHAR || '|' || item), 1, 15))::BIGINT % 1024 AS pos
        |         FROM p, range(0, 4) i(i)),
        |vis AS (SELECT DISTINCT (day + o.off * INTERVAL 1 DAY)::DATE AS day, pos
        |        FROM bits, range(1, 4) o(off)),
        |addr AS (SELECT day, item, i.i,
        |           ('0x' || substr(md5(i.i::VARCHAR || '|' || item), 1, 15))::BIGINT % 1024 AS pos
        |         FROM p, range(0, 4) i(i)),
        |bl AS (SELECT a.day, a.item,
        |         CASE WHEN count(v.pos) = 4 THEN 1 ELSE 0 END AS bloom_hit
        |       FROM addr a LEFT JOIN vis v ON v.day = a.day AND v.pos = a.pos
        |       GROUP BY 1, 2),
        |seen AS (SELECT DISTINCT (day + o.off * INTERVAL 1 DAY)::DATE AS day, item
        |         FROM p, range(1, 4) o(off))
        |SELECT bl.day::VARCHAR AS day, count(*)::BIGINT AS n_pairs,
        |  sum(bloom_hit)::BIGINT AS bloom_hits,
        |  sum(CASE WHEN seen.item IS NULL THEN 0 ELSE 1 END)::BIGINT AS exact_hits
        |FROM bl LEFT JOIN seen ON seen.day = bl.day AND seen.item = bl.item
        |GROUP BY 1 ORDER BY 1""".stripMargin

  /** KMV bottom-k distinct sketch over 3-gram shingles — same domain
    * as `q_doc_hll`, directly comparable: the 256 smallest distinct
    * 60-bit hashes plus the (k−1)·2^60/h_(k) estimate and the exact
    * audit. Sketch build is ONE map-side-combined bounded aggregate
    * (each partition ships ≤256 longs — no distinct-value shuffle);
    * the exact audit is the second, independent scan you drop at
    * 100 TB.
    */
  def docKmv(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
    val vals = Funnel.stageLazy(Sketches.kmvValues(sh, "sh", k = 256))
    val est = Sketches.kmvEstimate(vals, k = 256)
    val exact = sh.agg(count_distinct(col("sh")).as("n_exact"))
    vals.crossJoin(broadcast(est)).crossJoin(broadcast(exact))
      .select(col("rank"), col("h"), col("est_distinct"),
        col("n_exact").cast("long").as("n_exact"))
      .orderBy("rank")
  }

  val docKmvSql: String =
    s"""WITH d AS (SELECT string_split($normSql, ' ') AS t FROM documents),
       |g AS (SELECT unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d WHERE len(t) >= 3),
       |hh AS (SELECT DISTINCT ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM g),
       |v AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM hh ORDER BY h LIMIT 256),
       |st AS (SELECT count(*)::BIGINT AS n, max(h) AS mx FROM v),
       |est AS (SELECT round((CASE WHEN n = 256 THEN n - 1 ELSE n END)::DOUBLE * power(2.0, 60)
       |          / (CASE WHEN n = 256 THEN mx ELSE 1152921504606846976 END)::DOUBLE, 3)
       |          AS est_distinct FROM st),
       |ex AS (SELECT count(DISTINCT sh)::BIGINT AS n_exact FROM g)
       |SELECT rank::BIGINT AS rank, h, est_distinct, n_exact FROM v, est, ex
       |ORDER BY rank""".stripMargin

  /** Theta-sketch set algebra across two sources — the faithful
    * counterpart of `q_doc_hll_setops`: bottom-k union-merge is
    * LOSSLESS, and because retained values are a uniform hash-sample
    * of each distinct domain, the INTERSECTION is estimated by direct
    * sample overlap below the shared θ = min(θ_a, θ_b) — no
    * inclusion–exclusion, no error compounding (the HLL twin records
    * est_inter 528 vs exact 71 at sf0.01; this one lands inside the
    * sampling band). All set work happens on ≤k-row staged value
    * tables.
    */
  def docKmvSetops(s: SparkSession, dir: String): DataFrame = {
    val k = 256
    val sh = Funnel.stageLazy(Tables.documents(s, dir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), explode(TextAnalysis.shingles(col("text"), 3)).as("sh")))
    def vals(src: String) = Funnel.stageLazy(
      Sketches.kmvValues(sh.filter(col("source") === src).select("sh"), "sh", k))
    val va = vals("src0")
    val vb = vals("src1")
    def theta(v: DataFrame, as: String) =
      v.agg(count(lit(1)).as("n"), max("h").as("mx"))
        .select(when(col("n") === k, col("mx")).otherwise(lit(Sketches.KmvDomain)).as(as))
    val th = theta(va, "ta").crossJoin(theta(vb, "tb"))
      .select(col("ta"), col("tb"), least(col("ta"), col("tb")).as("tu"))
    def est1(v: DataFrame, as: String) =
      Sketches.kmvEstimate(v, k).select(col("est_distinct").as(as))
    val nu = va.select("h").union(vb.select("h")).distinct()
      .crossJoin(broadcast(th)).filter(col("h") < col("tu"))
      .agg(count(lit(1)).as("nu"))
    val ni = va.select("h").intersect(vb.select("h"))
      .crossJoin(broadcast(th)).filter(col("h") < col("tu"))
      .agg(count(lit(1)).as("ni"))
    val eu = nu.crossJoin(broadcast(th))
      .select(Sketches.thetaEstimate(col("nu"), col("tu")).as("est_union"))
    val ei = ni.crossJoin(broadcast(th))
      .select(Sketches.thetaEstimate(col("ni"), col("tu")).as("est_inter"))
    val exacts = sh.groupBy("sh").agg(count_distinct(col("source")).as("ns"))
      .agg(count(lit(1)).cast("long").as("n_union"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).cast("long").as("n_inter"))
    est1(va, "est_a").crossJoin(est1(vb, "est_b"))
      .crossJoin(eu).crossJoin(ei).crossJoin(broadcast(exacts))
      .select(col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
        col("n_union"), col("n_inter"))
      .orderBy("est_a")
  }

  val docKmvSetopsSql: String =
    s"""WITH d AS (SELECT source, string_split($normSql, ' ') AS t FROM documents
       |           WHERE source IN ('src0', 'src1')),
       |g AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d WHERE len(t) >= 3),
       |hh AS (SELECT DISTINCT source, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM g),
       |va AS (SELECT h FROM hh WHERE source = 'src0' ORDER BY h LIMIT 256),
       |vb AS (SELECT h FROM hh WHERE source = 'src1' ORDER BY h LIMIT 256),
       |th AS (SELECT
       |  (SELECT CASE WHEN count(*) = 256 THEN max(h) ELSE 1152921504606846976 END FROM va) AS ta,
       |  (SELECT CASE WHEN count(*) = 256 THEN max(h) ELSE 1152921504606846976 END FROM vb) AS tb),
       |tu AS (SELECT least(ta, tb) AS tu FROM th),
       |ea AS (SELECT round((CASE WHEN n = 256 THEN n - 1 ELSE n END)::DOUBLE * power(2.0, 60)
       |         / (CASE WHEN n = 256 THEN mx ELSE 1152921504606846976 END)::DOUBLE, 3) AS est_a
       |       FROM (SELECT count(*)::BIGINT AS n, max(h) AS mx FROM va)),
       |eb AS (SELECT round((CASE WHEN n = 256 THEN n - 1 ELSE n END)::DOUBLE * power(2.0, 60)
       |         / (CASE WHEN n = 256 THEN mx ELSE 1152921504606846976 END)::DOUBLE, 3) AS est_b
       |       FROM (SELECT count(*)::BIGINT AS n, max(h) AS mx FROM vb)),
       |nu AS (SELECT count(*)::BIGINT AS nu FROM
       |         (SELECT DISTINCT h FROM (SELECT h FROM va UNION ALL SELECT h FROM vb)), tu
       |       WHERE h < tu.tu),
       |ni AS (SELECT count(*)::BIGINT AS ni FROM
       |         (SELECT h FROM va INTERSECT SELECT h FROM vb), tu
       |       WHERE h < tu.tu),
       |eu AS (SELECT round(nu::DOUBLE * power(2.0, 60) / tu::DOUBLE, 3) AS est_union FROM nu, tu),
       |ei AS (SELECT round(ni::DOUBLE * power(2.0, 60) / tu::DOUBLE, 3) AS est_inter FROM ni, tu),
       |ex AS (SELECT count(*)::BIGINT AS n_union,
       |         sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END)::BIGINT AS n_inter
       |       FROM (SELECT sh, count(DISTINCT source) AS ns FROM g GROUP BY 1))
       |SELECT est_a, est_b, est_union, est_inter, n_union, n_inter
       |FROM ea, eb, eu, ei, ex ORDER BY est_a""".stripMargin

  /** Trailing-3-day distinct actives via per-day KMV sketches — the
    * FOURTH leg of the windowable-sketch algebra (HLL registers
    * max-merge, count-min cells sum-merge, Bloom bits OR-merge, KMV
    * values bottom-k-merge): per-day sketches persist once (≤64 longs
    * a day), any trailing window is a θ-intersection-free union-merge
    * over tiny rows — est = |distinct retained below θ_u|·2^60/θ_u
    * with θ_u = min contributing θ. Exact audit re-shuffles every
    * (day, item) pair — the cost the sketch path avoids at 100 TB.
    */
  def evtKmvWindow(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val p = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"),
        concat(col("user_id").cast("string"), lit("|"), col("event_type")).as("item"))
    val perDay = Funnel.stageLazy(Sketches.kmvValuesBy(p, "day", "item", k))
    val th = perDay.groupBy("key").agg(count(lit(1)).as("n"), max("h").as("mx"))
      .select(col("key"),
        when(col("n") === k, col("mx")).otherwise(lit(Sketches.KmvDomain)).as("theta_d"))
    val days = Funnel.stageLazy(perDay.select(col("key").as("day")).distinct())
    val contrib = perDay.join(th, "key")
      .withColumn("off", explode(array(lit(0), lit(1), lit(2))))
      .select(date_add(col("key"), col("off")).as("day"), col("h"), col("theta_d"))
      .join(days, "day")
    val thetaU = Funnel.stageLazy(contrib.groupBy("day").agg(min("theta_d").as("theta")))
    val est = contrib.join(thetaU, "day")
      .filter(col("h") < col("theta"))
      .select(col("day"), col("h")).distinct()
      .groupBy("day").agg(count(lit(1)).as("n_ret"))
      .join(thetaU, "day")
      .select(col("day"), Sketches.thetaEstimate(col("n_ret"), col("theta")).as("est_3d"))
    val exact = p.distinct()
      .withColumn("off", explode(array(lit(0), lit(1), lit(2))))
      .select(date_add(col("day"), col("off")).as("day"), col("item"))
      .join(days, "day")
      .groupBy("day").agg(count_distinct(col("item")).as("n_exact_3d"))
    est.join(exact, "day")
      .select(col("day").cast("string").as("day"), col("est_3d"),
        col("n_exact_3d").cast("long").as("n_exact_3d"))
      .orderBy("day")
  }

  val evtKmvWindowSql: String =
    Tables.eventsCte +
      """
        |, p AS (SELECT DISTINCT ts::DATE AS day,
        |          user_id::VARCHAR || '|' || event_type AS item FROM ev),
        |hh AS (SELECT DISTINCT day, ('0x' || substr(md5(item), 1, 15))::BIGINT AS h FROM p),
        |v AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
        |      FROM hh QUALIFY rn <= 64),
        |th AS (SELECT day, CASE WHEN count(*) = 64 THEN max(h)
        |                        ELSE 1152921504606846976 END AS theta_d
        |       FROM v GROUP BY 1),
        |days AS (SELECT DISTINCT day FROM p),
        |c2 AS (SELECT tgt.day, c.h, c.theta_d FROM
        |         (SELECT (v.day + o.off * INTERVAL 1 DAY)::DATE AS day, v.h, th.theta_d
        |          FROM v JOIN th USING (day), range(0, 3) o(off)) c
        |       JOIN days tgt ON tgt.day = c.day),
        |tu AS (SELECT day, min(theta_d) AS theta FROM c2 GROUP BY 1),
        |sm AS (SELECT c2.day, count(DISTINCT c2.h)::BIGINT AS n_ret
        |       FROM c2 JOIN tu USING (day) WHERE c2.h < tu.theta GROUP BY 1),
        |est AS (SELECT day, round(n_ret::DOUBLE * power(2.0, 60) / theta::DOUBLE, 3) AS est_3d
        |        FROM sm JOIN tu USING (day)),
        |ex AS (SELECT e.day, count(DISTINCT e.item)::BIGINT AS n_exact_3d FROM
        |         (SELECT (p.day + o.off * INTERVAL 1 DAY)::DATE AS day, p.item
        |          FROM p, range(0, 3) o(off)) e
        |       JOIN days tgt ON tgt.day = e.day GROUP BY 1)
        |SELECT est.day::VARCHAR AS day, est_3d, n_exact_3d
        |FROM est JOIN ex USING (day) ORDER BY 1""".stripMargin

  /** Trailing-3-day P50/P90/P99 via per-day HDR histogram cells — the
    * QUANTILE leg of the windowable-sketch algebra: per-day cells
    * (≤ 8 bins per octave) persist once and SUM-merge over the window
    * exactly like count-min; the percentile reads off a cumulative
    * sum over the tiny merged rows as [[graft.operators.Sketches.hdrUb]]
    * of the first bin reaching ⌈q·N⌉ (within 12.5 % of the true order
    * statistic by the bucket-width bound). The exact audit re-sorts
    * the raw 3-day window per target day — the cost the sketch path
    * avoids at 100 TB. Metric domain: floor(value)+1 (positive long).
    */
  def evtQuantileWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), (floor(col("value")).cast("long") + 1).as("v"))
    val perDay = Funnel.stageLazy(Sketches.hdrCellsBy(p, "day", "v"))
    val days = Funnel.stageLazy(perDay.select(col("key").as("day")).distinct())
    val merged = perDay
      .withColumn("off", explode(array(lit(0), lit(1), lit(2))))
      .select(date_add(col("key"), col("off")).as("day"), col("bin"), col("cnt"))
      .join(days, "day")
      .groupBy("day", "bin").agg(sum("cnt").as("cnt"))
    val cum = merged
      .withColumn("acc", sum("cnt").over(Window.partitionBy("day").orderBy("bin")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("day")))
      .withColumn("k50", expr("(n + 1) div 2"))
      .withColumn("k90", expr("(9 * n + 9) div 10"))
      .withColumn("k99", expr("(99 * n + 99) div 100"))
    val est = cum.groupBy("day").agg(
      max("n").cast("long").as("n"),
      min(when(col("acc") >= col("k50"), col("bin"))).as("b50"),
      min(when(col("acc") >= col("k90"), col("bin"))).as("b90"),
      min(when(col("acc") >= col("k99"), col("bin"))).as("b99"))
      .select(col("day"), col("n"),
        Sketches.hdrUb(col("b50")).cast("long").as("p50_est"),
        Sketches.hdrUb(col("b90")).cast("long").as("p90_est"),
        Sketches.hdrUb(col("b99")).cast("long").as("p99_est"))
    val raw = p
      .withColumn("off", explode(array(lit(0), lit(1), lit(2))))
      .select(date_add(col("day"), col("off")).as("day"), col("v"))
      .join(days, "day")
      .withColumn("rn", row_number().over(Window.partitionBy("day").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("day")))
      .withColumn("k50", expr("(n + 1) div 2"))
      .withColumn("k90", expr("(9 * n + 9) div 10"))
      .withColumn("k99", expr("(99 * n + 99) div 100"))
    val exact = raw.groupBy("day").agg(
      max(when(col("rn") === col("k50"), col("v"))).cast("long").as("p50_exact"),
      max(when(col("rn") === col("k90"), col("v"))).cast("long").as("p90_exact"),
      max(when(col("rn") === col("k99"), col("v"))).cast("long").as("p99_exact"))
    est.join(exact, "day")
      .select(col("day").cast("string").as("day"), col("n"),
        col("p50_est"), col("p90_est"), col("p99_est"),
        col("p50_exact"), col("p90_exact"), col("p99_exact"))
      .orderBy("day")
  }

  val evtQuantileWindowSql: String =
    Tables.eventsCte +
      """
        |, p AS (SELECT ts::DATE AS day, (floor(value)::BIGINT + 1) AS v FROM ev),
        |b AS (SELECT day, CASE WHEN v < 16 THEN v
        |        ELSE 16 + (length(bin(v)) - 5) * 8 +
        |             ((v - (1::BIGINT << (length(bin(v)) - 1))) >> (length(bin(v)) - 4))
        |        END AS bin FROM p),
        |cells AS (SELECT day, bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM p),
        |m AS (SELECT tgt.day AS day, c.bin, sum(c.cnt)::BIGINT AS cnt
        |      FROM (SELECT (cells.day + o.off * INTERVAL 1 DAY)::DATE AS day, bin, cnt
        |            FROM cells, range(0, 3) o(off)) c
        |      JOIN days tgt ON tgt.day = c.day GROUP BY 1, 2),
        |cum AS (SELECT day, bin,
        |          sum(cnt) OVER (PARTITION BY day ORDER BY bin) AS acc,
        |          sum(cnt) OVER (PARTITION BY day) AS n FROM m),
        |est AS (SELECT day, max(n)::BIGINT AS n,
        |          min(CASE WHEN acc >= (n + 1) // 2 THEN bin END) AS b50,
        |          min(CASE WHEN acc >= (9 * n + 9) // 10 THEN bin END) AS b90,
        |          min(CASE WHEN acc >= (99 * n + 99) // 100 THEN bin END) AS b99
        |        FROM cum GROUP BY 1),
        |ub AS (SELECT day, n,
        |  (CASE WHEN b50 < 16 THEN b50 ELSE (1::BIGINT << (4 + (b50 - 16) // 8))
        |     + ((b50 - 16) % 8 + 1) * (1::BIGINT << (1 + (b50 - 16) // 8)) - 1 END)::BIGINT AS p50_est,
        |  (CASE WHEN b90 < 16 THEN b90 ELSE (1::BIGINT << (4 + (b90 - 16) // 8))
        |     + ((b90 - 16) % 8 + 1) * (1::BIGINT << (1 + (b90 - 16) // 8)) - 1 END)::BIGINT AS p90_est,
        |  (CASE WHEN b99 < 16 THEN b99 ELSE (1::BIGINT << (4 + (b99 - 16) // 8))
        |     + ((b99 - 16) % 8 + 1) * (1::BIGINT << (1 + (b99 - 16) // 8)) - 1 END)::BIGINT AS p99_est
        |  FROM est),
        |raw AS (SELECT tgt.day AS day, r.v
        |        FROM (SELECT (p.day + o.off * INTERVAL 1 DAY)::DATE AS day, v
        |              FROM p, range(0, 3) o(off)) r
        |        JOIN days tgt ON tgt.day = r.day),
        |rk AS (SELECT day, v, row_number() OVER (PARTITION BY day ORDER BY v) AS rn,
        |         count(*) OVER (PARTITION BY day) AS n FROM raw),
        |ex AS (SELECT day,
        |         max(CASE WHEN rn = (n + 1) // 2 THEN v END)::BIGINT AS p50_exact,
        |         max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END)::BIGINT AS p90_exact,
        |         max(CASE WHEN rn = (99 * n + 99) // 100 THEN v END)::BIGINT AS p99_exact
        |       FROM rk GROUP BY 1)
        |SELECT ub.day::VARCHAR AS day, n, p50_est, p90_est, p99_est,
        |  p50_exact, p90_exact, p99_exact
        |FROM ub JOIN ex USING (day) ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_doc_hll", docHll, Some(docHllSql)),
    Q("q_evt_quantile_window", evtQuantileWindow, Some(evtQuantileWindowSql)),
    Q("q_doc_kmv", docKmv, Some(docKmvSql)),
    Q("q_doc_kmv_setops", docKmvSetops, Some(docKmvSetopsSql)),
    Q("q_evt_kmv_window", evtKmvWindow, Some(evtKmvWindowSql)),
    Q("q_evt_wau_hll", evtWauHll, Some(evtWauHllSql)),
    Q("q_evt_cms_window", evtCmsWindow, Some(evtCmsWindowSql)),
    Q("q_evt_cms_change", evtCmsChange, Some(evtCmsChangeSql)),
    Q("q_evt_bloom_window", evtBloomWindow, Some(evtBloomWindowSql)),
    Q("q_doc_hll_by_source", docHllBySource, Some(docHllBySourceSql)),
    Q("q_doc_hll_setops", docHllSetops, Some(docHllSetopsSql)),
    Q("q_doc_cms_heavy", docCms, Some(docCmsSql)),
    Q("q_doc_mg_heavy", docMgHeavy, Some(docMgHeavySql)),
    Q("q_doc_bloom_delta", docBloomDelta, Some(docBloomDeltaSql))
  )
}
