package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Plan-shape regression tests: the scale architecture depends on
  * filters/columns reaching the parquet scan and dimension sides being
  * broadcast — assert it so a refactor can't silently regress the
  * physical plan (SURVEY §4 "optimize for scale" checklist).
  */
class PlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("a DDL-declared table keeps pushdown and column pruning at the scan") {
    // the DDL route registers Spark's own reader — a query over it must
    // plan exactly like a native read: predicate pushed, schema pruned
    val env = TableEnv(spark, dir)
    env.executeSql(
      s"""CREATE TABLE plan_lineitem (
         |  l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
         |  l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
         |  l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,
         |  l_linestatus STRING, l_shipdate TIMESTAMP(3)
         |) WITH ('connector'='filesystem', 'path'='$dir/lineitem.parquet',
         |  'format'='parquet')""".stripMargin)
    val p = env.sqlQuery(
      """SELECT l_returnflag, count(*) AS n FROM plan_lineitem
        |WHERE l_quantity > 30 GROUP BY l_returnflag""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"DDL-route scan lost predicate pushdown:\n$p")
    assert("ReadSchema:[^\\n]*l_quantity".r.findFirstIn(p).isDefined &&
      !"ReadSchema:[^\\n]*l_extendedprice".r.findFirstIn(p).isDefined,
      s"DDL-route scan lost column pruning:\n$p")
  }

  test("q_agg_pricing pushes the shipdate filter and prunes columns at the scan") {
    val p = planString("q_agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "pruned column still read")
  }

  test("q_join_inner broadcasts the dimension sides") {
    val p = planString("q_join_inner")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_calc keeps project+filter in one whole-stage codegen span over the scan") {
    val df = SparkEntry.queries("q_calc")(spark, dir)
    // collect() executes THIS QueryExecution (count() would build a new
    // one), finalizing the adaptive plan so codegen nodes materialize
    df.collect()
    val finalPlan: SparkPlan = df.queryExecution.executedPlan
    val codegenSpans = collectWithSubqueries(finalPlan) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty, s"no WholeStageCodegen in:\n$finalPlan")
    assert(finalPlan.toString.contains("PushedFilters"))
  }

  test("q_emb_topk uses the codegen cosine kernel (no UDF in the plan)") {
    val p = planString("q_emb_topk")
    assert(p.contains("cosine_sim"))
    assert(!p.toLowerCase.contains("batchevalpython"))
    assert(!p.contains("ScalaUDF"))
  }

  test("q_emb_topk ranks via two-phase aggregation, not a per-query window") {
    val p = planString("q_emb_topk")
    // the scale-killer shape: row_number() OVER (PARTITION BY qid) pushes
    // every scored corpus row into ≤|queries| tasks
    assert(!p.contains("Window"), s"global per-qid window back in plan:\n$p")
    // partial (map-side) + final top-k aggregate instead
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"))
  }

  test("q_tpch_q9 (join-heavy): equi-joins only, no cartesian, pushdown intact") {
    val p = planString("q_tpch_q9")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join crept into q9:\n$p")
    assert(p.contains("PushedFilters"), s"scan pushdown lost:\n$p")
  }

  test("q_tpch_q6 pushes every predicate to the scan and aggregates in one span") {
    val p = planString("q_tpch_q6")
    // toString truncates long filter lists — assert the stable prefix
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), s"no pushdown:\n$p")
    assert(!p.contains("Join"), s"scan-agg query grew a join:\n$p")
  }

  test("q_window_cumulate: bounded explode, no join, single agg exchange") {
    val p = planString("q_window_cumulate")
    assert(p.contains("Generate explode"), s"explode missing:\n$p")
    assert(!p.contains("Join"), s"cumulate should not join:\n$p")
  }

  test("q_emb_neardup candidates come from a bucket equi-join, never a cartesian") {
    val p = planString("q_emb_neardup")
    assert(!p.contains("CartesianProduct"), s"all-pairs join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$p")
    // multi-band hits are collapsed by first-match emission inside the
    // join stage — the old groupBy(a,b) dedup exchange must stay gone
    assert(p.contains("band_first_match"), s"first-match filter missing:\n$p")
    assert(!p.contains("max("), s"post-verify max() dedup agg crept back:\n$p")
  }

  test("q_doc_simhash dedups by first-match emission, not a dropDuplicates exchange") {
    val p = planString("q_doc_simhash")
    assert(p.contains("band_first_match"), s"first-match filter missing:\n$p")
    // dropDuplicates(da, db) compiled to an aggregate over the candidate
    // stream; with first-match emission no aggregate belongs in the plan
    assert(!p.contains("first("), s"dropDuplicates agg crept back:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs join:\n$p")
  }

  test("q_doc_cdc_chunks runs inside the scan stage — linear, no shuffle, no window") {
    // chunk ids, sizes, and fingerprints are all computed in the array
    // domain in one pass; the old explode→prefix-scan→regroup shape was
    // O(tokens²) per doc and paid an (id, chunk) exchange
    val p = planString("q_doc_cdc_chunks")
    assert(!p.contains("Exchange hashpartitioning"), s"cdc chunking shuffles:\n$p")
    assert(!p.contains("Window"), s"window crept into cdc chunking:\n$p")
    assert(!p.contains("Join"), s"cdc chunking joins:\n$p")
  }

  test("q_doc_minhash: first-match emission leaves no dedup aggregate or extra exchange") {
    // Candidates are unique by construction (BandFirstMatch filter inside
    // the band join), so the plan must contain NO aggregate at all — the
    // old pipeline's groupBy(da,db) dedup — and only the two deliberate
    // exchanges: the probe-spreading repartition and the hot-bucket
    // cap's aggregation branch.
    val p = planString("q_doc_minhash")
    assert(!p.contains("SortAggregate"), s"dedup agg crept back:\n$p")
    assert(p.contains("band_first_match"), s"first-match filter missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs join:\n$p")
    // The old pipeline deduped with groupBy(da,db).agg(first(jacc)) —
    // lock on that aggregate function directly: the only aggregates
    // allowed in this plan are the hot-bucket cap's count and the
    // fingerprint min, never a first() over verified pairs.
    assert(!p.contains("first("), s"post-verify first() dedup agg crept back:\n$p")
  }

  test("q_doc_sample_balanced joins the rate table by broadcast, not shuffle") {
    // The corpus side must stream through a map stage: the per-stratum
    // rate table (a handful of rows) is broadcast and the keep decision
    // is a per-row predicate — a shuffle join here would be the shape
    // that dies on an 80%-one-language corpus.
    val p = planString("q_doc_sample_balanced")
    assert(p.contains("BroadcastHashJoin"), s"rate join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the rate join:\n$p")
    assert(!p.contains("ScalaUDF"), s"non-codegen predicate:\n$p")
  }

  test("q_doc_decontaminate broadcasts the eval shingles; corpus shingles never shuffle") {
    // Benchmark sets are tiny next to a 100 TB corpus: the eval side's
    // exploded shingle table must be broadcast (both the anti-join on
    // ids and the shingle join), leaving the only exchange to the sparse
    // (train_id, eval_id) hit aggregation.
    val p = planString("q_doc_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus shingles shuffled for the join:\n$p")
  }

  test("q_doc_domain_cap caps via two-phase aggregate, not a per-domain window") {
    // A global row_number() OVER (PARTITION BY source) funnels every row
    // of a hot domain into one task — the norm at 100 TB, where one
    // domain dominates. The bounded keep-list aggregate ships ≤ cap rows
    // per (domain, partition) map-side instead.
    val p = planString("q_doc_domain_cap")
    assert(!p.contains("Window"), s"per-domain window back in plan:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"bounded keep-list aggregate missing:\n$p")
  }

  test("q_doc_repetition and q_doc_pii run inside the scan stage — no shuffle, no UDF") {
    for (name <- Seq("q_doc_repetition", "q_doc_pii")) {
      val p = planString(name)
      assert(!p.contains("Exchange hashpartitioning"), s"$name shuffles:\n$p")
      assert(!p.contains("Join"), s"$name joins:\n$p")
      assert(!p.contains("ScalaUDF"), s"$name uses a UDF:\n$p")
    }
  }

  test("q_doc_mix_epochs is a pure generator — explode, no hash exchange") {
    val p = planString("q_doc_mix_epochs")
    assert(p.contains("Generate explode"), s"epoch generator missing:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"mix shuffles:\n$p")
    assert(!p.contains("Join"), s"mix joins:\n$p")
  }

  test("q_emb_outlier_score broadcasts centroids back over the corpus scan") {
    // The corpus never shuffles: the only exchanges belong to the tiny
    // (label, pos) centroid aggregation; scoring joins the assembled
    // centroid table by broadcast.
    val p = planString("q_emb_outlier_score")
    assert(p.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the centroid join:\n$p")
    assert(!p.contains("ScalaUDF"), s"non-codegen scoring:\n$p")
  }

  test("q_doc_chunk_dedup shuffles only on high-cardinality keys — no window, no cartesian") {
    val p = planString("q_doc_chunk_dedup")
    assert(!p.contains("Window"), s"window crept into chunk dedup:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in chunk dedup:\n$p")
  }

  test("q_sink_bucketed: co-located join — zero hash exchanges scan→join→aggregate") {
    // Both tables are bucketed 8 ways on the join key, so the sort-merge
    // join and the follow-on aggregate must inherit the bucket layout:
    // any Exchange hashpartitioning here means the write-time shuffle
    // amortization is broken (the final orderBy's range exchange is the
    // query's presentation sort, not part of the join pipeline).
    val p = planString("q_sink_bucketed")
    assert(p.contains("SortMergeJoin"), s"bucketed join not sort-merge:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"bucket layout not reused:\n$p")
  }

  test("q_sink_dpp: fact scan carries a dynamic partition pruning filter") {
    // The dim filter is only known at runtime; the fact scan must read
    // only the surviving partitions via the injected pruning subquery —
    // without it, a star join reads the whole fact table at 100 TB.
    val p = planString("q_sink_dpp")
    assert(p.contains("dynamicpruningexpression"), s"DPP did not fire:\n$p")
  }

  test("q_doc_budget: the corpus prefix sum runs in a bucket-partitioned window") {
    // The defining semantics is sum(n) OVER (ORDER BY pri) — but an
    // UNPARTITIONED ordered window funnels the whole corpus through one
    // task. The corpus-side window must partition by the priority bucket
    // (256-way parallel); only the 256-row bucket-offset table may see a
    // single-partition window, and it reaches the corpus via broadcast.
    val p = planString("q_doc_budget")
    assert("windowspecdefinition\\(bucket#\\d+, pri#".r.findFirstIn(p).isDefined,
      s"bucket-partitioned corpus window missing:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"bucket offsets not broadcast:\n$p")
  }

  test("q_doc_pack shuffles once (shard repartition) and sorts only within partitions") {
    // Greedy packing = one hash exchange on the shard key + an intra-
    // partition sort feeding the sequential pass. A global Sort (with its
    // own range exchange) before the mapPartitions would mean the packing
    // no longer scales out; the final orderBy of the QUERY is allowed.
    val packed = graft.operators.Packing.packGreedy(
      graft.Tables.documents(spark, dir), budget = 256, shards = 32,
      idCol = "doc_id", tokensCol = graft.operators.TextAnalysis.tokenCount(
        org.apache.spark.sql.functions.col("text")))
    val p = packed.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort crept in:\n$p")
  }

  test("q_join_bloom_reduce: the Bloom probe filters the fact scan before any exchange") {
    // the operator's whole point: non-matching fact rows die in the scan
    // stage, so the probe filter must sit directly over the parquet scan
    // with no shuffle between — and be pure codegen'd built-ins (no UDF)
    val plan = SparkEntry.queries("q_join_bloom_reduce")(spark, dir)
      .queryExecution.executedPlan
    val probeFilters = collectWithSubqueries(plan) {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("shiftright") => f
    }
    assert(probeFilters.nonEmpty, s"Bloom probe filter missing:\n$plan")
    assert(probeFilters.exists { f =>
      f.collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.isDefined &&
        f.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.isEmpty
    }, s"probe filter not fused onto the scan stage:\n$plan")
    val ps = plan.toString
    assert(!ps.contains("ScalaUDF") && !ps.contains("BatchEvalPython"),
      s"probe must be codegen'd built-ins:\n$ps")
  }

  // ---------------------------------------------------------------- //
  // Scan-count locks: "a second reference silently doubles the       //
  // lineage" is the composition bug class (the round-6 funnel plan   //
  // scanned the corpus 24×, delta-dedup 11×). Lock every             //
  // multi-reference composition's parquet-scan count at its healthy  //
  // value so a dropped Funnel.stage boundary (or a new stage frame   //
  // referenced twice without one) fails here, not in the bench.      //
  // ---------------------------------------------------------------- //

  private def scanCounts(name: String): (Int, Int) = {
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
    val parquet = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.size
    val rdd = collectWithSubqueries(plan) {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }.size
    (parquet, rdd)
  }

  test("q_doc_pipeline_full: stage boundaries hold — no parquet re-scan in the final plan") {
    val (parquet, rdd) = scanCounts("q_doc_pipeline_full")
    // all three stages are checkpointed; the final split+aggregate reads
    // only materialized stage blocks (was 24 parquet scans without them)
    assert(parquet == 0, s"funnel v2 re-reads parquet $parquet times — a stage boundary was dropped")
    assert(rdd >= 1, "no materialized stage blocks in the plan — Funnel.stage removed?")
  }

  test("q_doc_pipeline: single-pass min_by funnel scans the corpus exactly once") {
    assert(scanCounts("q_doc_pipeline")._1 == 1)
  }

  test("q_doc_delta_dedup: prep stages scan base and delta once; classify reads staged blocks") {
    val (parquet, _) = scanCounts("q_doc_delta_dedup")
    assert(parquet == 0, s"delta dedup re-reads parquet $parquet times (was 11 before staging)")
  }

  test("q_emb_pq / q_emb_kmeans: staged training input — no per-round parquet re-read") {
    // the cast/subvector table is materialized once (MLlib-persist
    // discipline); before the stages the plans re-read the embeddings
    // parquet once per Lloyd round (8 scans for PQ, 4 for kmeans).
    // PQ's one remaining scan is the query side's probe read.
    assert(scanCounts("q_emb_pq")._1 <= 1)
    assert(scanCounts("q_emb_kmeans")._1 == 0)
  }

  test("graph family: co-occurrence constructor and edge frames evaluate once") {
    // the constructor stages its membership and capped tables and every
    // downstream multi-reference is staged or derived from one pass, so
    // the final plans read ONLY materialized blocks — a parquet scan
    // here means a boundary was dropped (the 4-scans-per-constructor
    // regression this locks out)
    for (q <- Seq("q_graph_triangles", "q_graph_metrics", "q_graph_triads",
        "q_graph_sssp", "q_graph_jaccard", "q_graph_adamic_adar", "q_graph_kcore")) {
      val (parquet, rdd) = scanCounts(q)
      assert(parquet == 0, s"$q re-reads parquet $parquet times past the stage boundaries")
      assert(rdd >= 1, s"$q has no materialized stage blocks — Funnel.stage removed?")
    }
  }

  test("q_emb_ivfpq: staged corpus/residual/subvector frames — query side scans once") {
    // e, assigned, and sub are each referenced by several downstream
    // frames (centroids + residuals; codes + cell map; training rounds
    // + encode); with the stage boundaries the only parquet read left
    // in the final plan is the query side's probe scan.
    assert(scanCounts("q_emb_ivfpq")._1 <= 1)
  }

  test("q_doc_dsir / q_doc_ppl_buckets: staged intermediates keep corpus scans bounded") {
    // dsir: the two histogram stages each scan once off-plan; the final
    // plan re-explodes the source side exactly once (was 5 scans before
    // the histogram stages). ppl_buckets: scores staged, final plan
    // reads only staged blocks.
    assert(scanCounts("q_doc_dsir")._1 <= 1)
    assert(scanCounts("q_doc_ppl_buckets")._1 == 0)
  }

  test("q_doc_quality_model scores inside the scan stage — no shuffle, no UDF") {
    val plan = SparkEntry.queries("q_doc_quality_model")(spark, dir)
      .queryExecution.executedPlan
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the only exchange is the final global orderBy's range partitioning
    assert(exchanges.size <= 1,
      s"model scoring must ride the scan stage; found ${exchanges.size} exchanges")
    assert(!plan.toString.contains("BatchEvalPython") && !plan.toString.contains("ScalaUDF"),
      "classifier must be literal-table expressions, not a UDF")
  }

  test("q_doc_winnow / q_doc_src_overlap: staged posting lists — one corpus scan off-plan") {
    // both stage a multiply-referenced posting table (winnow: capped
    // postings feed two join sides + sizes; overlap: distinct
    // (source, shingle) feeds two join sides + sizes) — the final plan
    // must read only staged blocks, never the corpus parquet again
    assert(scanCounts("q_doc_winnow")._1 == 0,
      "winnow postings not staged — corpus parquet re-entered the pair plan")
    assert(scanCounts("q_doc_src_overlap")._1 == 0,
      "overlap shingle sets not staged — corpus parquet re-entered the pair plan")
  }

  test("sketch queries: constant-size sketch state, bounded corpus reads") {
    // hll: staged registers serve dump + estimate; the one parquet scan
    // is the exact-distinct AUDIT column (dropped in production).
    // cms: two corpus aggregates (cells, exact top-20) — both map-side
    // partial; the sketch crosses the wire as <= 1024 rows.
    // bloom: the six-way-referenced fingerprint projection is staged;
    // the final plan reads only materialized blocks.
    // kn: the bigram-count model is staged and fans out to its three
    // second-level stat tables; one corpus scan scores.
    assert(scanCounts("q_doc_hll")._1 == 1)
    assert(scanCounts("q_doc_cms_heavy")._1 == 2)
    assert(scanCounts("q_doc_bloom_delta")._1 == 0,
      "bloom fingerprint projection not staged — corpus parquet re-entered the plan")
    assert(scanCounts("q_doc_kn_logprob")._1 == 1)
  }

  test("window-6 additions: staged postings/indexes hold, no cartesian creep") {
    // phrase/proximity read ONLY the staged positional postings (no
    // parquet re-entry per term leg); itemsets' staged frames bound the
    // basket scans; typo pairs' candidate join is the variant equi-join
    val locks = Map(
      "q_doc_phrase" -> 0, "q_doc_proximity" -> 0,
      "q_evt_itemsets" -> 1, "q_doc_typo_pairs" -> 0,
      // latency re-reads events ON PURPOSE: both scans carry pushed
      // event_type filters, so two pruned scans beat materializing the
      // unfiltered frame; the lock pins "two pushdown scans, no more"
      "q_evt_latency" -> 2,
      // lda: class sums collect during construction; the FINAL plan is
      // one projection scan with the direction as a literal
      "q_emb_lda" -> 1,
      // survival: staged session frame feeds the corpus-end scalar AND
      // the duration grouping — events parquet never re-enters
      "q_evt_survival" -> 0,
      // js drift: everything is a second-level aggregate of the staged
      // (source, word) count table
      "q_doc_js_drift" -> 0,
      // fingerprint pairs: the staged hash table feeds both band sides
      "q_mm_phash" -> 0, "q_mm_audiohash" -> 0,
      // prefix join: candidates and verify both read the staged token sets
      "q_doc_ppjoin" -> 0,
      // ltv: one staged (user, day, revenue) pre-aggregate feeds everything
      "q_evt_ltv" -> 0,
      // robust trend: staged daily + indexed frames feed pairs/ties/medians
      "q_evt_trend_robust" -> 0,
      // textrank: every round reads the staged edge/weight/node frames
      "q_doc_textrank" -> 0)
    for ((name, bound) <- locks) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      val (parquet, _) = scanCounts(name)
      assert(parquet <= bound, s"$name parquet scans $parquet > $bound — a stage boundary dropped")
      assert(!plan.toString.contains("CartesianProduct"), s"$name grew a cartesian:\n$plan")
    }
  }

  test("q_doc_substr_spans / q_doc_substr_strip: staged window table holds") {
    // the md5-window explode is the expensive pass and fans out twice
    // (df count + probe) — spans must read ONLY the staged blocks;
    // strip adds exactly one parquet scan (the docs join-back)
    val (sp, spRdd) = scanCounts("q_doc_substr_spans")
    assert(sp == 0, s"substr spans re-explodes the corpus ($sp parquet scans)")
    assert(spRdd >= 1, "no staged window blocks in the spans plan")
    assert(scanCounts("q_doc_substr_fast")._1 == 0,
      "rolling-hash spans re-explode the corpus — stage boundary dropped")
    val (st, _) = scanCounts("q_doc_substr_strip")
    assert(st == 1, s"substr strip should scan docs exactly once (join-back), got $st")
  }

  test("q_evt_rfm: staged user frame — events parquet never re-enters the final plan") {
    // the user-RFM frame fans out three ways (global-now aggregate,
    // tertile thresholds, scored probe side); `now` is a second-level
    // aggregate of the staged per-user maxima, so the final plan holds
    // zero parquet scans (was 4 events scans unstaged — r7 verdict #2)
    val (parquet, rdd) = scanCounts("q_evt_rfm")
    assert(parquet == 0, s"q_evt_rfm re-reads events parquet $parquet times — stage boundary dropped")
    assert(rdd >= 1, "no materialized stage blocks in the q_evt_rfm plan — Funnel.stage removed?")
  }

  test("time-series analytics: staged dailies never re-read events; single-pass members scan once") {
    // cusum/acf/seasonal fan their daily rollup out 2-3 ways (totals
    // broadcast + deviation/weekday frames) — Funnel.stage makes the
    // fan-out free; a parquet scan here means the boundary dropped
    for (q <- Seq("q_evt_cusum", "q_evt_acf", "q_evt_seasonal")) {
      val (parquet, rdd) = scanCounts(q)
      assert(parquet == 0, s"$q re-reads events parquet $parquet times — stage boundary dropped")
      assert(rdd >= 1, s"no materialized stage block in the $q plan")
    }
    // single-reference members: exactly the one corpus scan
    for (q <- Seq("q_evt_ewma", "q_evt_pivot", "q_evt_melt", "q_evt_forecast"))
      assert(scanCounts(q)._1 == 1, s"$q should scan events exactly once")
  }

  test("q_emb_neardup_keeper / q_iterate_*: loop plans stay truncated (bounded scans)") {
    // healthy values measured r7: keeper = 1 parquet (corpus join-back)
    // + 3 staged-block reads; the iterate loops end on checkpointed
    // frames. Growth past these means a loop stopped truncating lineage.
    val bounds = Map("q_emb_neardup_keeper" -> 4,
      "q_iterate_bfs" -> 3, "q_iterate_delta" -> 3, "q_iterate_pagerank" -> 3,
      // sssp ends on the last staged frontier + the staged edge list
      "q_graph_sssp" -> 3)
    for ((name, bound) <- bounds) {
      val (parquet, rdd) = scanCounts(name)
      assert(parquet + rdd <= bound,
        s"$name plan holds $parquet parquet + $rdd rdd scans — lineage growing across iterations")
    }
  }
}
