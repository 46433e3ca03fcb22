package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data pipelines:
  * rebalance a corpus across strata (language, source, …) without a
  * random seed or a per-stratum sort.
  *
  * Mechanism: a row is kept iff the first 8 hex digits of md5(id) fall
  * under the stratum's rate threshold. md5 is engine-portable, so the
  * sample is reproducible anywhere (the DuckDB oracle replays it
  * exactly), and the decision is a pure per-row predicate: one scan
  * over the corpus plus a broadcast join of the tiny per-stratum rate
  * table. No window, no sort, no skew sensitivity — at 100 TB the big
  * side streams through a map stage, which is the only shape that
  * holds up when one stratum (say `en`) is 80 % of the data. The
  * trade: sampled counts are binomially close to rate·n rather than
  * exact — the standard contract for hash-threshold sampling at scale
  * (exact-count sampling would need a per-stratum total order).
  */
object Sampling {

  /** Hex threshold string for a keep-rate in [0, 1]: rows whose
    * md5-prefix (8 hex chars = 32 bits, uniform) compares `<=` this
    * string are kept. Clamped to 0xFFFFFFFF so rate 1.0 keeps every row
    * (hex(2^32) is 9 chars and would otherwise be mangled by the 8-char
    * pad). Rate arithmetic is plain IEEE division and a power-of-two
    * scale, so both engines derive the identical string.
    */
  private def hexThreshold(rate: Column): Column =
    lpad(lower(hex(least(floor(rate * 4294967296.0).cast("long"), lit(4294967295L)))), 8, "0")

  /** Downsample every stratum to (approximately) the size of the
    * smallest stratum: keep-rate per stratum = min-count / count.
    * Returns the kept rows with their stratum's `rate` attached.
    */
  def balancedHashSample(df: DataFrame, strataCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("str_cnt"))
    val target = counts.agg(min("str_cnt").as("target"))
    val rates = counts.crossJoin(broadcast(target))
      .select(col(strataCol), (col("target").cast("double") / col("str_cnt")).as("rate"))
    df.join(broadcast(rates), strataCol)
      .filter(substring(md5(col(idCol).cast("string")), 1, 8) <= hexThreshold(col("rate")))
  }

  /** Temperature-based mixture sampling (the multilingual rebalancing
    * step of mBERT/XLM-R-style pipelines, public literature — Conneau
    * et al. 2020 §3.1 sample languages ∝ n^α): stratum l gets target
    * share q_l = n_l^α / Σ n_m^α (α < 1 upsamples the tail relative to
    * the head), and a `targetTotal`-row mixture implies keep-rate
    * min(1, targetTotal·q_l / n_l). Selection is the same
    * hash-threshold predicate as [[balancedHashSample]] — deterministic,
    * engine-portable, zero-shuffle for the corpus side.
    *
    * `pow` is transcendental, so each weight is rounded to 6 and the
    * final rate to 9 before the threshold derives — both engines then
    * build the identical cut string.
    */
  def temperatureSample(df: DataFrame, strataCol: String, idCol: String,
      alpha: Double, targetTotal: Long): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n"))
    val w = round(pow(col("n"), alpha), 6)
    val z = counts.agg(sum(round(pow(col("n"), alpha), 6)).as("z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(strataCol),
        round(least(lit(1.0), lit(targetTotal) * w / col("z") / col("n")), 9).as("rate"))
    df.join(broadcast(rates), strataCol)
      .filter(substring(md5(col(idCol).cast("string")), 1, 8) <= hexThreshold(col("rate")))
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * public literature): score every SOURCE document by how much its
    * hashed-bigram distribution looks like the TARGET corpus —
    * `logw = Σ_features log(p_target(b) / p_source(b))` over the doc's
    * bigram features hashed into `buckets` buckets, with add-one
    * smoothing over the bucket domain. High-weight docs are the ones
    * importance resampling keeps when fitting a raw crawl to a quality
    * target (the continued-pretraining data-selection step).
    *
    * Scale shape: both bucket histograms are one explode + partial
    * hash aggregate collapsing to `buckets` rows; the log-ratio table
    * (`buckets` rows) is BROADCAST back over the source's feature
    * stream, so the corpus never shuffles on anything but the final
    * per-doc aggregate. The bucket hash is md5-derived (4 hex digits →
    * integer), so the oracle replays the weights bit-for-bit: the
    * probability ratio is rounded to 9 before `ln`, and each λ is then
    * fixed to INTEGER nano-units so the per-doc sum is an exact integer
    * aggregate — a float sum here is order-dependent across engines and
    * flips the 6-decimal rounding on boundary docs (observed once at
    * sf0.01 before the integer fix).
    *
    * Output: (id, n_feats, logw) per source document.
    */
  def dsirWeights(source: DataFrame, target: DataFrame, buckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0 && buckets <= 65536, s"buckets must fit 4 hex digits, got $buckets")
    def feats(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("id"),
          explode(TextAnalysis.shingles(col(textCol), 2)).as("bg"))
        .withColumn("b",
          pmod(graft.functions.GraftFunctions.md5_prefix(col("bg"), 4), lit(buckets.toLong)))
    val srcF = feats(source)
    val tgtF = feats(target)
    // the histograms are `buckets` rows but their LINEAGE is a full
    // corpus explode — each is referenced twice below (ratio join +
    // total), so without a stage boundary the plan re-scans the corpus
    // 5× (r7 Explain); staging 128 rows is free
    val srcC = Funnel.stageLazy(srcF.groupBy("b").agg(count(lit(1)).as("cs")))
    val tgtC = Funnel.stageLazy(tgtF.groupBy("b").agg(count(lit(1)).as("ct")))
    // full bucket domain so features unseen on one side still carry
    // their smoothed mass into the ratio
    val dom = source.sparkSession.range(buckets).select(col("id").as("b"))
    val lam = dom
      .join(srcC, Seq("b"), "left").join(tgtC, Seq("b"), "left")
      .crossJoin(broadcast(srcC.agg(sum("cs").as("ts"))))
      .crossJoin(broadcast(tgtC.agg(sum("ct").as("tt"))))
      .select(col("b"), round(log(round(
        ((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("tt") + buckets)) /
          ((coalesce(col("cs"), lit(0L)) + 1).cast("double") / (col("ts") + buckets)),
        9)) * 1e9).cast("long").as("lam_nano"))
    srcF.join(broadcast(lam), "b")
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_feats"),
        round(sum("lam_nano") / 1e9, 6).as("logw"))
  }

  /** Weighted sample WITHOUT replacement via priority sampling
    * (Efraimidis–Spirakis A-ES, public literature): each row draws a
    * deterministic uniform u ∈ (0, 1) from its md5 (u = (h₆₀ + ½)/2⁶⁰)
    * and takes priority u^(1/w); the k LARGEST priorities are exactly
    * a w-weighted sample without replacement. The k-cut is TakeOrdered
    * (per-partition heaps + a k-row driver merge — no global sort, no
    * window), so a weighted eval-set cut of a 100 TB corpus is one
    * scan. Priorities round to 9 (pow is transcendental; same
    * cross-libm discipline as the tf-idf ln) with the id as the
    * deterministic tie-break.
    */
  def weightedPrioritySample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    val u = (graft.functions.GraftFunctions.md5_prefix(col(idCol).cast("string"), 15)
      .cast("double") + 0.5) / 1.152921504606846976e18
    val pri = round(pow(u, lit(1.0) / greatest(weight.cast("double"), lit(1.0))), 9)
    df.withColumn("pri", pri)
      .orderBy(col("pri").desc, col(idCol))
      .limit(k)
  }

  /** Neyman allocation (Neyman 1934 — the optimal-variance stratified
    * design classical survey sampling and eval-set construction use):
    * a total budget of `total` sample slots splits across strata
    * ∝ N_h·σ_h, so high-variance strata get proportionally more
    * measurement. Everything before the final quotas is INTEGER-exact:
    * per-stratum variance comes from the raw sums
    * (n·Σx² − (Σx)², BIGINT), weights quantize to 1e6-scale integers
    * after one deterministic sqrt chain, the weight total is an
    * integer sum, and the largest-remainder rounding ranks identical
    * doubles — so the allocation is engine-replayable and sums to
    * `total` exactly. One pass over the data + arithmetic on the
    * |strata|-row aggregate.
    *
    * Output: (stratum, n, w_e6, alloc) with Σ alloc = total.
    */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
      total: Int): DataFrame = {
    val stats = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("sx"),
        sum((col(valueCol) * col(valueCol)).cast("long")).as("sxx"))
      .select(col("stratum"), col("n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("vn"))
      // w = N·σ = sqrt(vn / (n·(n−1))) · n, quantized at 1e6; strata of
      // size < 2 carry zero variance information and weight 0
      .select(col("stratum"), col("n"),
        when(col("n") >= 2,
          round(sqrt(col("vn").cast("double")
            / (col("n") * (col("n") - 1)).cast("double")) * col("n") * 1e6))
          .otherwise(lit(0.0)).cast("long").as("w_e6"))
    val tot = stats.agg(sum("w_e6").as("tw"), sum("n").as("tn"))
    val quotas = stats.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n"), col("w_e6"),
        // tw = 0 (every stratum size < 2 or zero variance) would divide
        // by zero → NaN quotas; fall back to proportional-to-n, which is
        // Neyman under equal variances and always well-defined
        when(col("tw") > 0, col("w_e6").cast("double") * total / col("tw"))
          .otherwise(col("n").cast("double") * total / col("tn")).as("quota"))
      .select(col("stratum"), col("n"), col("w_e6"), col("quota"),
        floor(col("quota")).cast("long").as("base"),
        (col("quota") - floor(col("quota"))).as("frac"))
    val rem = quotas.agg((lit(total) - sum("base")).as("rem"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("frac").desc, col("stratum")) // |strata| rows: bounded
    quotas.crossJoin(broadcast(rem))
      .withColumn("rk", row_number().over(wr))
      .select(col("stratum"), col("n").cast("long").as("n"), col("w_e6"),
        (col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
          .cast("long").as("alloc"))
  }
}
