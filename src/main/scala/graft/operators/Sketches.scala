package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fixed-size probabilistic summaries — the cardinality / frequency /
  * membership layer a 100 TB curation pipeline runs where exact
  * answers would shuffle the corpus: HyperLogLog distinct counting
  * (Flajolet 2007), count-min frequency sketching (Cormode 2005), and
  * Bloom-filter membership (Bloom 1970). The reference exposes the
  * same trio through its aggregate-function battery
  * (flink-table-runtime-blink approximate aggs and the
  * BloomFilter-based runtime filters in
  * flink-table-planner-blink/../BatchPhysicalRuntimeFilter); here each
  * is an ordinary DataFrame aggregation whose STATE is the whole
  * point: registers / cells / bits are constant-size regardless of
  * input, built by map-side partial aggregation (max / count are
  * associative), so at 100 TB each sketch costs one scan plus a
  * shuffle of at most a few thousand aggregated rows.
  *
  * Everything is integer arithmetic over md5-derived hashes — no
  * engine-specific hashing, no float accumulation — so DuckDB replays
  * the sketches bit-for-bit and the driver hash-checks estimates, not
  * just shapes (contrast `approx_count_distinct`, whose HLL++ buffer
  * is Spark-private and unverifiable). Production users on Spark can
  * swap the portable hash for xxhash64 without touching the algebra,
  * exactly like the MinHash production/portable twins in [[Dedup]].
  */
object Sketches {

  /** Portable 60-bit non-negative hash: first 15 hex chars of md5 —
    * the cross-engine idiom shared with [[Dedup.portablePerms]]. Native
    * codegen'd digest (r14 opt, [[graft.functions.Md5PrefixLong]]):
    * value-identical to `conv(substring(md5(c), 1, 15), 16, 10)::long`
    * without the hex-string round-trip.
    */
  private[operators] def h60(c: Column): Column =
    graft.functions.GraftFunctions.md5_prefix(c, 15)

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog registers over an item column: bucket = low lg(m)
    * hash bits, register = max over the bucket of the leading-zero
    * rank of the remaining `wBits` bits. Max is idempotent AND
    * associative, so duplicates need no pre-distinct and the whole
    * sketch is one map-side-combined aggregate to `m` rows — the
    * reason HLL is THE distinct-count at 100 TB while
    * `count(distinct)` shuffles every unique value.
    *
    * Returns exactly `m` rows (bucket, reg), absent buckets filled
    * with reg = 0. Rank arithmetic is integer-exact via the binary
    * string length (both engines' `bin()` drops leading zeros):
    * rho(w) = wBits - len(bin(w)) + 1 for w > 0, wBits + 1 for w = 0.
    */
  def hllRegisters(items: DataFrame, itemCol: String, m: Int, wBits: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    val spark = items.sparkSession
    // `div`, not `/`: Divide on longs returns DOUBLE, whose 53-bit
    // mantissa rounds w for hashes above 2^53 — a rank off by one
    // whenever the rounding crosses a power of two, silently diverging
    // from exact integer arithmetic (and any other engine's)
    val rho = when(col("w") === 0, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(col("w"))))
    val present = items
      .select(h60(col(itemCol)).as("h"))
      .select((col("h") % m).as("bucket"), expr(s"h div $m").as("w"))
      .select(col("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("reg"))
    spark.range(m).select(col("id").as("bucket"))
      .join(present, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("reg"), lit(0L)).cast("long").as("reg"))
  }

  /** Raw HLL estimate from a register table: alpha·m² / Σ 2^(−reg),
    * the harmonic-mean formula. The float-order trap — summing 64
    * doubles associates differently across engines — is dodged by
    * keeping the sum INTEGER: Σ 2^(−reg) = Σ 2^(maxRho − reg) / 2^maxRho
    * with maxRho = wBits + 1, numerator a single BIGINT. Only the final
    * alpha·m²·2^maxRho / S division is floating point (one IEEE op
    * chain, literal-identical on both engines), rounded to 3.
    *
    * Valid in the large-range regime (no empty-register linear-counting
    * correction — the corpora here populate every register; callers in
    * the small regime should read `reg = 0` rows as the signal to
    * switch, per the paper).
    */
  def hllEstimate(registers: DataFrame, m: Int, wBits: Int, alpha: Double): DataFrame = {
    val maxRho = wBits + 1
    registers
      .select(expr(s"shiftleft(cast(1 as bigint), cast($maxRho - reg as int))").as("term"))
      .agg(sum("term").as("s"))
      .select(round(lit(alpha) * lit(m * m) * lit(math.pow(2.0, maxRho)) / col("s"), 3)
        .as("est_distinct"))
  }

  /** Per-key HLL registers — the sketch AS a grouped aggregation, the
    * form a 100 TB pipeline actually runs ("distinct n-grams per
    * source/language/day"): one map-side-combined aggregate to
    * |keys|·m rows, where the exact equivalent shuffles every (key,
    * value) pair. Absent (key, bucket) cells fill with reg = 0 via the
    * key-domain × range(m) cross (both tiny).
    */
  def hllRegistersBy(items: DataFrame, keyCol: String, itemCol: String,
      m: Int, wBits: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    val spark = items.sparkSession
    val rho = when(col("w") === 0, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(col("w"))))
    val present = items
      .select(col(keyCol).as("key"), h60(col(itemCol)).as("h"))
      .select(col("key"), (col("h") % m).as("bucket"), expr(s"h div $m").as("w"))
      .select(col("key"), col("bucket"), rho.as("rho"))
      .groupBy("key", "bucket").agg(max("rho").as("reg"))
    items.select(col(keyCol).as("key")).distinct()
      .crossJoin(spark.range(m).select(col("id").as("bucket")))
      .join(present, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("reg"), lit(0L)).cast("long").as("reg"))
  }

  /** Per-key raw estimates from a grouped register table — same
    * integer-sum arithmetic as [[hllEstimate]], one row per key.
    */
  def hllEstimateBy(registers: DataFrame, m: Int, wBits: Int, alpha: Double): DataFrame = {
    val maxRho = wBits + 1
    registers
      .select(col("key"),
        expr(s"shiftleft(cast(1 as bigint), cast($maxRho - reg as int))").as("term"))
      .groupBy("key").agg(sum("term").as("s"))
      .select(col("key"),
        round(lit(alpha) * lit(m * m) * lit(math.pow(2.0, maxRho)) / col("s"), 3)
          .as("est_distinct"))
  }

  // ---------------------------------------------------------- count-min

  /** Count-min sketch cells over an item column: `depth` independent
    * hash rows ("|"-salted md5) × `width` buckets, cell = count of
    * items hashing there. One explode (depth× the items) feeding one
    * hash aggregate to ≤ depth·width rows; at 100 TB the sketch is a
    * few KB of state built with map-side partials while an exact
    * frequency table would be billions of rows.
    */
  def cmsCells(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame =
    items
      .select(col(itemCol).as("item"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .select(col("r"),
        (h60(concat(col("r").cast("string"), lit("|"), col("item"))) % width).as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))

  /** Per-key count-min cells — the sketch AS a grouped aggregation
    * (cells keyed by day / source / language). Cells over DISJOINT key
    * populations SUM-merge (counts are additive), the dual of the HLL
    * register max-merge: persist per-day cells once and any trailing
    * window's sketch is a sum over a few thousand tiny rows
    * (`q_evt_cms_window`), never a re-scan of the raw window.
    */
  def cmsCellsBy(items: DataFrame, keyCol: String, itemCol: String,
      depth: Int, width: Int): DataFrame =
    items
      .select(col(keyCol).as("key"), col(itemCol).as("item"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .select(col("key"), col("r"),
        (h60(concat(col("r").cast("string"), lit("|"), col("item"))) % width).as("b"))
      .groupBy("key", "r", "b").agg(count(lit(1)).as("c"))

  /** Point-query the sketch for each probe item: estimate = min over
    * the depth rows of the addressed cell — an upper bound on the true
    * count (collisions only ADD), within εN with probability 1−δ for
    * width = e/ε, depth = ln(1/δ). Probes are expected tiny (heavy-
    * hitter candidates); the cells table is broadcast.
    */
  def cmsLookup(cells: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val addressed = probes
      .withColumn("r", explode(array((0 until depth).map(lit): _*)))
      .withColumn("b",
        h60(concat(col("r").cast("string"), lit("|"), col(itemCol))) % width)
    addressed.join(broadcast(cells), Seq("r", "b"))
      .groupBy(probes.columns.map(col): _*)
      .agg(min("c").cast("long").as("est_cnt"))
  }

  // -------------------------------------------------------------- Bloom

  /** Bloom-filter bit positions set by an item column: k "|"-salted
    * md5 hashes into [0, mBits). Returned as the ≤ mBits distinct set
    * positions — the relational encoding of the bit array (a physical
    * deployment packs them into mBits/8 bytes and broadcasts; the
    * driver-verifiable form keeps them as rows). Build is one scan +
    * one distinct over at most mBits values: the classic "have we seen
    * this URL/fingerprint" state that lets a 100 TB ingest probe
    * membership WITHOUT joining against the corpus-sized key set.
    */
  def bloomBits(items: DataFrame, itemCol: String, k: Int, mBits: Int): DataFrame =
    items
      .select(explode(array((0 until k).map(i =>
        h60(concat(lit(i.toString), lit("|"), col(itemCol))) % mBits): _*)).as("pos"))
      .distinct()

  /** Per-key Bloom bit positions — the filter AS a grouped aggregation
    * (bits keyed by day / source). Keyed bit sets OR-merge (set union =
    * distinct position union), third leg of the windowable-sketch
    * algebra: HLL registers max-merge, count-min cells sum-merge,
    * Bloom bits OR-merge, KMV values bottom-k-merge ([[kmvValuesBy]])
    * — so per-day filters persist once and any
    * trailing window's filter is a distinct-union of tiny position
    * rows (`q_evt_bloom_window`).
    */
  def bloomBitsBy(items: DataFrame, keyCol: String, itemCol: String,
      k: Int, mBits: Int): DataFrame =
    items
      .select(col(keyCol).as("key"),
        explode(array((0 until k).map(i =>
          h60(concat(lit(i.toString), lit("|"), col(itemCol))) % mBits): _*)).as("pos"))
      .distinct()

  /** Probe the filter: hit ⇔ all k addressed positions are set. No
    * false negatives (every inserted item's positions are set by
    * construction); false-positive rate ≈ (1 − e^(−kn/m))^k. The bits
    * table is broadcast — fixed-size, corpus-independent.
    */
  def bloomProbe(bits: DataFrame, probes: DataFrame, itemCol: String,
      k: Int, mBits: Int): DataFrame = {
    val addressed = probes
      .withColumn("pos", explode(array((0 until k).map(i =>
        h60(concat(lit(i.toString), lit("|"), col(itemCol))) % mBits): _*)))
    addressed
      .join(broadcast(bits.withColumn("set", lit(1))), Seq("pos"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg((count(col("set")) === k).cast("long").as("bloom_hit"))
  }

  // -------------------------------------------------- Misra–Gries

  /** Misra–Gries k-counter summary (Misra & Gries 1982; the
    * deterministic ancestor of Space-Saving). Buffer = up to k (item,
    * count) counters: a hit increments, a miss with spare capacity
    * inserts at 1, a miss at capacity decrements EVERY counter
    * (dropping zeros) — the classic "cancel k+1 distinct items against
    * each other" step. merge follows Agarwal et al. 2012 (mergeable
    * summaries): sum counts pairwise, then subtract the (k+1)-th
    * largest count from the survivors and drop non-positives, which
    * preserves the guarantee under ANY merge tree: every item with
    * true frequency > n/(k+1) is still present. Counts and the
    * identity of sub-threshold stragglers ARE merge-order dependent —
    * which is exactly why [[mgHeavyHitters]] treats the summary as a
    * candidate set and verifies exactly.
    */
  private final class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      if (b.contains(item)) b.updated(item, b(item) + 1L)
      else if (b.size < k) b.updated(item, 1L)
      else b.collect { case (i, c) if c > 1L => i -> (c - 1L) }
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val m = x ++ y.map { case (i, c) => i -> (x.getOrElse(i, 0L) + c) }
      if (m.size <= k) m
      else {
        val sub = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        m.collect { case (i, c) if c - sub > 0L => i -> (c - sub) }
      }
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Deterministic heavy hitters by summarize-then-verify: one
    * map-side-combined Misra–Gries aggregate reduces the stream to ≤k
    * candidate counters (each partition ships ≤k entries — contrast
    * the full groupBy an exact top-N pays), then ONE candidate-
    * restricted exact count (broadcast semi-join at the scan) keeps
    * items with true frequency > n/(k+1). The guarantee makes the
    * candidate set a superset of that threshold set under any
    * partitioning, so the VERIFIED output is exactly the theoretical
    * heavy-hitter set — deterministic and oracle-able even though the
    * summary's internal counters are merge-order dependent. The
    * integer threshold test `cnt·(k+1) > n` avoids division entirely.
    *
    * Output: (item, cnt) — exact counts of every item with
    * freq > n/(k+1).
    */
  /** The raw ≤k-row Misra–Gries summary (item, c) — the mergeable
    * state a streaming maintainer persists (`q_stream_mg`); counters
    * are merge-order dependent, the candidate-set guarantee is not.
    */
  def mgSummary(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAgg(k), Encoders.STRING)
    items.select(col(itemCol).cast("string").as("item"))
      .agg(mg(col("item")).as("m"))
      .select(explode(col("m")).as(Seq("item", "c")))
  }

  def mgHeavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val src = items.select(col(itemCol).cast("string").as("item"))
    val cand = mgSummary(src, "item", k).select("item")
    val n = src.agg(count(lit(1)).as("n"))
    src.join(broadcast(cand), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("item"), col("cnt").cast("long").as("cnt"))
  }

  // -------------------------------------------------------- KMV / Theta

  /** Hash-domain size for [[h60]]: hashes are uniform in [0, 2^60). */
  val KmvDomain: Long = 1L << 60
  private val KmvDomainD: Double = KmvDomain.toDouble // 2^60 exactly

  /** Bounded bottom-k aggregation state for the KMV sketch: the buffer
    * is the ≤k smallest DISTINCT hashes seen so far, sorted ascending.
    * Once the buffer saturates, the common path is an O(1) rejection
    * (`h >= last`): expected inserts over n rows are k·H_n ≈ k·ln n,
    * so per-row cost amortizes to a comparison. merge is a
    * distinct-union-truncate — associative, commutative, idempotent on
    * re-delivered values — which is what makes the sketch build ONE
    * map-side-combined aggregate: partitions each keep ≤k values and
    * the shuffle carries ≤k longs per partition, never the
    * corpus-sized distinct value set (contrast `count(distinct)`).
    */
  private final class KminAgg(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.length >= k && h >= b.last) b
      else if (b.contains(h)) b
      else ((b :+ h).sorted).take(k)
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      (x ++ y).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** K-minimum-values distinct sketch (Beyer 2007; the core of the
    * Theta sketch, Dasgupta 2016): the k smallest distinct 60-bit
    * hashes of the item column, as rows (rank, h), rank 1-based
    * ascending. Fourth member of the summary family and the only one
    * whose SET ALGEBRA is faithful: bottom-k union-merge is LOSSLESS
    * (bottom-k of A∪B = bottom-k of bottomk(A)∪bottomk(b)), and
    * retained values are a uniform hash-sample of the distinct
    * domain, so INTERSECTION is estimated by direct sample overlap
    * ([[graft.queries.SketchQueries]] `q_doc_kmv_setops`) instead of
    * HLL's error-compounding inclusion–exclusion. Build is one
    * map-side-combined aggregate (see [[KminAgg]]); everything is
    * md5-derived integer state, so DuckDB replays the sketch
    * bit-for-bit.
    */
  def kmvValues(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val kmin = udaf(new KminAgg(k), Encoders.scalaLong)
    items.select(h60(col(itemCol)).as("h"))
      .agg(kmin(col("h")).as("hs"))
      .select(posexplode(col("hs")))
      .select((col("pos") + 1).cast("long").as("rank"), col("col").as("h"))
  }

  /** Per-key KMV values — the sketch AS a grouped aggregation
    * ("distinct actives per day"): |keys|·k value rows replace a
    * shuffle of every distinct (key, value) pair, and per-day sketches
    * persist once with ANY trailing window answered by bottom-k
    * union-merge over tiny rows (`q_evt_kmv_window`) — the fourth
    * windowable-sketch merge after HLL max, count-min sum, Bloom OR.
    */
  def kmvValuesBy(items: DataFrame, keyCol: String, itemCol: String,
      k: Int): DataFrame = {
    val kmin = udaf(new KminAgg(k), Encoders.scalaLong)
    items.select(col(keyCol).as("key"), h60(col(itemCol)).as("h"))
      .groupBy("key").agg(kmin(col("h")).as("hs"))
      .select(col("key"), posexplode(col("hs")))
      .select(col("key"), (col("pos") + 1).cast("long").as("rank"), col("col").as("h"))
  }

  /** Theta-form estimate from a KMV value table: θ = the kth smallest
    * hash when the sketch is full (else the domain bound 2^60), the
    * retained sample = values strictly below θ, est = |retained| ·
    * 2^60 / θ — which reduces to the classic (k−1)·2^60/h_(k) for a
    * full sketch and to the EXACT count when distinct < k. All-integer
    * state; the one float op chain (|S|·2^60 exact double product,
    * one IEEE division) is literal-identical in DuckDB, rounded to 3.
    */
  def kmvEstimate(values: DataFrame, k: Int): DataFrame =
    values.agg(count(lit(1)).as("n"), max("h").as("mx"))
      .select(
        when(col("n") === k, col("mx")).otherwise(lit(KmvDomain)).as("theta"),
        when(col("n") === k, col("n") - 1).otherwise(col("n")).as("n_ret"))
      .select(thetaEstimate(col("n_ret"), col("theta")).as("est_distinct"))

  /** The Theta estimator |S|·2^60/θ as one literal-identical IEEE op
    * chain (|S| ≤ a few hundred, so the double product is exact; the
    * long→double θ cast and the division round identically under IEEE
    * in any engine), rounded to 3.
    */
  def thetaEstimate(n: Column, theta: Column): Column =
    round(n.cast("double") * lit(KmvDomainD) / theta.cast("double"), 3)

  // ------------------------------------------------- HDR histogram

  private def pow2(n: Column): Column =
    call_function("shiftleft", lit(1L), n.cast("int"))

  /** HDR-histogram-style bin id for a positive long (HdrHistogram /
    * DDSketch family: log2 exponent + 8 linear sub-buckets): values
    * below 16 get EXACT singleton bins (id = v); above, with
    * e = bit-length(v), the octave [2^(e−1), 2^e) splits into 8 equal
    * sub-buckets of width 2^(e−4) — id = 16 + (e−5)·8 + sub. Bounded
    * relative error by construction (bucket width / lower bound ≤
    * 2^(e−4)/2^(e−1) = 12.5 %) over an UNBOUNDED domain with ≤ 8
    * bins per octave — the property fixed-width histograms lack. All
    * integer bit arithmetic (bin-length, shifts), so any engine
    * replays ids exactly.
    */
  def hdrBin(v: Column): Column = {
    val e = length(bin(v))
    when(v < 16, v).otherwise(
      lit(16) + (e - lit(5)) * lit(8) +
        call_function("shiftright", v - pow2(e - lit(1)), (e - lit(4)).cast("int")))
  }

  /** Inclusive upper bound of an [[hdrBin]] bucket — the deterministic
    * integer a quantile report quotes for the bucket (max true value
    * in it, so reported quantiles never undershoot).
    */
  def hdrUb(binId: Column): Column = {
    val e = lit(5) + call_function("shiftright", binId - lit(16), lit(3))
    val m = pmod(binId - lit(16), lit(8))
    when(binId < 16, binId)
      .otherwise(pow2(e - lit(1)) + (m + lit(1)) * pow2(e - lit(4)) - lit(1))
  }

  /** Per-key HDR histogram cells (key, bin, cnt) over a positive-long
    * value column — the QUANTILE leg of the windowable-sketch algebra:
    * cell counts over disjoint key populations SUM-merge exactly like
    * count-min cells, so per-day histograms persist once (≲ 8 bins per
    * octave) and any trailing window's p50/p90/p99 reads off a
    * cumulative sum over tiny merged rows — where the exact quantile
    * re-sorts the raw window (`q_evt_quantile_window`). The percentile
    * answer is [[hdrUb]] of the first bin whose cumulative count
    * reaches ⌈q·N⌉: within 12.5 % of the true order statistic by the
    * bucket-width bound, deterministic, engine-exact.
    */
  def hdrCellsBy(items: DataFrame, keyCol: String, valueCol: String): DataFrame =
    items
      .select(col(keyCol).as("key"), hdrBin(col(valueCol)).as("bin"))
      .groupBy("key", "bin").agg(count(lit(1)).as("cnt"))
}
