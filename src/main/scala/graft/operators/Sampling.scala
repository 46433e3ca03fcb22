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
}
