package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: pre-filter the BIG side of a join with a
  * fixed-size Bloom filter built from the small side's join keys, so
  * rows that cannot possibly match never enter the shuffle (semi-join
  * reduction, Bernstein & Chiu 1981; the same idea Spark's AQE applies
  * automatically as runtime row-level filtering under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, surfaced here as
  * an explicit, composable operator the way the reference surfaces its
  * join-pruning rewrites as planner rules, flink-table-planner
  * `FlinkSubQueryRemoveRule.scala:60`).
  *
  * Why this matters at 100 TB: a fact-to-filtered-dim join shuffles the
  * ENTIRE fact table even when the dim predicate keeps 1 % of keys —
  * the join's filter effect sits on the far side of the exchange. The
  * Bloom probe here is a pure scan-stage expression (md5 + element_at +
  * shiftright, all codegen'd built-ins, no UDF), so it fuses into the
  * parquet scan's WholeStageCodegen span and the ~99 % of fact rows
  * with no possible partner are dropped BEFORE the exchange; the
  * shuffle carries only plausible matches. The artifact that crosses to
  * the driver is the packed bit array — `mBits/8` bytes,
  * CORPUS-INDEPENDENT by construction (the legitimate driver-collect
  * class: fixed-size sketch state, like the k-means centroid table).
  *
  * Exactness: Bloom filters have no false negatives, so no real match
  * is lost; false positives survive the probe but are eliminated by the
  * join itself — the composed operator is exactly an inner join.
  *
  * Hashing matches [[Sketches.bloomBits]] bit-for-bit (k "|"-salted
  * [[Sketches.h60]] probes into [0, mBits)), so filters built by either
  * path are interchangeable; the probed key must stringify identically
  * on both sides (give both the same type).
  */
object RuntimeFilter {

  /** Packed Bloom bit words for `dim`'s key column: k salted positions
    * per key, OR-ed into `mBits/64` long words (bit b of word w =
    * position w·64+b). One scan + one ≤ mBits-row distinct; the
    * collected result is `mBits/8` bytes regardless of input size.
    */
  def bloomWords(dim: DataFrame, dimKey: String, k: Int, mBits: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val words = new Array[Long](mBits / 64)
    Sketches.bloomBits(dim.select(col(dimKey)), dimKey, k, mBits)
      .collect()
      .foreach { r =>
        val pos = r.getLong(0)
        words((pos / 64).toInt) |= 1L << (pos % 64)
      }
    words
  }

  /** `big` restricted to rows whose key passes the Bloom probe (all k
    * addressed bits set). The positions are plain columns and the bit
    * test is the SQL `shiftright`/`&` form (the Scala `shiftright`
    * overload only takes a static distance); everything stays inside
    * the scan's codegen span.
    */
  def bloomFiltered(big: DataFrame, bigKey: String, words: Array[Long],
      k: Int, mBits: Int): DataFrame = {
    require(mBits % 64 == 0 && words.length == mBits / 64,
      s"words length ${words.length} does not match mBits $mBits")
    var df = big.withColumn("__bloom_w", typedLit(words.toSeq))
    val conds = (0 until k).map { i =>
      df = df.withColumn(s"__bloom_p$i",
        Sketches.h60(concat(lit(i.toString), lit("|"), col(bigKey))) % mBits)
      s"(shiftright(element_at(__bloom_w, cast(__bloom_p$i div 64 as int) + 1), " +
        s"cast(__bloom_p$i % 64 as int)) & 1) = 1"
    }
    df.filter(expr(conds.mkString(" AND ")))
      .drop("__bloom_w" +: (0 until k).map(i => s"__bloom_p$i"): _*)
  }

  /** Inner join with the big side Bloom-reduced before the shuffle. */
  def bloomReducedJoin(big: DataFrame, bigKey: String, dim: DataFrame, dimKey: String,
      k: Int = 5, mBits: Int = 1 << 17): DataFrame = {
    val words = bloomWords(dim, dimKey, k, mBits)
    bloomFiltered(big, bigKey, words, k, mBits)
      .join(dim, col(bigKey) === col(dimKey))
  }
}
