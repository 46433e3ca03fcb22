package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §2.5 distinct-agg split /
  * SplitAggregateRule, and the generic "salting for skew" scale rule).
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * cover the cases it doesn't: hot-key aggregations and broadcast-free
  * joins against a replicable side.
  */
object Skew {

  /** Two-phase salted aggregation (ref: SplitAggregateRule /
    * StreamExecIncrementalGroupAggregate): partial-aggregate on
    * (key, hash(row) % buckets), then final-aggregate on key. Use for
    * hot grouping keys where one partition would otherwise receive the
    * whole key. The caller supplies decomposable partial/final aggs
    * (sum→sum, count→sum, min→min, ...).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      saltBy: Column,
      partial: Seq[Column],
      finalAgg: Seq[Column]
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left rows get a random-but-deterministic salt in [0, buckets);
    * the right side is replicated `buckets` times so every
    * (key, salt) pair finds its match. Right-side replication costs
    * |right| × buckets — use when right is too big to broadcast whole
    * but small enough to replicate, and AQE skew handling is
    * insufficient (e.g. shuffled hash join on one hot key).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int,
      leftSaltBy: Column
  ): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(hash(leftSaltBy), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "__salt")
      .drop("__salt")
  }
}
