package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RowKind changelog layer: fold semantics (last op per key, delete on
  * `-D`, `-U` never survives), split-invariance (per-batch fold + merge
  * == one-shot fold), and retractDiff's four kinds including `-D`,
  * which the oracled count query can never produce (counts only grow).
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (String, Long, Long, Double)*): DataFrame =
    rows.toDF("kind", "seq", "k", "v")

  private def empty: DataFrame =
    spark.range(0).select(col("id").as("k"), col("id").cast("double").as("v"))

  private def state(df: DataFrame): Set[(Long, Double)] =
    df.as[(Long, Double)].collect().toSet

  test("foldCdc: last op per key wins; -D and trailing -U delete") {
    val l = log(
      ("+I", 1L, 10L, 1.0), ("+U", 2L, 10L, 2.0),           // 10 → 2.0
      ("+I", 3L, 20L, 5.0), ("-D", 4L, 20L, 5.0),           // 20 → gone
      ("+I", 5L, 30L, 7.0), ("-U", 6L, 30L, 7.0),           // 30 → retracted, gone
      ("-D", 7L, 40L, 0.0), ("+I", 8L, 40L, 9.0))           // 40 → resurrected
    val out = Changelog.foldCdc(empty, l, "k", "seq", "kind")
    assert(state(out) === Set((10L, 2.0), (40L, 9.0)))
  }

  test("foldCdc: per-batch fold + merge equals the one-shot fold (split invariance)") {
    val ops = Seq(
      ("+I", 1L, 1L, 1.0), ("+U", 2L, 2L, 2.0), ("-D", 3L, 1L, 0.0),
      ("+I", 4L, 3L, 3.0), ("+U", 5L, 1L, 9.0), ("-D", 6L, 2L, 0.0),
      ("+U", 7L, 3L, 4.0), ("-U", 8L, 1L, 9.0), ("+I", 9L, 4L, 6.0))
    val oneShot = state(Changelog.foldCdc(empty, log(ops: _*), "k", "seq", "kind"))
    // every contiguous 3-way split must land on the same table
    for (c1 <- 1 until ops.length; c2 <- c1 + 1 until ops.length) {
      val folded = Seq(ops.take(c1), ops.slice(c1, c2), ops.drop(c2))
        .foldLeft(empty) { (st, b) => Changelog.foldCdc(st, log(b: _*), "k", "seq", "kind") }
      assert(state(folded) === oneShot, s"split at ($c1, $c2) diverged")
    }
  }

  test("round trip: folding the retract stream back onto prior reproduces current") {
    // the retract stream IS a changelog — fromChangelogStream ∘
    // toChangelogStream must be the identity on the snapshot (the
    // reference's pipeline composition contract). Randomized tables;
    // -U sequences before its +U partner so last-op-wins lands on +U.
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 20) {
      val keys = 1L to 12L
      def table() = keys.flatMap { k =>
        if (rnd.nextBoolean()) Some((k, math.round(rnd.nextDouble() * 100) / 10.0)) else None
      }
      val prior = table().toDF("k", "v")
      val cur = table().toDF("k", "v")
      val deltas = Changelog.retractDiff(prior, cur, "k")
        .withColumn("seq", when(col("kind") === Changelog.UpdateBefore, 0L).otherwise(1L))
      val rebuilt = Changelog.foldCdc(prior, deltas, "k", "seq", "kind")
      assert(state(rebuilt) === state(cur), s"trial $trial: round trip diverged")
    }
  }

  test("retractDiff emits +I / -U,+U pair / -D with old and new payloads") {
    val prior = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val cur = Seq((1L, 10.0), (2L, 25.0), (4L, 40.0)).toDF("k", "v")
    val got = Changelog.retractDiff(prior, cur, "k")
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(
      ("+I", 4L, 40.0),            // appeared
      ("-U", 2L, 20.0), ("+U", 2L, 25.0), // changed: old then new
      ("-D", 3L, 30.0)))           // disappeared
  }
}
