package graft.queries

import graft.SparkSpec

/** Closed-form PAV checks for [[AnalyticsQueries.isotonicFromBlocks]]:
  * the classic adjacent-violator pool (1.0 then 0.0 → both 0.5), an
  * already-monotone staircase passing through unchanged, and the
  * asymmetric pool where weights matter.
  */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(blocks: (Double, Long, Long)*): Map[Double, (Double, Double)] =
    AnalyticsQueries.isotonicFromBlocks(
        blocks.toDF("sc", "n", "np"))
      .collect()
      .map(r => r.getAs[Double]("sc") ->
        (r.getAs[Double]("raw"), r.getAs[Double]("fit"))).toMap

  test("adjacent violators pool to the weighted mean") {
    val f = fit((0.1, 2L, 2L), (0.2, 2L, 0L))
    assert(f(0.1)._2 === 0.5 && f(0.2)._2 === 0.5)
  }

  test("monotone staircase is a fixed point") {
    val f = fit((0.1, 4L, 0L), (0.2, 4L, 2L), (0.3, 4L, 4L))
    assert(f(0.1)._2 === 0.0)
    assert(f(0.2)._2 === 0.5)
    assert(f(0.3)._2 === 1.0)
  }

  test("asymmetric pool respects block weights") {
    // rates 1.0 (n=1) then 0.0 (n=3): pooled mean = 1/4
    val f = fit((0.1, 1L, 1L), (0.2, 3L, 0L))
    assert(f(0.1)._2 === 0.25 && f(0.2)._2 === 0.25)
  }

  test("middle violator pools only as far as needed") {
    // 0.0, 1.0, 0.25, 1.0: blocks 2-3 pool to 0.625, ends untouched
    val f = fit((0.1, 4L, 0L), (0.2, 4L, 4L), (0.3, 4L, 1L), (0.4, 4L, 4L))
    assert(f(0.1)._2 === 0.0)
    assert(f(0.2)._2 === 0.625)
    assert(f(0.3)._2 === 0.625)
    assert(f(0.4)._2 === 1.0)
  }
}
