package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral directions over embedding columns, in the same
  * closed-form-sufficient-statistics posture as the distributed OLS
  * ([[graft.queries.AnalyticsQueries]] normal equations): the cluster
  * reduces the corpus to a BOUNDED statistics table (per-class vector
  * sums — ≤ |classes| × d values, corpus-independent), the driver runs
  * the tiny dense eigeniteration, and the result broadcasts back as a
  * literal vector for a one-scan projection. Nothing quadratic in the
  * corpus ever ships: the d×d scatter assembly happens on ≤ |classes|
  * rows of driver-local data.
  *
  * The shipped direction is the top eigenvector of the BETWEEN-CLASS
  * scatter B = Σ_c n_c (m_c − m)(m_c − m)ᵀ / n (Fisher's discriminant
  * under isotropic within-class scatter — LDA's numerator). The
  * driver fixtures are the reason for the supervised choice: their raw
  * covariance spectrum is isotropic (λ₂/λ₁ ≈ 0.98, measured), where
  * power iteration cannot separate a leading direction, while the
  * label structure gives B a real gap (λ₂/λ₁ ≈ 0.80 — 0.8²⁰ ≈ 0.01,
  * converged at 20 rounds). The same machinery takes any small dense
  * symmetric matrix.
  */
object Pca {

  /** Per-class count + per-dimension sums as one map-side-combined
    * aggregate: d independent `sum(x[i])` expressions, no explode, no
    * shuffle beyond the |classes|-row exchange. Elements cast to
    * double BEFORE summing (the oracle sums `embedding[i]::DOUBLE`
    * the same way).
    */
  def classSums(emb: DataFrame, labelCol: String, vecCol: String, d: Int): DataFrame =
    emb.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nc"),
        array((0 until d).map(i =>
          sum(col(vecCol).getItem(i).cast("double"))): _*).as("s"))

  /** Between-class scatter from collected class sums — driver-local,
    * ≤ |classes| × d doubles in, d × d out. B_ij = Σ_c n_c·dv_ci·dv_cj
    * / n with dv_c = s_c/n_c − m and m = (Σ_c s_c)/n, term-for-term
    * the oracle's formula.
    */
  def betweenClassScatter(classes: Seq[(Long, Array[Double])], d: Int): Array[Array[Double]] = {
    val n = classes.map(_._1).sum.toDouble
    val m = Array.tabulate(d)(i => classes.map(_._2(i)).sum / n)
    val b = Array.ofDim[Double](d, d)
    classes.foreach { case (nc, s) =>
      val dv = Array.tabulate(d)(i => s(i) / nc - m(i))
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { b(i)(j) += nc * dv(i) * dv(j); j += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { b(i)(j) /= n; j += 1 }
      i += 1
    }
    b
  }

  /** Unnormalized power iteration from the all-ones start, normalized
    * ONCE at the end with the sign fixed by the iterate's coordinate
    * sum — the exact arithmetic the unrolled SQL oracle replays
    * (per-step normalization would only rescale; skipping it keeps the
    * CTE chain a bare matrix–vector product per round). Magnitudes
    * stay in double range for any λ₁ ∈ (1e-15, 1e15) at 20 rounds.
    */
  def topEigenvector(b: Array[Array[Double]], iters: Int): Array[Double] = {
    val d = b.length
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to iters)
      v = Array.tabulate(d)(i => {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += b(i)(j) * v(j); j += 1 }
        acc
      })
    val nrm = math.sqrt(v.map(x => x * x).sum)
    // A zero scatter matrix (single-class corpus) zeroes the iterate;
    // return an EXPLICIT zero vector rather than 0/0 = NaN — callers
    // treat an all-zero direction as "no discriminant exists" (NULL
    // scores). Explicit, not `v`: a tiny nonzero iterate whose squares
    // underflow (λ₁ ≲ 1e-150) also lands here, and returning it raw
    // would slip an unnormalized direction past callers' all-zero
    // check while the SQL oracle's z > 0 guard NULLs out.
    if (nrm == 0) return Array.fill(d)(0.0)
    val sg = if (v.sum < 0) -1.0 else 1.0
    v.map(x => x / nrm * sg)
  }
}
