package graft.queries

import graft.SparkSpec

/** Closed-form check for [[PipelineQueries.embSilhouette]]: eight
  * orthogonal one-hot clusters of identical vectors — every point
  * coincides with its centroid (a = 0) and the nearest other centroid
  * is orthogonal (b = 1), so the simplified silhouette is exactly 1
  * in every cluster.
  */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  test("orthogonal identical clusters score mean silhouette exactly 1") {
    val dir = "/tmp/graft-sil"
    // vec_ids 0..7 are one per cluster (they seed the Lloyd init)
    val rows = for {
      rep <- 0 until 4
      g <- 0 until 8
    } yield {
      val v = Array.fill(8)(0.0f); v(g) = 1.0f
      ((rep * 8 + g).toLong, v, g)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = PipelineQueries.embSilhouette(spark, dir).collect()
    assert(out.length === 8)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === 4L)
      assert(r.getAs[Double]("mean_sil") === 1.0)
    }
  }
}
