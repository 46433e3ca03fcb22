package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference Morton interleave: bit-by-bit loop. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the bit-by-bit Morton reference on random 16-bit pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z")).as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z === mortonRef(a, b), s"zValue($a, $b)")
    }
  }

  test("bucketize: equi-width with edge clamping") {
    val vals = Seq(-5.0, 0.0, 31.9, 63.9, 64.0, 99.0).toDF("v")
      .select(ZOrder.bucketize(col("v"), 0, 64, 64).as("b")).as[Long].collect().toSeq
    assert(vals === Seq(0L, 0L, 31L, 63L, 63L, 63L))
  }

  test("z-order clustering prunes a 2-D box to far fewer files than unsorted layout") {
    // uniform 256×256 grid, one row per cell — the worst case for a
    // single-column sort (every file spans the full second dimension)
    val grid = spark.range(256L * 256)
      .select((col("id") / 256).cast("long").as("x"), pmod(col("id"), lit(256)).cast("long").as("y"),
        col("id").as("v"))
    val zPath = "/tmp/graft-zorder-spec/z"
    val uPath = "/tmp/graft-zorder-spec/u"
    ZOrder.writeZOrdered(grid, zPath,
      ZOrder.bucketize(col("x"), 0, 256, 256), ZOrder.bucketize(col("y"), 0, 256, 256),
      numFiles = 16)
    // "unsorted": hash-scattered rows, same file count
    grid.repartition(16, col("v")).write.mode("overwrite").parquet(uPath)

    // a file CAN be skipped for the box iff its footer min/max on x and
    // y miss the box; count files whose ranges intersect x∈[0,32) ∧ y∈[0,32)
    def filesHit(path: String): Int = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        val (xmin, xmax, ymin, ymax) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        xmin < 32 && xmax >= 0 && ymin < 32 && ymax >= 0
      }
    }
    val zHit = filesHit(zPath)
    val uHit = filesHit(uPath)
    // the box is 1/64 of the grid: the curve isolates it to 1-2 files;
    // hash layout intersects every file
    assert(uHit === 16, s"unsorted layout should hit all files, hit $uHit")
    assert(zHit <= 2, s"z-order layout should prune to <=2 files, hit $zHit")
    // clustering is semantically invisible: same rows both layouts
    assert(spark.read.parquet(zPath).count() === 256L * 256)
    assert(spark.read.parquet(zPath).agg(sum("v")).head().getLong(0) ===
      spark.read.parquet(uPath).agg(sum("v")).head().getLong(0))
  }
}
