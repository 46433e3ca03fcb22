package graft

/** Dev harness: time individual driver queries by name under the same
  * session config the bench uses. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeQuery q_iterate_bfs q_emb_topk"
  * Optional env SPARK_GRAFT_SF_DIR (default sf0.1). Each query runs
  * `reps` times (env SPARK_GRAFT_REPS, default 1) to expose warmup skew.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = GraftSession.get("graft-time")
    for (name <- args; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name rep=$r rows=$n sec=$dt%.2f")
    }
    spark.stop()
  }
}
