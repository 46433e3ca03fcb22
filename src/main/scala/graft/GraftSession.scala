package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builder for the graft engine: AQE with skew
  * handling on (runtime re-planning replaces the reference's cost-based
  * batch optimizer choices), UTC session time, shuffle parallelism from
  * the environment. On a real cluster the same settings hold — only
  * master/memory change.
  */
object GraftSession {

  def builder(appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Broadcast threshold stays at the 10m default: raising it globally
      // flips fact-fact joins (lineitem⋈orders at bench scale) into
      // broadcasts, which at cluster scale means shipping multi-GB build
      // sides to every executor. Joins that WANT a big broadcast payload
      // (dedup/similarity verify phases) carry an explicit broadcast()
      // hint at the join site instead, where the size reasoning lives.
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(s)
    s
  }
}
