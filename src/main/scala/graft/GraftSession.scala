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
      // 64m broadcast ceiling (vs 10m default): the dedup/similarity
      // verify phases re-attach a payload table to millions of candidate
      // pairs — broadcasting the payload side up to executor-memory-safe
      // sizes removes two shuffles of the (big) pair stream. Standard
      // prod knob; at cluster scale the same setting rides executor RAM.
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(s)
    s
  }
}
