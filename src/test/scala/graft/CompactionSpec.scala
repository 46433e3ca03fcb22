package graft

import org.apache.spark.sql.functions._

/** Mechanical claims of the compaction sink (q_sink_compact): the
  * rewrite actually collapses the file count and leaves each output
  * file owning a disjoint contiguous key range (the property that
  * keeps footer min/max selective for downstream scans). Semantic
  * invisibility is the DuckDB oracle's job.
  */
class CompactionSpec extends SparkSpec {

  test("compaction collapses 64 shards to 4 range-disjoint files") {
    val dir = "/root/testdata/sf0.001"
    graft.queries.SourceQueries.compactSink(spark, dir).collect()
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val base = s"/tmp/graft-sink/${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    assert(files(s"$base/events_fragmented").length === 64)
    val compacted = files(s"$base/events_compacted")
    assert(compacted.length === 4)
    // per-file user_id ranges must not overlap (range clustering held)
    val ranges = compacted.map { f =>
      val r = spark.read.parquet(f).agg(min("user_id"), max("user_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
      case _ =>
    }
  }
}
