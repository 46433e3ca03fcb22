package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed token-budget bins (greedy next-fit in id order) — the step that
  * turns a deduplicated corpus into fixed-length training sequences.
  *
  * Distributed shape: documents are sharded (`id % shards`), each shard
  * packed independently by one sorted streaming pass — `repartition` on
  * the shard key, `sortWithinPartitions`, then a single `mapPartitions`
  * holding O(1) state that resets at shard boundaries. One shuffle
  * total; a task streams its shards without materializing them, so at
  * 100 TB the only knob is `shards` (set it ≫ executor count and skew
  * amortizes; bins never cross shards, so `(shard, bin)` is the global
  * bin id and no coordination exists between tasks).
  *
  * Greedy next-fit rule (deterministic): docs in ascending id order
  * within a shard; a doc joins the current bin unless that would push
  * the bin past `budget`, in which case it opens the next bin. An
  * oversize doc (n_tokens > budget) still gets a bin of its own rather
  * than being dropped — callers truncate downstream if needed.
  */
object Packing {

  /** Per-doc bin assignment: (shard, doc_id, n_tokens, bin).
    *
    * @param tokensCol token-count expression evaluated against `docs`
    *                  (e.g. [[TextAnalysis.tokenCount]] of the text col)
    */
  def packGreedy(docs: DataFrame, budget: Long, shards: Int,
                 idCol: String, tokensCol: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        (col(idCol) % shards).cast("long").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        tokensCol.cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var shard = Long.MinValue; var bin = 0L; var fill = 0L
        it.map { case (sh, id, n) =>
          if (sh != shard) { shard = sh; bin = 0L; fill = n }
          else if (fill + n > budget) { bin += 1; fill = n }
          else fill += n
          (sh, id, n, bin)
        }
      }
      .toDF("shard", "doc_id", "n_tokens", "bin")
  }
}
