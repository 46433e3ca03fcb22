package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training-data pipelines: flag training
  * documents that share k-token shingles with an evaluation/benchmark
  * set, so eval answers don't leak into the training corpus.
  *
  * Scale shape: benchmark sets are tiny next to a 100 TB corpus, so the
  * eval side's exploded shingle table is broadcast and the corpus
  * streams through scan → explode → broadcast hash join → partial
  * aggregation — no shuffle of corpus shingles, and the only full
  * exchange carries (train_id, eval_id) hit groups, which are sparse.
  * Shingling itself is a pure column expression inside the scan stage
  * ([[TextAnalysis.shingles]]).
  */
object Decontamination {

  /** Per (train doc, eval doc) count of distinct shared k-shingles,
    * filtered to pairs sharing at least `minShared`. Rows of `eval`
    * are excluded from the train side by id.
    *
    * The train side's RAW (id, text) rows are hash-repartitioned by doc
    * id before any string work (same rationale as the LSH probe spread
    * in `Dedup.bandCandidates`): a small corpus file scans as one
    * partition, which would serialize the normalize/shingle/explode
    * work and the broadcast-join probe on one core. The exchange
    * carries only the narrow raw rows — all derived work (shingling,
    * explode, probe, partial agg) runs after it, in parallel.
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame,
                   idCol: String, textCol: String,
                   k: Int, minShared: Long): DataFrame = {
    def exploded(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).cast("long").as(outId),
          explode(array_distinct(TextAnalysis.shingles(col(textCol), k))).as("shingle"))
    val evalIds = eval.select(col(idCol).cast("long").as("eval_id"))
    val trainSh = exploded(
      train.join(broadcast(evalIds), col(idCol) === col("eval_id"), "left_anti")
        .repartition(train.sparkSession.sessionState.conf.numShufflePartitions, col(idCol)),
      "train_id")
    val evalSh = exploded(eval, "eval_id")
    trainSh.join(broadcast(evalSh), "shingle")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
