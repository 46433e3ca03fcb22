package graft.operators

import org.apache.spark.sql.DataFrame

/** Stage-boundary materialization for composed pipelines.
  *
  * Composing library operators the natural way (`val deduped = …;
  * val clean = f(deduped); g(clean, deduped)`) silently duplicates
  * work: every REFERENCE to a stage's DataFrame splices the whole
  * upstream subtree into the consumer's logical plan, and Catalyst's
  * ReuseExchange does NOT rescue cross-stage sharing — the round-6
  * funnel composition scanned the corpus parquet 24 times in one
  * physical plan this way. The reference runtime never exhibits the
  * failure mode because its job graph shares intermediate results by
  * construction (flink-streaming-java
  * StreamingJobGraphGenerator.java:94 chains each operator exactly
  * once; DataSet plans share sources); in Spark, sharing across an
  * action-free composition must be DECLARED.
  *
  * [[stage]] is that declaration: an eager materialization boundary.
  * Downstream consumers — however many — read the materialized blocks,
  * so each stage's work runs exactly once. With a configured checkpoint
  * directory the boundary is a reliable `checkpoint()` (at 100 TB a
  * lost executor mid-funnel must not recompute three upstream stages);
  * locally it is `localCheckpoint()` (executor block storage, no
  * filesystem round-trip). Both truncate lineage, which also keeps
  * loop-shaped callers' plans from growing without bound — the same
  * discipline [[Components.minLabel]] and [[Iterations]] apply inside
  * their contraction loops.
  *
  * When NOT to use it: a stage referenced exactly once downstream needs
  * no boundary — leaving it lazy lets Catalyst fuse, prune, and push
  * down across the stage seam (the funnel-v1 `min_by` single-pass shape
  * is the counter-example worth preserving). Materialize where fan-out
  * happens, not everywhere.
  */
object Funnel {

  /** Materialize `df` as a pipeline-stage boundary; every downstream
    * reference computes the stage exactly once. Reliable `checkpoint()`
    * when the session has a checkpoint dir (cluster posture), eager
    * `localCheckpoint()` otherwise. The materialization's wall time is
    * booked per-label in [[graft.BenchMeters.stageTimed]] so composite
    * pipelines can name which stage their time went to.
    */
  def stage(df: DataFrame, label: String = "stage"): DataFrame =
    graft.BenchMeters.stageTimed(label) {
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    }

  /** [[stage]] with LAZY materialization (r13 opt): the logical plan is
    * truncated immediately (same lineage discipline), but on the
    * localCheckpoint (local-posture) branch the blocks populate inside
    * whichever action consumes the stage first instead of a dedicated
    * eager job. On the reliable-checkpoint branch the laziness only
    * defers WHEN the checkpoint job runs: `checkpoint(eager = false)`
    * still recomputes the full lineage in its own job after the first
    * action (Spark's reliable checkpoint writes from lineage, not from
    * cached blocks) — the job-count saving applies to the local branch
    * only. The right boundary for LOOP-internal
    * stages whose every consumer is a full-scan action (iterative graph
    * rounds: each round's aggregate feeds the next round's join or a
    * terminal count) — there the eager job is pure job-count floor,
    * rounds × one scheduling round-trip of it. Keep the EAGER [[stage]]
    * wherever a partial action (head/take/isEmpty/limit) may touch the
    * stage first: a lazy boundary would then checkpoint only the
    * computed partitions and re-derive the rest from the un-truncated
    * RDD lineage on the next consumer.
    */
  def stageLazy(df: DataFrame, label: String = "stage"): DataFrame =
    graft.BenchMeters.stageTimed(label) {
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    }
}
