package graft.operators

import org.apache.spark.sql.DataFrame

/** Batch iterations (ref: DataSet.iterate:1156 / iterateDelta:1206 —
  * BSP loops). Spark mapping per SURVEY §2.12: a driver-side loop over
  * DataFrames. Each step stays fully distributed; only the loop control
  * (and the optional convergence count) touches the driver. For long
  * chains, checkpoint periodically to cut lineage growth.
  */
object Iterations {

  /** Iterate `step` until `maxIter` or until `done(prev, next)`.
    * `checkpointEvery` is load-bearing: a step that unions its input
    * with a derivation of itself DOUBLES the logical plan per iteration
    * (2^n nodes by iteration n) — eager localCheckpoint every few
    * iterations keeps planning and re-execution linear.
    */
  def loop(init: DataFrame, maxIter: Int,
      done: (DataFrame, DataFrame) => Boolean = (_, _) => false,
      checkpointEvery: Int = 2)(step: DataFrame => DataFrame): DataFrame = {
    var cur = init
    var i = 0
    var stop = false
    while (i < maxIter && !stop) {
      var next = step(cur)
      // LAZY checkpoint (r13 opt): still truncates the logical plan per
      // iteration (the 2^n growth guard), but materialization folds into
      // whichever action consumes the chain — `done`'s count when a
      // convergence check exists, otherwise the caller's terminal
      // action. The eager form paid one scheduling round PER ITERATION
      // just to populate blocks (rounds × ~0.1-0.2 s of pure job floor
      // at local scale; at cluster scale, rounds × scheduler latency).
      if ((i + 1) % checkpointEvery == 0) next = next.localCheckpoint(eager = false)
      stop = done(cur, next)
      cur = next
      i += 1
    }
    cur
  }

  /** Delta iteration — solution set + workset (ref: DataSet
    * .iterateDelta:1206, DeltaIteration.java): each step maps
    * (solution, workset) to (delta, nextWorkset); the delta UPSERTS into
    * the solution on `keyCols` and the loop ends when the workset is
    * empty (the reference's empty-workset convergence criterion) or at
    * `maxIter`.
    *
    * Scale shape: the solution set stays put while only the (shrinking)
    * delta moves — the anti-join probe side is `broadcast(delta)`, so a
    * large solution is never reshuffled per iteration (the Spark analog
    * of the reference's indexed solution-set state). Each iteration's
    * results are localCheckpoint'ed: lineage stays linear and the
    * emptiness check doesn't recompute the chain.
    */
  def deltaLoop(initialSolution: DataFrame, initialWorkset: DataFrame,
      keyCols: Seq[String], maxIter: Int)(
      step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    var solution = initialSolution.localCheckpoint()
    var workset = initialWorkset.localCheckpoint()
    var i = 0
    while (i < maxIter && !workset.isEmpty) {
      val (deltaRaw, nextWorkRaw) = step(solution, workset)
      val delta = deltaRaw.localCheckpoint()
      solution = solution
        .join(broadcast(delta.select(keyCols.map(col): _*)), keyCols, "left_anti")
        .unionByName(delta)
        .localCheckpoint()
      workset = nextWorkRaw.localCheckpoint()
      i += 1
    }
    solution
  }
}
