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
      if ((i + 1) % checkpointEvery == 0) next = next.localCheckpoint()
      stop = done(cur, next)
      cur = next
      i += 1
    }
    cur
  }
}
