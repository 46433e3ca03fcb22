package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming row-time temporal (as-of) join (ref:
  * TemporalRowTimeJoinOperator.java:400, StreamExecTemporalJoin.scala:51
  * — `FOR SYSTEM_TIME AS OF probe.rowtime`; SURVEY §7 hard part #3).
  *
  * Probe rows join the LATEST version of the right side whose timestamp
  * is <= the probe's timestamp. Both streams are tagged, unioned, and
  * watermarked here (a watermark declared upstream would not survive the
  * object map), then keyed into one flatMapGroupsWithState; per key the
  * state holds pending probes and the version history. A probe resolves
  * once the watermark passes its timestamp — no earlier version can
  * still arrive — so results are independent of arrival order (the
  * reference's row-time semantics). Version history below the pending
  * horizon is pruned to its latest entry: state is O(pending window),
  * not O(stream).
  *
  * Late data: rows below the watermark are dropped by Spark's
  * EventTimeWatermark filter BEFORE this operator — the same
  * allowed-lateness drop the reference applies; a version arriving
  * later than the watermark delay never revises an emitted result.
  */
object TemporalJoin {

  /** Tagged union row: probe (isProbe=true) vs version. */
  final case class TjInput(key: Long, ts: Timestamp, id: Long, payload: Double, isProbe: Boolean) {
    def tsUs: Long = ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
  }
  final case class TjState(
      probes: Seq[(Long, Long)], // (tsUs, id)
      versions: Seq[(Long, Long, Double)]) // (tsUs, id, payload)
  final case class TjRow(key: Long, probe_id: Long, version_id: Option[Long], payload: Option[Double])

  def rowTime[P, V](
      probes: Dataset[P],
      versions: Dataset[V],
      watermarkDelay: String,
      probeKey: P => Long, probeTs: P => Timestamp, probeId: P => Long,
      versionKey: V => Long, versionTs: V => Timestamp, versionId: V => Long,
      versionPayload: V => Double
  )(implicit pe: Encoder[P], ve: Encoder[V]): Dataset[TjRow] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val tagged =
      probes.map(p => TjInput(probeKey(p), probeTs(p), probeId(p), 0.0, isProbe = true))
        .unionByName(
          versions.map(v => TjInput(versionKey(v), versionTs(v), versionId(v), versionPayload(v), isProbe = false)))
        .withWatermark("ts", watermarkDelay)

    def fn(key: Long, rows: Iterator[TjInput], state: GroupState[TjState]): Iterator[TjRow] = {
      val st = if (state.exists) state.get else TjState(Nil, Nil)
      val (np, nv) = rows.toSeq.partition(_.isProbe)
      val probesAll = (st.probes ++ np.map(p => (p.tsUs, p.id))).sorted
      val versionsAll = (st.versions ++ nv.map(v => (v.tsUs, v.id, v.payload)))
        .sortBy(v => (v._1, v._2))
      val wmUs = state.getCurrentWatermarkMs() * 1000L

      val (ready, pending) = probesAll.partition(_._1 <= wmUs)
      val out = ready.map { case (ts, pid) =>
        versionsAll.takeWhile(_._1 <= ts).lastOption match {
          case Some((_, vid, pay)) => TjRow(key, pid, Some(vid), Some(pay))
          case None                => TjRow(key, pid, None, None)
        }
      }
      // prune: below the horizon only the single latest version matters
      val horizon = (pending.headOption.map(_._1).toSeq :+ wmUs).min
      val (old, recent) = versionsAll.partition(_._1 <= horizon)
      val kept = old.lastOption.toSeq ++ recent
      if (pending.isEmpty && kept.isEmpty) state.remove()
      else {
        state.update(TjState(pending, kept))
        pending.headOption.foreach { case (ts, _) =>
          state.setTimeoutTimestamp(ts / 1000L + 1)
        }
      }
      out.iterator
    }

    tagged.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** PROC-time temporal join (ref: TemporalProcessTimeJoinOperator.java,
    * StreamExecTemporalJoin.scala proc-time flavor — `FOR SYSTEM_TIME AS
    * OF PROCTIME()`): each probe row joins whatever dimension snapshot
    * exists when its micro-batch executes. Spark-first mapping: a
    * foreachBatch that re-evaluates the dimension thunk per micro-batch
    * — a fresh scan each trigger picks up dim updates at the next batch,
    * exactly the reference's snapshot semantics. Results land
    * executor-parallel and idempotently into a per-batchId parquet
    * partition (same landing contract as ChangelogSink.ParquetUpsertSink:
    * a replayed batch overwrites its own directory).
    */
  def procTime(
      probes: DataFrame,
      dimOf: () => DataFrame,
      joinCond: Column,
      joinType: String,
      outPath: String
  ): StreamingQuery =
    probes.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ChangelogSink.ParquetUpsertSink.writeBatch(
          batch.join(dimOf(), joinCond, joinType), batchId, outPath)
      }
      .start()
}
