package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.reflect.runtime.universe.TypeTag

/** Stateful streaming operators the reference has and Spark lacks as
  * built-ins (SURVEY.md §2.8 streaming Top-N / keep-last dedup, §2.10
  * KeyedProcessFunction), implemented on flatMapGroupsWithState /
  * mapGroupsWithState. State per key is O(N) for top-N and O(1) for
  * dedup-last — bounded regardless of stream length. Keys are generic
  * (`K: Encoder`, like the reference's KeyedStream<T, K>); element ids
  * stay Long (they double as deterministic tie-breaks) and measures
  * Double.
  */
object StreamingOps {

  /** Streaming top-N per key (ref: StreamExecRank.scala:52,
    * UpdatableTopNFunction.java): maintains the N best (score, id) per
    * key, emits the refreshed ranking whenever it changes (update-style,
    * like the reference's retract stream collapsed to upserts per rank).
    */
  final case class TopNState(entries: Seq[(Double, Long)])
  final case class TopNRow[K](key: K, rank: Long, id: Long, score: Double)

  def topNByKey[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      scoreFn: T => Double,
      n: Int
  )(implicit te: Encoder[T]): Dataset[TopNRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[TopNState]): Iterator[TopNRow[K]] = {
      val old = if (state.exists) state.get.entries else Seq.empty
      val merged = (old ++ rows.map(r => (scoreFn(r), idFn(r))))
        .sortBy { case (s, id) => (-s, id) }
        .take(n)
      if (merged != old) {
        state.update(TopNState(merged))
        merged.iterator.zipWithIndex.map { case ((s, id), i) =>
          TopNRow(key, i + 1L, id, s)
        }
      } else Iterator.empty
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)(
        ExpressionEncoder[TopNState](), ExpressionEncoder[TopNRow[K]]())
  }

  /** Keep-LAST dedup per key (ref: DeduplicateKeepLastRowFunction.java):
    * emits the latest row per key each time it changes. Keep-first is
    * Spark's built-in `dropDuplicates` — this covers the gap.
    */
  final case class LastState(tsUs: Long, id: Long)

  def dedupKeepLast[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      tsUsFn: T => Long
  )(implicit te: Encoder[T]): Dataset[(K, Long, Long)] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[LastState]): Iterator[(K, Long, Long)] = {
      val incoming = rows.map(r => (tsUsFn(r), idFn(r))).maxByOption(identity)
      val old = if (state.exists) Some((state.get.tsUs, state.get.id)) else None
      val best = (incoming.toSeq ++ old.toSeq).maxOption
      best match {
        case Some((ts, id)) if !old.contains((ts, id)) =>
          state.update(LastState(ts, id))
          Iterator.single((key, id, ts))
        case _ => Iterator.empty
      }
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)(
        ExpressionEncoder[LastState](), ExpressionEncoder[(K, Long, Long)]())
  }

  /** Gap-based sessionization with CUSTOM state (ref: the
    * KeyedProcessFunction sessionizing pattern and
    * EventTimeSessionWindows' merging-window state,
    * WindowOperator.java's per-key session merge — here as explicit
    * O(1)-per-key state: exactly ONE open session). A row arriving
    * beyond the gap CLOSES the open session and emits it — append
    * semantics, each session emitted exactly once, richer output than
    * the built-in `session_window` aggregate (start, duration, count
    * AND a folded measure). The trailing open session per key stays in
    * state unemitted: a later batch may still extend it (the streaming
    * contract; the batch counterpart that reports it is
    * `q_evt_sessionize`).
    *
    * Within a batch rows are sorted by (ts, value) before the fold, so
    * output — including the floating-point fold order of the measure —
    * is deterministic under any partitioning.
    */
  final case class SessState(startS: Long, lastS: Long, n: Long, sum: Double)
  final case class SessionRow[K](key: K, start_s: Long, duration_s: Long,
      n_events: Long, total_value: Double)

  /** `timeoutFlush = true` additionally arms an EVENT-TIME TIMER at
    * session-end + gap (the reference's
    * `ctx.timerService().registerEventTimeTimer` pattern): when the
    * watermark passes it with no further events for the key, the open
    * session is EMITTED and the state cleared — so quiet keys flush
    * instead of holding their last session forever. Requires a
    * watermark on the input; the timer is re-armed after every batch
    * that extends the session (clamped above the current watermark, as
    * Spark requires).
    */
  def sessionizeByGap[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      tsSFn: T => Long,
      valueFn: T => Double,
      gapS: Long,
      timeoutFlush: Boolean = false
  )(implicit te: Encoder[T]): Dataset[SessionRow[K]] = {
    def emit(key: K, o: SessState): SessionRow[K] =
      SessionRow(key, o.startS, o.lastS - o.startS, o.n, o.sum)
    def fn(key: K, rows: Iterator[T], state: GroupState[SessState]): Iterator[SessionRow[K]] = {
      if (timeoutFlush && state.hasTimedOut) {
        val o = state.get
        state.remove()
        return Iterator.single(emit(key, o))
      }
      val evs = rows.map(r => (tsSFn(r), valueFn(r))).toSeq.sorted
      var out = Vector.empty[SessionRow[K]]
      var cur = state.getOption
      evs.foreach { case (t, v) =>
        cur match {
          case Some(o) if t - o.lastS > gapS =>
            out :+= emit(key, o)
            cur = Some(SessState(t, t, 1L, v))
          case Some(o) =>
            cur = Some(SessState(o.startS, math.max(o.lastS, t), o.n + 1, o.sum + v))
          case None =>
            cur = Some(SessState(t, t, 1L, v))
        }
      }
      cur.foreach { o =>
        state.update(o)
        if (timeoutFlush)
          state.setTimeoutTimestamp(
            math.max((o.lastS + gapS + 1) * 1000L, state.getCurrentWatermarkMs + 1))
      }
      out.iterator
    }
    val timeout =
      if (timeoutFlush) GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(fn)(
        ExpressionEncoder[SessState](), ExpressionEncoder[SessionRow[K]]())
  }

  /** Streaming row-time OVER aggregate, ROWS UNBOUNDED PRECEDING (ref:
    * RowTimeRowsUnboundedPrecedingFunction.java — SURVEY §2.7 "no
    * streaming window functions in Spark"): per key, each event is
    * emitted exactly once — with its running sum/count — when the
    * watermark passes its timestamp. Late rows (below the last emitted
    * timestamp) are dropped, mirroring the reference's late-data drop.
    * State is O(out-of-order window): the running accumulator plus the
    * not-yet-emittable buffer.
    */
  final case class OverState(sum: Double, cnt: Long, lastEmittedUs: Long,
      buffer: Seq[(Long, Long, Double)])
  final case class OverRow[K](key: K, id: Long, tsUs: Long, running_sum: Double, running_cnt: Long)

  def overUnboundedPreceding[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      tsUsFn: T => Long,
      valueFn: T => Double
  )(implicit te: Encoder[T]): Dataset[OverRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[OverState]): Iterator[OverRow[K]] = {
      val st = if (state.exists) state.get else OverState(0.0, 0L, Long.MinValue, Nil)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val incoming = rows.map(r => (tsUsFn(r), idFn(r), valueFn(r)))
        .filter(_._1 > st.lastEmittedUs) // late rows dropped
      val all = (st.buffer ++ incoming).sortBy(e => (e._1, e._2))
      val (ready, hold) = all.partition(_._1 <= wmUs)
      var sum = st.sum; var cnt = st.cnt
      val out = ready.map { case (t, id, v) =>
        sum += v; cnt += 1
        OverRow(key, id, t, sum, cnt)
      }
      val nextLast = if (ready.nonEmpty) ready.last._1 else st.lastEmittedUs
      if (hold.isEmpty && cnt == 0) state.remove()
      else {
        state.update(OverState(sum, cnt, nextLast, hold))
        if (hold.nonEmpty) state.setTimeoutTimestamp(hold.head._1 / 1000L + 1)
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[OverState](), ExpressionEncoder[OverRow[K]]())
  }

  /** Streaming row-time OVER aggregate with a BOUNDED ROWS frame —
    * `ROWS BETWEEN nPreceding PRECEDING AND CURRENT ROW` (ref:
    * RowTimeRowsBoundedPrecedingFunction.java:301 — the reference keeps
    * a per-key ring of the last N rows and retracts the oldest on each
    * emit; same idea here). Each event is emitted exactly once, when the
    * watermark passes its timestamp, carrying the sum/count of itself
    * plus the nPreceding prior rows of its key. State is O(nPreceding +
    * out-of-order window): the retained tail plus the not-yet-emittable
    * buffer — bounded regardless of stream length.
    */
  final case class BoundedOverState(lastEmittedUs: Long,
      tail: Seq[(Long, Long, Double)], buffer: Seq[(Long, Long, Double)])

  def overRowsBounded[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      tsUsFn: T => Long,
      valueFn: T => Double,
      nPreceding: Int
  )(implicit te: Encoder[T]): Dataset[OverRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[BoundedOverState]): Iterator[OverRow[K]] = {
      val st = if (state.exists) state.get else BoundedOverState(Long.MinValue, Nil, Nil)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val incoming = rows.map(r => (tsUsFn(r), idFn(r), valueFn(r)))
        .filter(_._1 > st.lastEmittedUs) // late rows dropped
      val all = (st.buffer ++ incoming).sortBy(e => (e._1, e._2))
      val (ready, hold) = all.partition(_._1 <= wmUs)
      var frame = st.tail // last ≤ nPreceding emitted rows, oldest first
      val out = ready.map { case e @ (t, id, v) =>
        frame = (frame :+ e).takeRight(nPreceding + 1)
        OverRow(key, id, t, frame.map(_._3).sum, frame.length.toLong)
      }
      val nextLast = if (ready.nonEmpty) ready.last._1 else st.lastEmittedUs
      val nextTail = frame.takeRight(nPreceding)
      if (hold.isEmpty && nextTail.isEmpty) state.remove()
      else {
        state.update(BoundedOverState(nextLast, nextTail, hold))
        if (hold.nonEmpty) state.setTimeoutTimestamp(hold.head._1 / 1000L + 1)
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[BoundedOverState](), ExpressionEncoder[OverRow[K]]())
  }

  /** Streaming row-time OVER aggregate with a BOUNDED time-RANGE frame —
    * `RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW` (ref:
    * RowTimeRangeBoundedPrecedingFunction.java — the reference keeps a
    * per-key map of rows keyed by timestamp, retracts everything older
    * than `ts - precedingUs` on each emit, and fires per TIMESTAMP so
    * peers share one frame). Semantics mirrored here:
    *
    *  - each event is emitted exactly once, when the watermark passes
    *    its timestamp, carrying the sum/count of every row of its key
    *    with `ts ∈ [t - precedingUs, t]`;
    *  - PEER rows (identical timestamp) all receive the SAME aggregate,
    *    including each other — a RANGE frame is bounded by value, not
    *    row position (SQL RANGE semantics; Flink groups rows per timer
    *    timestamp for the same reason);
    *  - late rows (at or below the last emitted timestamp) are dropped,
    *    mirroring the reference's late-data drop.
    *
    * State is O(rows inside the trailing interval + out-of-order
    * window): the retained in-range tail plus the not-yet-emittable
    * buffer — bounded by data rate × frame length regardless of stream
    * length, the same state shape as the reference's per-timestamp map.
    */
  def overRangeBounded[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      tsUsFn: T => Long,
      valueFn: T => Double,
      precedingUs: Long
  )(implicit te: Encoder[T]): Dataset[OverRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[BoundedOverState]): Iterator[OverRow[K]] = {
      val st = if (state.exists) state.get else BoundedOverState(Long.MinValue, Nil, Nil)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val incoming = rows.map(r => (tsUsFn(r), idFn(r), valueFn(r)))
        .filter(_._1 > st.lastEmittedUs) // late rows dropped
      val all = (st.buffer ++ incoming).sortBy(e => (e._1, e._2))
      val (ready, hold) = all.partition(_._1 <= wmUs)
      var frame = st.tail // emitted rows still inside the trailing range, oldest first
      // fire per TIMESTAMP: peers enter the frame together and share one
      // aggregate (the reference's per-timer-timestamp processing)
      val out = ready.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (t, peers) =>
        frame = (frame ++ peers).dropWhile(_._1 < t - precedingUs)
        val (fsum, fcnt) = (frame.map(_._3).sum, frame.length.toLong)
        peers.map { case (_, id, _) => OverRow(key, id, t, fsum, fcnt) }
      }
      val nextLast = if (ready.nonEmpty) ready.last._1 else st.lastEmittedUs
      // evict tail rows no future emit can reference: any future fire has
      // t > wm, so a frame row with ts < wm - precedingUs is out of every
      // future frame. Without this (and the timeout below) a key whose
      // events STOP arriving would retain its frame tail forever — state
      // must stay bounded by the trailing interval, not by keys-ever-seen.
      frame = frame.dropWhile(_._1 < wmUs - precedingUs)
      if (hold.isEmpty && frame.isEmpty) state.remove()
      else {
        state.update(BoundedOverState(nextLast, frame, hold))
        if (hold.nonEmpty) state.setTimeoutTimestamp(hold.head._1 / 1000L + 1)
        else
          // single division (not ts/1000 + preceding/1000): two floor
          // divisions can land the timeout EXACTLY on the watermark ms
          // when frame.last sits at the eviction boundary, which
          // setTimeoutTimestamp rejects (must be strictly later)
          state.setTimeoutTimestamp((frame.last._1 + precedingUs) / 1000L + 1)
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[BoundedOverState](), ExpressionEncoder[OverRow[K]]())
  }

  /** Two CONNECTED keyed streams with a match-or-timeout decision — the
    * CoProcessFunction + event-time-timer pattern (ref:
    * CoProcessFunction.java / KeyedCoProcessOperator; the canonical
    * "order matched by payment within T, else alert" shape): per key,
    * the decision anchors on the EARLIEST left event; the result is the
    * earliest right event inside `[leftTs, leftTs + withinUs]` if one
    * exists (`matched`) or a `timeout` row otherwise. The decision
    * fires exactly once, when the watermark passes `leftTs + withinUs`
    * — at that point every in-window right has arrived by the watermark
    * contract — and the key's state clears. Late rows (below a fired
    * decision) are dropped. Keys with only right events decide nothing
    * (a payment with no order is the mirror query). State per key is
    * the undecided buffer — bounded by rate × (within + watermark
    * delay).
    *
    * PRECONDITION: the stream's watermark delay must be ≤ `withinUs`.
    * Left-less keys prune buffered rights below `wm - withinUs`; any
    * future left has ts ≥ wm − delay, so with delay ≤ within the pruned
    * rights could only have matched lefts that would decide instantly
    * as already-expired. A larger delay could prune a right a
    * still-unseen left needs — size the watermark accordingly.
    */
  final case class CoMatchState(lefts: Seq[Long], rights: Seq[Long], decided: Boolean)
  final case class CoMatchRow[K](key: K, status: String, left_ts: Long,
      right_ts: Option[Long])

  def matchWithTimeout[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      isLeftFn: T => Boolean,
      tsUsFn: T => Long,
      withinUs: Long
  )(implicit te: Encoder[T]): Dataset[CoMatchRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[CoMatchState]): Iterator[CoMatchRow[K]] = {
      val st = if (state.exists) state.get else CoMatchState(Nil, Nil, decided = false)
      // tombstone: a decided key never decides again — stragglers above
      // the watermark must not re-open it (state cost: one flag per
      // decided key, the dedup-state trade)
      if (st.decided) { state.update(st); return Iterator.empty }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (inL, inR) = rows.map(r => (isLeftFn(r), tsUsFn(r))).toSeq.partition(_._1)
      val lefts = st.lefts ++ inL.map(_._2)
      val rights = st.rights ++ inR.map(_._2)
      if (lefts.isEmpty) {
        // nothing to anchor on yet — hold the rights (bounded by the
        // within window: rights older than any future-visible left's
        // window can never match, prune them against the watermark)
        val kept = rights.filter(_ >= wmUs - withinUs)
        if (kept.isEmpty) state.remove()
        else state.update(CoMatchState(Nil, kept, decided = false))
        Iterator.empty
      } else {
        val l = lefts.min
        if (wmUs >= l + withinUs) {
          val r = rights.filter(t => t >= l && t <= l + withinUs)
          state.update(CoMatchState(Nil, Nil, decided = true))
          Iterator.single(
            if (r.nonEmpty) CoMatchRow(key, "matched", l, Some(r.min))
            else CoMatchRow(key, "timeout", l, None))
        } else {
          state.update(CoMatchState(Seq(l), rights.filter(_ >= l), decided = false))
          state.setTimeoutTimestamp((l + withinUs) / 1000L + 1)
          Iterator.empty
        }
      }
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[CoMatchState](), ExpressionEncoder[CoMatchRow[K]]())
  }

  /** Count windows — GlobalWindows + CountTrigger(size) + purge (ref:
    * GlobalWindows.java, CountTrigger.java:36, PurgingTrigger.java;
    * KeyedStream.countWindow): per key, every `size`-th element fires the
    * window over exactly those `size` elements and purges it; a trailing
    * partial window never fires (count-trigger semantics). Elements enter
    * windows in (event-time, id) order, gated on the watermark so
    * out-of-order arrival across micro-batches cannot reorder windows —
    * an element joins a window only once the watermark passes it. State
    * is O(size + out-of-order window): the <size leftover plus the
    * not-yet-ready buffer.
    */
  final case class CountWinState(emitted: Long,
      leftover: Seq[(Long, Long, Double)], buffer: Seq[(Long, Long, Double)])
  final case class CountWinRow[K](key: K, wid: Long, cnt: Long,
      first_id: Long, last_id: Long, sv: Double)

  def countWindow[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      tsUsFn: T => Long,
      valueFn: T => Double,
      size: Int
  )(implicit te: Encoder[T]): Dataset[CountWinRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[CountWinState]): Iterator[CountWinRow[K]] = {
      val st = if (state.exists) state.get else CountWinState(0L, Nil, Nil)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val all = (st.buffer ++ rows.map(r => (tsUsFn(r), idFn(r), valueFn(r))))
        .sortBy(e => (e._1, e._2))
      val (ready, hold) = all.partition(_._1 <= wmUs)
      val seq = st.leftover ++ ready
      val (full, partial) = seq.grouped(size).toSeq.partition(_.length == size)
      val out = full.zipWithIndex.map { case (w, i) =>
        CountWinRow(key, st.emitted + i, w.length.toLong,
          w.head._2, w.last._2, w.map(_._3).sum)
      }
      val leftover = partial.flatten
      if (hold.isEmpty && leftover.isEmpty) state.remove()
      else {
        state.update(CountWinState(st.emitted + full.length, leftover, hold))
        if (hold.nonEmpty) state.setTimeoutTimestamp(hold.head._1 / 1000L + 1)
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[CountWinState](), ExpressionEncoder[CountWinRow[K]]())
  }

  /** Tumbling event-time window with an EVICTOR and a user window
    * function (ref: WindowedStream.evictor:190 — CountEvictor.java /
    * TimeEvictor.java — + apply(ProcessWindowFunction)): elements buffer
    * per (key, window); when the watermark passes the window end, the
    * evictor prunes the buffer (keep the last `keepCount` elements
    * and/or only those within `keepLastMs` of the window's max
    * timestamp — both BEFORE the function, like the reference's
    * evictBefore), then `fn` sees the surviving elements in (ts, id)
    * order. State is one pruned buffer per open window per key.
    */
  final case class EvictWinState(buffer: Seq[(Long, Long, Double)])
  final case class EvictWinRow[K](key: K, wstartUs: Long, cnt: Long, sv: Double)

  def evictingTumbleWindow[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      tsUsFn: T => Long,
      valueFn: T => Double,
      windowUs: Long,
      keepCount: Option[Int] = None,
      keepLastUs: Option[Long] = None
  )(implicit te: Encoder[T]): Dataset[EvictWinRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[EvictWinState]): Iterator[EvictWinRow[K]] = {
      val st = if (state.exists) state.get else EvictWinState(Nil)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val all = (st.buffer ++ rows.map(r => (tsUsFn(r), idFn(r), valueFn(r))))
        .sortBy(e => (e._1, e._2))
      val (ready, hold) = all.partition(e => (e._1 / windowUs + 1) * windowUs <= wmUs)
      val out = ready.groupBy(_._1 / windowUs).toSeq.sortBy(_._1).map { case (w, elems) =>
        val maxTs = elems.map(_._1).max
        val afterTime = keepLastUs match {
          case Some(t) => elems.filter(_._1 >= maxTs - t)
          case None    => elems
        }
        val kept = keepCount match {
          case Some(c) => afterTime.takeRight(c)
          case None    => afterTime
        }
        EvictWinRow(key, w * windowUs, kept.length.toLong, kept.map(_._3).sum)
      }
      if (hold.isEmpty) state.remove()
      else {
        state.update(EvictWinState(hold))
        state.setTimeoutTimestamp(((hold.head._1 / windowUs + 1) * windowUs) / 1000L + 1)
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[EvictWinState](), ExpressionEncoder[EvictWinRow[K]]())
  }

  /** GlobalWindows + DeltaTrigger + optional DeltaEvictor (ref:
    * windowing/triggers/DeltaTrigger.java:53-64,
    * windowing/evictors/DeltaEvictor.java:72-80 — the classic
    * TopSpeedWindowing composition): per key the window is GLOBAL — it
    * grows without purge — and FIRES whenever |v − lastFired| >
    * `threshold`, where lastFired is initialized by the first element
    * and updated at each fire (the reference's last-element ValueState).
    * On fire, the evictor (when set) PERMANENTLY removes buffered
    * elements with |v − vFire| ≥ `evictDelta` (delta against the
    * just-arrived element — the reference's Iterables.getLast), then
    * the emitted row aggregates the surviving buffer, current element
    * included.
    *
    * Elements enter the walk in (event-time, id) order gated on the
    * watermark (same device as [[countWindow]]), so out-of-order
    * arrival across micro-batches cannot reorder fire decisions.
    * Values are exact integers (micro-unit quantization upstream), so
    * the fire walk and the emitted sums are engine-portable. State:
    * with no evictor the un-purged global window folds to
    * (lastFired, count, sum) — O(1) per key, the true 100-TB posture;
    * with an evictor the element buffer materializes (it must
    * re-inspect individual values), bounded by the eviction itself —
    * the reference's own contract (an un-evicted GlobalWindow buffers
    * forever there; here it never does).
    */
  final case class DeltaWinState(init: Boolean, lastFired: Long, fires: Long,
      cnt: Long, sum: Long, buffer: Seq[(Long, Long, Long)], hold: Seq[(Long, Long, Long)])
  final case class DeltaWinRow[K](key: K, wid: Long, fire_id: Long,
      fire_v: Long, cnt: Long, sv: Long)

  def deltaTriggerWindow[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      idFn: T => Long,
      tsUsFn: T => Long,
      valueFn: T => Long,
      threshold: Long,
      evictDelta: Option[Long] = None
  )(implicit te: Encoder[T]): Dataset[DeltaWinRow[K]] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[DeltaWinState]): Iterator[DeltaWinRow[K]] = {
      val st = if (state.exists) state.get
        else DeltaWinState(false, 0L, 0L, 0L, 0L, Nil, Nil)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val all = (st.hold ++ rows.map(r => (tsUsFn(r), idFn(r), valueFn(r))))
        .sortBy(e => (e._1, e._2))
      val (ready, hold) = all.partition(_._1 <= wmUs)
      var init = st.init; var lastFired = st.lastFired; var fires = st.fires
      // no evictor → the un-purged global window only ever emits
      // count/sum, so the state FOLDS to two counters (O(1), the true
      // 100-TB posture); the element buffer materializes only when an
      // evictor must re-inspect individual values
      var cnt = st.cnt; var sum = st.sum
      val buffer = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      buffer ++= st.buffer
      val out = scala.collection.mutable.Buffer.empty[DeltaWinRow[K]]
      ready.foreach { e =>
        if (evictDelta.isDefined) buffer += e
        cnt += 1; sum += e._3
        if (!init) { init = true; lastFired = e._3 }
        else if (math.abs(e._3 - lastFired) > threshold) {
          lastFired = e._3
          evictDelta.foreach { d =>
            buffer.filterInPlace(b => math.abs(b._3 - e._3) < d)
            cnt = buffer.length.toLong; sum = buffer.map(_._3).sum
          }
          out += DeltaWinRow(key, fires, e._2, e._3, cnt, sum)
          fires += 1
        }
      }
      if (!init && hold.isEmpty) state.remove()
      else {
        state.update(DeltaWinState(init, lastFired, fires, cnt, sum, buffer.toSeq, hold))
        if (hold.nonEmpty) state.setTimeoutTimestamp(hold.head._1 / 1000L + 1)
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[DeltaWinState](), ExpressionEncoder[DeltaWinRow[K]]())
  }

  /** ContinuousEventTimeTrigger analog (ref:
    * windowing/triggers/ContinuousEventTimeTrigger.java:54-92): a
    * tumbling event-time window that ADDITIONALLY fires a partial
    * result at every `interval`-aligned event-time boundary while the
    * window is filling, then the final result when the watermark passes
    * the window end — the reference's continuous fire-time timer chain
    * (fireTimestamp += interval per fire), re-derived deterministically:
    * the reference anchors the timer chain at the first ARRIVING
    * element, which is arrival-order-dependent; here a partial fires at
    * every epoch-aligned boundary g (wstart < g < wend) that has at
    * least one event strictly before it, and aggregates events with
    * ts ≤ g — a pure function of event-time data, equal to the
    * reference's chain whenever elements arrive in event-time order
    * (`interval` must divide the window size for the grids to nest).
    * Fires emit once the watermark reaches g (elements ≤ g are all
    * released by then, so a partial can never miss a row it claims).
    *
    * State per key = open-window buffers + the last fired boundary per
    * window + the out-of-order hold; windows drop at their final fire,
    * so state is bounded by (open windows × events in flight), not
    * stream length.
    */
  final case class CetState(buffer: Seq[(Long, Long)],
      fired: Seq[(Long, Long)], hold: Seq[(Long, Long)])
  final case class CetRow[K](key: K, wstart_us: Long, fire_us: Long,
      cnt: Long, sv: Long, is_final: Boolean)

  def continuousEventTimeWindow[T, K: Encoder: TypeTag](
      ds: Dataset[T],
      keyFn: T => K,
      tsUsFn: T => Long,
      valueFn: T => Long,
      windowUs: Long,
      intervalUs: Long
  )(implicit te: Encoder[T]): Dataset[CetRow[K]] = {
    require(windowUs % intervalUs == 0,
      s"continuous fire interval must divide the window size ($intervalUs vs $windowUs)")
    def fn(key: K, rows: Iterator[T], state: GroupState[CetState]): Iterator[CetRow[K]] = {
      val st = if (state.exists) state.get else CetState(Nil, Nil, Nil)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val in = (st.hold ++ rows.map(r => (tsUsFn(r), valueFn(r))))
      val (ready, hold) = in.partition(_._1 <= wmUs)
      val firedMap = scala.collection.mutable.Map(st.fired: _*)
      val out = scala.collection.mutable.Buffer.empty[CetRow[K]]
      val remaining = Seq.newBuilder[(Long, Long)]
      (st.buffer ++ ready).groupBy(_._1 / windowUs).toSeq.sortBy(_._1).foreach {
        case (w, elems) =>
          val wstart = w * windowUs; val wend = wstart + windowUs
          // pending partial boundaries fire in timestamp order — on a
          // watermark jump past the window end the reference's timer
          // sweep still fires every registered partial BEFORE the
          // final, so the partial history is batching-independent
          var g = firedMap.getOrElse(wstart, wstart) + intervalUs
          while (g <= wmUs && g < wend) {
            if (elems.exists(_._1 < g)) {
              val le = elems.filter(_._1 <= g)
              out += CetRow(key, wstart, g, le.length.toLong,
                le.map(_._2).sum, is_final = false)
            }
            firedMap.update(wstart, g)
            g += intervalUs
          }
          if (wmUs >= wend) {
            out += CetRow(key, wstart, wend, elems.length.toLong,
              elems.map(_._2).sum, is_final = true)
            firedMap.remove(wstart) // window closed — state drops it
          } else remaining ++= elems
      }
      val rem = remaining.result()
      if (rem.isEmpty && hold.isEmpty) state.remove()
      else {
        state.update(CetState(rem, firedMap.toSeq, hold))
        val nextFires = rem.map(_._1 / windowUs).distinct.map { w =>
          val wstart = w * windowUs
          math.min(firedMap.getOrElse(wstart, wstart) + intervalUs, wstart + windowUs)
        }
        val wake = (nextFires ++ (if (hold.isEmpty) Nil else Seq(hold.map(_._1).min))).min
        state.setTimeoutTimestamp(wake / 1000L + 1)
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)(
        ExpressionEncoder[CetState](), ExpressionEncoder[CetRow[K]]())
  }

  /** KeyedProcessFunction-style hook (ref: KeyedStream.process:372,
    * KeyedProcessFunction.java): user code sees (key, new events sorted
    * by time, previous state) and returns (outputs, new state) — value
    * state plus event-time timer emulation via GroupState timeouts.
    * Timers fire as timed-out invocations with an empty event iterator.
    */
  trait KeyedProcess[K, T, S, O] extends Serializable {
    def process(key: K, events: Seq[T], state: Option[S], watermarkMs: Long): (Seq[O], Option[S])
    /** absolute event-time ms at which to call back with no events */
    def timerMs(state: S): Option[Long] = None
  }

  def process[K: Encoder, T, S: Encoder, O: Encoder](
      ds: Dataset[T],
      keyFn: T => K,
      tsUsFn: T => Long,
      proc: KeyedProcess[K, T, S, O]
  )(implicit te: Encoder[T]): Dataset[O] = {
    def fn(key: K, rows: Iterator[T], state: GroupState[S]): Iterator[O] = {
      val sorted = rows.toSeq.sortBy(tsUsFn)
      val (out, next) = proc.process(key, sorted, if (state.exists) Some(state.get) else None,
        state.getCurrentWatermarkMs())
      next match {
        case Some(s) =>
          state.update(s)
          proc.timerMs(s).foreach(state.setTimeoutTimestamp)
        case None => if (state.exists) state.remove()
      }
      out.iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
