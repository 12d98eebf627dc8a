package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state tier below `session_window` (StreamOps.session): the
  * same gap semantics, but with user-controlled per-key state, which is
  * the pattern a training-data pipeline needs for richer session payloads
  * (counters, samples, early emission). State per key is O(1); keys
  * shuffle-partition, so the operator scales with the key space.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp, n: Long,
      total: Double)

  val gapMs: Long = 10 * 60 * 1000

  /** Emits a session when the gap to the next event is >= 10 minutes
    * (matching `session_window`'s closed-end semantics) or on event-time
    * timeout. Watermark-driven GroupStateTimeout handles the tail
    * session.
    */
  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, new Timestamp(s.start), s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            // merge when the event touches the session's gap envelope
            // [start - gap, lastTs + gap): min/max extend the bounds so
            // an out-of-order (late but in-watermark) event never
            // REWINDS lastTs and splits the session (see mergeEvent)
            sorted.foreach { e =>
              cur = Some(mergeEvent(cur, e.ts.getTime, e.value,
                s => out += SessionOut(userId, new Timestamp(s.start),
                  s.n, s.total)))
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            out.result().iterator
          }
      }
  }

  /** The shared merge step: fold one event into the open session (or
    * close it and open a new one). Both sessionizers call this, so the
    * fMGWS and transformWithState forms cannot drift apart.
    */
  private[graft] def mergeEvent(cur: Option[SessionState], t: Long,
      value: Double, emit: SessionState => Unit): SessionState = cur match {
    case Some(s) if t < s.lastTs + gapMs && t >= s.start - gapMs =>
      s.copy(start = math.min(s.start, t), lastTs = math.max(s.lastTs, t),
        n = s.n + 1, total = s.total + value)
    case other =>
      other.foreach(emit)
      SessionState(t, t, 1, value)
  }

  /** The same sessionizer on the Spark 4 `transformWithState` API — the
    * successor to flatMapGroupsWithState: typed composable state
    * (value/list/map), explicit event-time TIMERS instead of a single
    * timeout slot, and state-store TTL. Requires the RocksDB state store
    * provider (a hard transformWithState requirement, not a choice).
    * Timer discipline: each update deletes the previous gap timer and
    * registers the new one; the expiry handler re-checks the live state
    * against the firing timestamp, so a stale timer (from a state the
    * delete couldn't see, e.g. after a restart) can never close a
    * session early. Emission semantics match `sessionize` exactly —
    * StreamingSuite asserts the two outputs are equal.
    */
  class SessionProcessor
      extends StatefulProcessor[Long, SessionEvent, SessionOut] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val out = Seq.newBuilder[SessionOut]
      var cur = Option(state.get())
      cur.foreach(s => getHandle.deleteTimer(s.lastTs + gapMs))
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        cur = Some(mergeEvent(cur, e.ts.getTime, e.value,
          s => out += SessionOut(key, new Timestamp(s.start), s.n, s.total)))
      }
      cur.foreach { s =>
        state.update(s)
        getHandle.registerTimer(s.lastTs + gapMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val cur = Option(state.get())
      cur match {
        case Some(s) if s.lastTs + gapMs <= expiredTimerInfo.getExpiryTimeInMs() =>
          state.clear()
          Iterator.single(SessionOut(key, new Timestamp(s.start), s.n, s.total))
        case _ => Iterator.empty // stale timer; the session was extended
      }
    }
  }

  /** `sessionize` on transformWithState (see [[SessionProcessor]]). */
  def sessionizeTws(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
