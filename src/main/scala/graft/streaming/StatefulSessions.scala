package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // merge when the event touches the session's gap
                // envelope [start - gap, lastTs + gap): min/max extend
                // the bounds so an out-of-order (late but in-watermark)
                // event never REWINDS lastTs and splits the session
                case Some(s) if t < s.lastTs + gapMs && t >= s.start - gapMs =>
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  out += SessionOut(userId, new Timestamp(s.start), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            out.result().iterator
          }
      }
  }
}
