package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with event-time timeouts — the
  * stateful counterpart of `RelQueries.sessionize` (30-min inactivity
  * closes a session). Sessions are emitted ONLY when closed: by a
  * larger-gap event arriving, or by the watermark passing the gap
  * (event-time timeout) — so results are final, append-sink-safe.
  *
  * State per user is O(1) (current session bounds + count); the
  * streaming shuffle keys by user exactly like the batch window. */
object Sessionize {

  final case class SessionEvent(user_id: Long, t: Timestamp)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  val GapMs: Long = 30L * 60 * 1000

  /** Input must already carry `withWatermark` on `t`. */
  def sessions(events: Dataset[SessionEvent]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(_.t.getTime)
          var open = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          if (sorted.isEmpty) {
            // event-time timeout: the watermark passed lastMs + gap
            open.foreach(s => closed += ClosedSession(user, s.startMs, s.lastMs, s.n))
            open = None
            state.remove()
          } else {
            sorted.foreach { e =>
              val ms = e.t.getTime
              open match {
                case Some(s) if ms - s.lastMs <= GapMs =>
                  // an out-of-order event the watermark still admits may
                  // have ms < lastMs (it falls INSIDE the session):
                  // bounds only widen, never move backward — otherwise a
                  // later event would measure its gap against the stale
                  // minimum and mis-split the session
                  open = Some(OpenSession(math.min(s.startMs, ms), math.max(s.lastMs, ms), s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(user, s.startMs, s.lastMs, s.n)
                  open = Some(OpenSession(ms, ms, 1))
                case None =>
                  open = Some(OpenSession(ms, ms, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + GapMs)
            }
          }
          closed.result().iterator
      }
  }
}
