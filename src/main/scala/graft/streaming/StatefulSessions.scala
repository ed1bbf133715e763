package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.9 /
  * brief: the KeyValueGroupedDataset state surface): event-time
  * sessionization with a gap timeout — the streaming counterpart of the
  * batch q54 sessionize (same gap semantics), and the shape any
  * "custom state machine per key" operator takes in this engine.
  *
  * State lives in the state store (per-key, checkpointed, bounded by the
  * watermark), NOT driver memory — this scales to arbitrarily many keys
  * across executors.
  */
object StatefulSessions {

  case class SessionEvent(userId: String, ts: java.sql.Timestamp, value: Double)
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class Session(
    userId: String, startMs: Long, endMs: Long, nEvents: Long,
    sumValue: Double, durationMs: Long)

  /** Open sessions absorb events and arm an event-time timeout at
    * `last + gap`; when the watermark passes it, the closed session is
    * emitted exactly once (append mode).
    */
  def sessions(events: Dataset[SessionEvent], gapMs: Long,
    watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: String, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, s.startMs, s.lastMs, s.n, s.sum, s.lastMs - s.startMs))
          } else {
            val events = it.toSeq.sortBy(_.ts.getTime) // batch order is arbitrary
            val (closed, open) = events.foldLeft(
              (List.empty[Session], state.getOption)) { case ((done, cur), e) =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  (done, Some(SessionState(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value)))
                case Some(s) => // in-batch gap: close the old session inline
                  (Session(userId, s.startMs, s.lastMs, s.n, s.sum, s.lastMs - s.startMs) :: done,
                    Some(SessionState(t, t, 1L, e.value)))
                case None =>
                  (done, Some(SessionState(t, t, 1L, e.value)))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          })
  }
}
