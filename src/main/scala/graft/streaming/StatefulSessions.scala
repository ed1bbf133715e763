package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.9 /
  * brief: the KeyValueGroupedDataset state surface): event-time
  * sessionization with a gap timeout — the streaming counterpart of the
  * batch q54 sessionize (same gap semantics), and the shape any
  * "custom state machine per key" operator takes in this engine.
  *
  * Correctness under reordering: a session is emitted ONLY once the
  * watermark has passed `sessionEnd + gap` — never on an in-batch gap —
  * because an out-of-order event may still arrive (within the watermark
  * delay) that belongs to, extends, or bridges existing sessions. State per
  * key is a list of open interval clusters; an incoming event joins every
  * cluster within `gap` of it (merging clusters it bridges) or starts a new
  * one. State lives in the state store (per-key, checkpointed, bounded by
  * the watermark), NOT driver memory.
  */
object StatefulSessions {

  case class SessionEvent(userId: String, ts: java.sql.Timestamp, value: Double)
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class Clusters(open: List[SessionState])
  case class Session(
    userId: String, startMs: Long, endMs: Long, nEvents: Long,
    sumValue: Double, durationMs: Long)

  /** Fold one event into the cluster list (merge semantics above). */
  private def absorb(clusters: List[SessionState], t: Long, v: Double,
    gapMs: Long): List[SessionState] = {
    val (near, far) = clusters.partition(c =>
      t >= c.startMs - gapMs && t <= c.lastMs + gapMs)
    val merged = near.foldLeft(SessionState(t, t, 1L, v)) { (acc, c) =>
      SessionState(math.min(acc.startMs, c.startMs), math.max(acc.lastMs, c.lastMs),
        acc.n + c.n, acc.sum + c.sum)
    }
    merged :: far
  }

  def sessions(events: Dataset[SessionEvent], gapMs: Long,
    watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: String, it: Iterator[SessionEvent], state: GroupState[Clusters]) => {
          val wm = state.getCurrentWatermarkMs()
          val ingested = it.foldLeft(state.getOption.map(_.open).getOrElse(Nil)) {
            (cs, e) => absorb(cs, e.ts.getTime, e.value, gapMs)
          }
          // closable = the watermark guarantees no further event can join.
          // STRICT inequality: an event at ts == wm may still be admitted
          // (late-filter boundary semantics), and absorb's join window is
          // inclusive — closing at equality could split its session.
          val (done, live) = ingested.partition(_.lastMs + gapMs < wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(Clusters(live))
            state.setTimeoutTimestamp(live.map(_.lastMs).min + gapMs)
          }
          done.sortBy(_.startMs).iterator.map(s =>
            Session(userId, s.startMs, s.lastMs, s.n, s.sum, s.lastMs - s.startMs))
        })
  }
}
