package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom streaming state via `transformWithState` (SURVEY.md §2.9 / §1.1:
  * the Spark 4 state surface): event-time sessionization with a gap
  * timeout — the streaming counterpart of the batch q54 sessionize (same
  * gap semantics), and the shape any "custom state machine per key"
  * operator takes in this engine.
  *
  * Correctness under reordering: a session is emitted ONLY once the
  * watermark has passed `sessionEnd + gap` — never on an in-batch gap —
  * because an out-of-order event may still arrive (within the watermark
  * delay) that belongs to, extends, or bridges existing sessions. State per
  * key is a list of open interval clusters; an incoming event joins every
  * cluster within `gap` of it (merging clusters it bridges) or starts a new
  * one. State lives in the state store (per-key, checkpointed, bounded by
  * the watermark), NOT driver memory. Keys with open sessions but no new
  * events close through an EVENT-TIME TIMER registered at the earliest
  * possible close point (`transformWithState`'s native timer surface — the
  * `setTimeoutTimestamp` analog, but allowing several state variables
  * beside it).
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

  private[streaming] class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[String, SessionEvent, Session] {
    @transient private var open: ValueState[Clusters] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Clusters](
        "open", Encoders.product[Clusters], TTLConfig.NONE)

    /** Close every cluster the watermark has sealed; keep the rest and arm
      * a timer at the earliest moment a survivor could become closable.
      */
    private def closeSealed(userId: String, ingested: List[SessionState],
      wm: Long): Iterator[Session] = {
      // closable = the watermark guarantees no further event can join.
      // STRICT inequality: an event at ts == wm may still be admitted
      // (late-filter boundary semantics), and absorb's join window is
      // inclusive — closing at equality could split its session.
      val (done, live) = ingested.partition(_.lastMs + gapMs < wm)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (live.isEmpty) open.clear()
      else {
        open.update(Clusters(live))
        getHandle.registerTimer(live.map(_.lastMs).min + gapMs)
      }
      done.sortBy(_.startMs).iterator.map(s =>
        Session(userId, s.startMs, s.lastMs, s.n, s.sum, s.lastMs - s.startMs))
    }

    override def handleInputRows(userId: String, it: Iterator[SessionEvent],
      tv: TimerValues): Iterator[Session] = {
      val prior = if (open.exists()) open.get().open else Nil
      val ingested = it.foldLeft(prior) { (cs, e) =>
        absorb(cs, e.ts.getTime, e.value, gapMs)
      }
      closeSealed(userId, ingested, tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(userId: String, tv: TimerValues,
      info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      val prior = if (open.exists()) open.get().open else Nil
      closeSealed(userId, prior, tv.getCurrentWatermarkInMs())
    }
  }

  def sessions(events: Dataset[SessionEvent], gapMs: Long,
    watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
