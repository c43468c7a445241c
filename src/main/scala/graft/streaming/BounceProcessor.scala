package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import StreamOps.{BounceRow, Event}

/** J4 CEP bounce detection on Spark 4's `transformWithState` — the
  * arbitrary-state API successor to `flatMapGroupsWithState`
  * (`StreamOps.j4BounceDetect` is the legacy-API rendering; both are
  * parity-tested against the batch lead() oracle).
  *
  * Reference semantics (`app/dwm/UserJumpDetailApp.java:68-117`): a
  * session-start event bounces if followed by another start within the
  * match window (matched branch) or by nothing at all inside the window
  * (Flink CEP's timeout side output). The timeout branch here is a real
  * event-time timer: `registerTimer(start + window)` fires via
  * `handleExpiredTimer` once the watermark passes it — the exact analog
  * of Flink's `within()` timeout, with per-key state + timers both
  * hash-partitioned by the state store at scale.
  */
class BounceProcessor(windowMs: Long)
    extends StatefulProcessor[Long, Event, BounceRow] {

  @transient private var pending: ValueState[Event] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getValueState[Event]("pending", Encoders.product[Event], TTLConfig.NONE)

  private def sec(e: Event): Long = (e.ts.getTime / 1000L) * 1000L

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[BounceRow] = {
    val sorted = rows.toSeq.sortBy(e => (sec(e), e.event_id))
    var p: Option[Event] = if (pending.exists()) Option(pending.get()) else None
    val out = Seq.newBuilder[BounceRow]
    sorted.foreach { e =>
      p match {
        case Some(s) =>
          if (sec(e) > sec(s) + windowMs) {
            out += BounceRow(s.event_id, key, StreamOps.fmt(s.ts)) // timed out in-stream
            p = None
          } else if (e.event_type == "view") {
            out += BounceRow(s.event_id, key, StreamOps.fmt(s.ts)) // matched: start→start
            p = None
          } else {
            p = None // followed by a non-start inside the window: no bounce
          }
        case None =>
      }
      if (p.isEmpty && e.event_type == "view") p = Some(e)
    }
    // reconcile state + the single outstanding timer for this key
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    p match {
      case Some(s) =>
        pending.update(s)
        getHandle.registerTimer(sec(s) + windowMs)
      case None => pending.clear()
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[BounceRow] =
    if (pending.exists()) {
      val s = pending.get()
      pending.clear()
      Iterator.single(BounceRow(s.event_id, key, StreamOps.fmt(s.ts)))
    } else Iterator.empty
}

object BounceProcessor {
  /** Input must carry a watermark on `ts` (event-time timers fire off it). */
  def apply(events: Dataset[Event], windowMs: Long = 10 * 60 * 1000L): Dataset[BounceRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new BounceProcessor(windowMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
