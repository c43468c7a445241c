package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import StreamOps.Event

/** Live out-of-orderness monitor — the streaming twin of the batch
  * `Relational.a25LatenessProfile` audit: per event, how far the SAME
  * user's event-time high-water mark had already advanced when the event
  * arrived (`lateness_us = max(0, maxSoFar − ts)`). Run beside a
  * production job it answers, continuously, the question the batch audit
  * answers retrospectively: is the configured watermark still covering
  * the lateness tail, or has the source's delivery shifted (ST4/ST6
  * operational companion).
  *
  * State: ONE long (the per-user max event-time) — the minimum any
  * lateness definition can carry; TTL-boundable via the handle's
  * `TTLConfig` exactly like the ST2 machinery when user churn is
  * unbounded. Arrival order: event_id is the ingest sequence (the same
  * convention as the batch audit), so each micro-batch's per-user rows
  * are processed in event_id order and cross-batch ordering follows
  * batch arrival — feeding batches in ingest order reproduces the batch
  * audit exactly (parity-tested).
  */
class LatenessProcessor extends StatefulProcessor[Long, Event, LatenessProcessor.LateRow] {

  @transient private var maxTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxTs = getHandle.getValueState[Long]("maxTs", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[LatenessProcessor.LateRow] = {
    val sorted = rows.toSeq.sortBy(_.event_id)
    sorted.map { e =>
      // full-µs epoch: getTime is ms-truncated, the nanos field carries the
      // complete fractional second (events are timestamp[us] parquet)
      val tsu = math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
      val prev = if (maxTs.exists()) maxTs.get() else Long.MinValue
      val late = if (prev == Long.MinValue) 0L else math.max(0L, prev - tsu)
      if (tsu > prev) maxTs.update(tsu)
      LatenessProcessor.LateRow(e.event_id, key, late)
    }.iterator
  }
}

object LatenessProcessor {
  case class LateRow(event_id: Long, user_id: Long, late_us: Long)

  def apply(events: Dataset[Event]): Dataset[LateRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new LatenessProcessor, TimeMode.None(), OutputMode.Update())
  }
}
