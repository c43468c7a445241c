package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import StreamOps.Event

/** Streaming drift alarm: Page's recursive CUSUM per event type — the
  * ONLINE twin of the batch `a30_cusum_change` scan. Where the batch op
  * locates a level shift retrospectively (argmax of the centered
  * cumulative sum), the streaming form detects it AS IT HAPPENS with two
  * numbers of state per key:
  *
  *   S⁺ ← max(0, S⁺ + (x − μ0 − k))   (upward drift)
  *   S⁻ ← max(0, S⁻ + (μ0 − k − x))   (downward drift)
  *
  * and raises the alarm when either exceeds the decision interval `h`,
  * then restarts (the standard Page reset, so repeated shifts re-alarm).
  * μ0/k/h are calibration constants from the batch profile (μ0 = the
  * reference mean, k = half the shift worth detecting, h = the ARL
  * knob) — exactly the two-phase deployment CUSUM monitoring uses:
  * calibrate offline (a29/a30), watch online.
  *
  * Events within a micro-batch are processed in (event time, event_id)
  * order (the DecayProcessor contract), so emissions are deterministic
  * under replay and the parity spec can fold the identical recursion on
  * the driver. State is O(1) per key regardless of history; idle keys
  * would be TTL-bounded in production via the handle's `TTLConfig`.
  */
class CusumProcessor(mu0: Double, slack: Double, threshold: Double)
  extends StatefulProcessor[String, Event, CusumProcessor.CusumRow] {

  @transient private var state: ValueState[(Double, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Double, Double)](
      "cusum", Encoders.product[(Double, Double)], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[CusumProcessor.CusumRow] = {
    val sorted = rows.toSeq.sortBy(e => (LatenessProcessorMicros.of(e.ts), e.event_id))
    sorted.map { e =>
      val (sp, sn) = if (state.exists()) state.get() else (0.0, 0.0)
      val spNew = math.max(0.0, sp + (e.value - mu0 - slack))
      val snNew = math.max(0.0, sn + (mu0 - slack - e.value))
      val alarm = spNew > threshold || snNew > threshold
      // Page reset: restart the scan after an alarm so later shifts re-fire
      state.update(if (alarm) (0.0, 0.0) else (spNew, snNew))
      CusumProcessor.CusumRow(e.event_id, key,
        LatenessProcessorMicros.of(e.ts), spNew, snNew, if (alarm) 1L else 0L)
    }.iterator
  }
}

object CusumProcessor {
  case class CusumRow(event_id: Long, event_type: String, tsu: Long,
                      s_pos: Double, s_neg: Double, alarm: Long)

  def apply(events: Dataset[Event], mu0: Double, slack: Double,
            threshold: Double): Dataset[CusumRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(mu0, slack, threshold),
        TimeMode.None(), OutputMode.Update())
  }
}
