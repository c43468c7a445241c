package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import StreamOps.Event

/** Streaming twin of the batch `Relational.a26ValueDecay` feature: the
  * RUNNING exponentially-decayed user value, maintained incrementally by
  * forward decay — on each purchase,
  * `v ← v·2^(−(t−t_prev)/halfLife) + value`, so state is two numbers per
  * user (the decayed value as of the last event, and that event's time)
  * no matter how long the history. This is the standard online rendering
  * of a decayed sum (Cormode et al.'s forward decay): algebraically,
  * decaying the running value to any reference instant equals the batch
  * Σ value·2^(−(ref−tᵢ)/halfLife) — the parity test checks exactly that
  * identity against `a26ValueDecay`'s figures (to float tolerance: the
  * incremental product associates differently than the batch fold).
  *
  * Feature stores keep precisely this pair per (user, feature) so serving
  * reads decay-to-now without replaying history; TTL bounds idle users
  * via the handle's `TTLConfig` like the ST2 machinery.
  */
class DecayProcessor(halfLifeUs: Double)
  extends StatefulProcessor[Long, Event, DecayProcessor.DecayRow] {

  @transient private var state: ValueState[(Double, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Double, Long)](
      "decay", Encoders.product[(Double, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[DecayProcessor.DecayRow] = {
    val sorted = rows.toSeq.sortBy(e => (LatenessProcessorMicros.of(e.ts), e.event_id))
    sorted.map { e =>
      val tsu = LatenessProcessorMicros.of(e.ts)
      val (vPrev, tPrev) =
        if (state.exists()) state.get() else (0.0, tsu)
      val decayed = vPrev * math.pow(2.0, -((tsu - tPrev).toDouble / halfLifeUs))
      val vNew = decayed + e.value
      state.update((vNew, tsu))
      DecayProcessor.DecayRow(e.event_id, key, tsu, vNew)
    }.iterator
  }
}

/** Shared µs conversion (Timestamp.getTime is ms-truncated; the nanos
  * field carries the full fractional second).
  */
object LatenessProcessorMicros {
  def of(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
}

object DecayProcessor {
  case class DecayRow(event_id: Long, user_id: Long, tsu: Long, decayed_value: Double)

  def apply(purchases: Dataset[Event],
            halfLifeDays: Double = 30.0): Dataset[DecayRow] = {
    import purchases.sparkSession.implicits._
    purchases
      .groupByKey(_.user_id)
      .transformWithState(new DecayProcessor(halfLifeDays * 86400e6),
        TimeMode.None(), OutputMode.Update())
  }
}
