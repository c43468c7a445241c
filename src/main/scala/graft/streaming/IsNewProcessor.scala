package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import StreamOps.{Event, IsNewRow}

/** ST1 (new/returning visitor correction) on Spark 4 `transformWithState`
  * (`app/dwd/BaseLogApp.java:71-96`): one boolean ValueState per user —
  * the first-ever event keeps is_new=1, everything after is corrected to
  * 0. Same semantics as the `flatMapGroupsWithState` rendering
  * (`StreamOps.st1IsNewFix`), on the arbitrary-state API; both are
  * parity-tested against the batch row_number oracle.
  */
class IsNewProcessor extends StatefulProcessor[Long, Event, IsNewRow] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[IsNewRow] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    sorted.map { e =>
      val first = !seen.exists()
      if (first) seen.update(true)
      IsNewRow(e.event_id, key, if (first) 1L else 0L)
    }.iterator
  }
}

object IsNewProcessor {
  def apply(events: Dataset[Event]): Dataset[IsNewRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new IsNewProcessor, TimeMode.None(), OutputMode.Update())
  }
}
