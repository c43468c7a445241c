package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** ST2 exact-TTL rendering via Spark 4 `transformWithState`
  * (`app/dwm/UniqueVisitApp.java:54-87`): keyed ValueState holds the last
  * seen date per mid with a 24h TTL configured `OnCreateAndWrite`-style —
  * `TTLConfig` resets the clock on every write, exactly the reference's
  * `StateTtlConfig.newBuilder(Time.hours(24)).setUpdateType(OnCreateAndWrite)`.
  * An event passes iff its date differs from the stored one.
  *
  * The watermark-scoped `dropDuplicates` in `StreamOps.st2DedupedVisits`
  * is the declarative equivalent; this processor is the exact-semantics
  * rendering (TTL keyed to processing time like the reference, not to the
  * watermark).
  */
class UvDedupProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, (Long, String), (Long, String)] {

  @transient private var lastDate: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttlConf = if (ttl.isZero) TTLConfig.NONE else TTLConfig(ttl)
    lastDate = getHandle.getValueState[String]("lastDate", Encoders.STRING, ttlConf)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                               timerValues: TimerValues): Iterator[(Long, String)] = {
    val out = Seq.newBuilder[(Long, String)]
    rows.foreach { case (uid, date) =>
      val prev = if (lastDate.exists()) Option(lastDate.get()) else None
      if (!prev.contains(date)) {
        out += ((uid, date))
        lastDate.update(date) // OnCreateAndWrite: every write renews the TTL
      }
    }
    out.result().iterator
  }
}

object UvDedupProcessor {
  /** input: (user_id, date-string); output: first event per (user, date)
    * within the TTL horizon.
    */
  def apply(events: Dataset[(Long, String)],
            ttl: java.time.Duration = java.time.Duration.ofHours(24)): Dataset[(Long, String)] = {
    import events.sparkSession.implicits._
    val timeMode = if (ttl.isZero) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_._1)
      .transformWithState(new UvDedupProcessor(ttl), timeMode, OutputMode.Update())
  }
}
