package graft

import org.apache.spark.sql.functions._

/** Scale-sweep for the warehouse-analytics family (SCD2 history, ordered
  * funnel, cohort retention, rolling active users): the 10× evidence that
  * the shared shuffle-once-by-user plan shape scales linearly in event
  * volume when per-user structure is held fixed.
  *
  * Construction: replica i shifts user_id and event_id past any real id
  * (same timestamps, same per-user event sequences), so every replica
  * reproduces the base population exactly and NO user crosses replicas.
  * Under that construction the outputs MUST satisfy exact ×factor
  * relations — SCD2 history rows, each funnel stage count, every cohort
  * retention cell, and each day's DAU/WAU scale by the factor while
  * stickiness ratios are unchanged. The sweep enforces all four the same
  * way `BenchScale` enforces pair-set equality: artifact written first,
  * nonzero exit on violation, so timings from an invalid run cannot be
  * cited. Wall-clock growing ~linearly is then honest evidence no stage
  * is super-linear: the user partitioning fans out, the rollup key
  * spaces (event-type catalog, days², calendar days) stay fixed.
  *
  * Writes `BENCH_SCALE_analytics.json`; prints the JSON as the last line.
  */
object BenchScaleAnalytics {

  def enforce(name: String, base: Long, scaled: Long, factor: Int): Unit =
    if (base <= 0 || scaled != factor * base)
      throw new IllegalStateException(
        s"analytics sweep invalid: $name base=$base scaled=$scaled factor=$factor " +
          "(expected scaled == factor * base > 0) — artifact written but the run's " +
          "timings must not be cited")

  private def exec(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  private def drop(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // a 10× leg AND a 100× leg by default: 10× can hide a log factor the
    // brief's "survive a 100× scale-up" bar cares about; 100× of the sf0.1
    // events table (~10M rows) is trivially in-RAM, so the only cost is
    // wall-clock. SPARK_GRAFT_SCALE_FACTOR still pins a single leg.
    val factors = sys.env.get("SPARK_GRAFT_SCALE_FACTOR").map(f => Seq(f.toInt))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "10,100")
        .split(",").map(_.trim.toInt).toSeq)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = GraftSession.get()
    val legs = factors.map(f => runLeg(spark, sfDir, f, reps))
    val json =
      s"""{"metric":"scale_sweep_analytics","sf":"$sfDir","reps":$reps,""" +
        s""""factors":[${factors.mkString(",")}],""" +
        s""""legs":{${legs.map(_._1).mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALE_analytics.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
    // after the print (driver tail-capture still sees the record): an
    // uncaught throw here exits the JVM nonzero
    legs.foreach(_._2.apply())
  }

  /** One factor leg: timings + exact ×factor gates. Returns the leg's JSON
    * fragment and a deferred enforcement thunk (run after the artifact is
    * written so an invalid run still leaves its flagged record).
    */
  private def runLeg(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                     factor: Int, reps: Int): (String, () => Unit) = {

    def replica(i: Int) =
      Tables.events(spark, sfDir).select(
        (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
        col("event_type"), col("value"))
    def base = Tables.spread(spark, replica(0))
    def scaled = Tables.spread(spark, (0 until factor).map(replica).reduce(_ union _))

    import operators.LogPipeline._
    val family: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "scd2_history" -> (ev => scd2Transform(ev)),
      "event_funnel" -> (ev => a13FunnelTransform(ev)),
      "cohort_retention" -> (ev => a14CohortTransform(ev)),
      "active_users" -> (ev => a18ActiveTransform(ev)))

    // warm codegen/JIT off the clock
    family.foreach { case (_, mk) =>
      try { exec(mk(base).limit(1)); () } catch { case _: Throwable => }
    }
    drop(spark)

    def timed(mk: => org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        exec(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        drop(spark)
        dt
      }
      runs.min
    }

    val times = family.map { case (name, mk) =>
      (name, timed(mk(base)), timed(mk(scaled)))
    }

    // exact ×factor gates, computed OFF the timed path. History rows and
    // funnel stage counts are scalar relations; cohort cells and per-day
    // actives are checked cell-by-cell so a compensating error can't hide.
    val baseHist = exec(scd2Transform(base))
    val scaledHist = exec(scd2Transform(scaled))
    val bf = a13FunnelTransform(base).collect().head
    val sf = a13FunnelTransform(scaled).collect().head
    val funnelExact = (0 to 2).forall(i => sf.getLong(i) == factor * bf.getLong(i))
    def cellMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bc = cellMap(a14CohortTransform(base))
    val sc = cellMap(a14CohortTransform(scaled))
    val cohortExact = bc.nonEmpty && sc.keySet == bc.keySet &&
      bc.forall { case (k, v) => sc(k) == factor * v }
    def dayMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bd = dayMap(a18ActiveTransform(base))
    val sd = dayMap(a18ActiveTransform(scaled))
    val activeExact = bd.nonEmpty && sd.keySet == bd.keySet &&
      bd.forall { case (k, (dau, wau)) => sd(k) == ((factor * dau, factor * wau)) }

    val timesJson = times.map { case (n, b, s) =>
      s""""$n":{"base_sec":$b,"scaled_sec":$s}"""
    }.mkString(",")
    val legJson =
      s""""x$factor":{"factor":$factor,"times":{$timesJson},""" +
        s""""base_hist_rows":$baseHist,"scaled_hist_rows":$scaledHist,""" +
        s""""hist_exact_multiple":${scaledHist == factor.toLong * baseHist},""" +
        s""""funnel_exact_multiple":$funnelExact,""" +
        s""""cohort_cells_exact_multiple":$cohortExact,""" +
        s""""active_days_exact_multiple":$activeExact}"""
    val enforceLeg = () => {
      enforce("scd2_history", baseHist, scaledHist, factor)
      if (!funnelExact) throw new IllegalStateException(
        s"analytics sweep invalid at x$factor: funnel counts not exact multiples")
      if (!cohortExact) throw new IllegalStateException(
        s"analytics sweep invalid at x$factor: cohort cells not exact multiples")
      if (!activeExact) throw new IllegalStateException(
        s"analytics sweep invalid at x$factor: per-day actives not exact multiples")
    }
    (legJson, enforceLeg)
  }
}
