package graft

import org.apache.spark.sql.functions._

/** Scale-sweep for the ONE-SWITCH 100 TB profile (`Scale.scaleMode`):
  * the recorded 10× evidence that the Catalyst sketch rewrites — exact
  * distinct counts → HLL (`approx_count_distinct`), exact interpolated
  * percentiles → t-digest (`percentile_approx`) — hold their DOCUMENTED
  * error bounds while removing the exact operators' scale hazards (the
  * per-group set materialization of `collect_set`, the full sort of
  * `percentile`). Closes the loop on the scale-mode claims: until this
  * sweep the switch was plan-asserted and timed, but its accuracy
  * contract was never enforced anywhere (round-8 stretch directive).
  *
  * Construction mirrors the other sweeps: replica i shifts every entity
  * key past any real id (events.user_id/event_id, orders.o_orderkey/
  * o_custkey, customer.c_custkey; nation fixed), so per-key structure is
  * held fixed and EXACT-mode outputs must satisfy exact ×factor
  * relations — a2 per-(window, type) user counts and a3 per-(window,
  * nation) order counts scale by the factor, a8's exact percentiles are
  * replication-INVARIANT. Those exactness gates validate the corpus;
  * the sketch gates then bound the approximation against the exact run
  * ON THE SAME corpus at BOTH scales:
  *
  *  - HLL distinct counts: per-row relative error ≤ 0.15 (default rsd
  *    0.05; 3σ margin), row keys identical, and the NON-rewritten
  *    columns (sums, plain counts) bit-equal to the exact run — the
  *    rewrite touched only the distinct aggregate;
  *  - t-digest percentiles: quantile-RANK error ≤ 0.05 — for reported
  *    value v at target quantile q, |rank(v) − q| where rank(v) =
  *    |{x ≤ v}| / n per group (the principled sketch metric: value-space
  *    error is unbounded on skewed data, rank error is what t-digest
  *    guarantees).
  *
  * Artifact first (`BENCH_SCALE_sketch.json`), nonzero exit on any gate
  * violation — the `BenchScale` contract.
  */
object BenchScaleSketch {

  private def exec(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  private def drop(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 10× AND 100× legs by default (the BenchScaleAnalytics convention):
    // the 100× leg catches log factors and sketch-merge drift a 10× sweep
    // can hide. SPARK_GRAFT_SCALE_FACTOR still pins a single leg.
    val factors = sys.env.get("SPARK_GRAFT_SCALE_FACTOR").map(f => Seq(f.toInt))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "10,100")
        .split(",").map(_.trim.toInt).toSeq)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = GraftSession.get()
    try {
      val legs = factors.map { f =>
        // a leg that trips a gate still contributes its JSON (with the
        // violation recorded) — the artifact lands before any throw
        val (json, err) =
          try { val j = runLeg(spark, sfDir, f, reps); (j, None) }
          catch { case e: IllegalStateException =>
            (s""""x$f":{"factor":$f,"gate_error":${"\"" + e.getMessage.replace("\"", "'") + "\""}}""",
              Some(e))
          }
        (json, err)
      }
      val json =
        s"""{"metric":"scale_sweep_sketch","sf":"$sfDir","reps":$reps,""" +
          s""""factors":[${factors.mkString(",")}],""" +
          s""""legs":{${legs.map(_._1).mkString(",")}}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALE_sketch.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(json)
      legs.flatMap(_._2).headOption.foreach(throw _)
    } finally spark.stop()
  }

  /** One factor leg: exact-mode ×factor validity gates, sketch error
    * bounds at both scales, timings. Throws IllegalStateException on any
    * gate violation (caught by main, recorded in the artifact, re-thrown
    * after the write).
    */
  private def runLeg(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                     factor: Int, reps: Int): String = {
    val SHIFT = 1000000000L
    val scaledDir = SweepTmp.dir("graft_sweep_sketch")
    try {
      def shifted(name: String, keyCols: Seq[String]): Unit = {
        val t = Tables.table(spark, sfDir, name)
        val copies = (0 until factor).map { i =>
          keyCols.foldLeft(t)((df, k) => df.withColumn(k, col(k) + lit(i * SHIFT)))
        }.reduce(_ unionByName _)
        copies.write.mode("overwrite").parquet(s"$scaledDir/$name.parquet")
      }
      shifted("events", Seq("event_id", "user_id"))
      shifted("orders", Seq("o_orderkey", "o_custkey"))
      shifted("customer", Seq("c_custkey"))
      Tables.table(spark, sfDir, "nation").write.mode("overwrite")
        .parquet(s"$scaledDir/nation.parquet")

      val family = Seq("a2_product_stats", "a3_province_stats", "a8_percentiles")
        .map(n => n -> SparkEntry.queries(n))

      def sketched[A](body: => A): A = {
        operators.Scale.scaleMode(spark)
        try body finally operators.Scale.scaleMode(spark, on = false)
      }

      // fail-fast warmup, both dirs, both modes
      family.foreach { case (_, mk) =>
        exec(mk(spark, sfDir).limit(1)); exec(mk(spark, scaledDir).limit(1))
        sketched { exec(mk(spark, sfDir).limit(1)); exec(mk(spark, scaledDir).limit(1)) }
      }
      drop(spark)

      def timed(mk: => org.apache.spark.sql.DataFrame): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          exec(mk)
          val dt = (System.nanoTime() - t0) / 1e9
          drop(spark)
          dt
        }.min

      val times = family.map { case (name, mk) =>
        (name,
          timed(mk(spark, sfDir)), timed(mk(spark, scaledDir)),
          sketched(timed(mk(spark, sfDir))), sketched(timed(mk(spark, scaledDir))))
      }

      // ---- accuracy + exactness gates, off the timed path ---------------
      // NOTE: the collect() must happen INSIDE the `sketched` scope — the
      // rewrite rule reads the conf when the plan is optimized at action
      // time, so collecting a lazily-built frame after switching the mode
      // off would silently gate the exact plan against itself
      import org.apache.spark.sql.Row
      def rowsOf(dir: String, idx: Int, sketch: Boolean): Seq[Row] = {
        val mk = family(idx)._2
        if (sketch) sketched(mk(spark, dir).collect().toSeq)
        else mk(spark, dir).collect().toSeq
      }

      // a2: key (stt, edt, event_type) → (user_ct, amount, ct)
      def a2Map(dir: String, sketch: Boolean): Map[(String, String, String), (Long, Double, Long)] =
        rowsOf(dir, 0, sketch).map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          ((r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
      // a3: key (stt, edt, n_name) → (order_count, order_amount)
      def a3Map(dir: String, sketch: Boolean): Map[(String, String, String), (Long, Double)] =
        rowsOf(dir, 1, sketch).map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          ((r.getLong(3), r.getDouble(4)))).toMap
      // a8: event_type → (p50, p95, p99)
      def a8Map(dir: String, sketch: Boolean): Map[String, (Double, Double, Double)] =
        rowsOf(dir, 2, sketch).map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap

      def gate(ok: Boolean, what: String): Unit =
        if (!ok) throw new IllegalStateException(
          s"sketch sweep invalid: $what — artifact written but timings must not be cited")

      // corpus validity: exact-mode ×factor / invariance relations
      val a2b = a2Map(sfDir, sketch = false); val a2s = a2Map(scaledDir, sketch = false)
      gate(a2b.nonEmpty && a2s.keySet == a2b.keySet && a2b.forall { case (k, (u, a, c)) =>
        val (us, as_, cs) = a2s(k)
        us == factor * u && cs == factor * c && math.abs(as_ - factor * a) < 1e-4
      }, "a2 exact rows not exact ×factor multiples")
      val a3b = a3Map(sfDir, sketch = false); val a3s = a3Map(scaledDir, sketch = false)
      gate(a3b.nonEmpty && a3s.keySet == a3b.keySet && a3b.forall { case (k, (u, a)) =>
        a3s(k)._1 == factor * u && math.abs(a3s(k)._2 - factor * a) < 1e-4
      }, "a3 exact rows not exact ×factor multiples")
      // exact interpolated percentiles are only NEAR-invariant under
      // replication: the interpolation position is q·(n−1), so ×f
      // replication shifts it by O(1/n) of the local quantile density —
      // bound the drift at 2% relative, not bit-equality
      val a8b = a8Map(sfDir, sketch = false); val a8s = a8Map(scaledDir, sketch = false)
      def relClose(x: Double, y: Double): Boolean =
        math.abs(x - y) <= 0.02 * math.max(math.abs(x), math.abs(y)).max(1e-9)
      gate(a8b.nonEmpty && a8s.keySet == a8b.keySet && a8b.forall { case (k, (x, y, z)) =>
        val (xs, ys, zs) = a8s(k)
        relClose(x, xs) && relClose(y, ys) && relClose(z, zs)
      }, "a8 exact percentiles drifted > 2% under replication")

      // HLL error bounds at both scales + untouched-column equality
      def hllGates(dir: String, tag: String): Double = {
        val ex2 = a2Map(dir, sketch = false); val sk2 = a2Map(dir, sketch = true)
        gate(sk2.keySet == ex2.keySet, s"a2 $tag sketch row keys differ")
        val errs2 = ex2.map { case (k, (u, a, c)) =>
          val (us, as_, cs) = sk2(k)
          gate(as_ == a && cs == c, s"a2 $tag non-rewritten columns changed at $k")
          math.abs(us - u).toDouble / u.max(1L)
        }
        val ex3 = a3Map(dir, sketch = false); val sk3 = a3Map(dir, sketch = true)
        gate(sk3.keySet == ex3.keySet, s"a3 $tag sketch row keys differ")
        val errs3 = ex3.map { case (k, (u, a)) =>
          gate(sk3(k)._2 == a, s"a3 $tag non-rewritten columns changed at $k")
          math.abs(sk3(k)._1 - u).toDouble / u.max(1L)
        }
        val maxErr = (errs2 ++ errs3).max
        gate(maxErr <= 0.15, s"HLL $tag max relative error $maxErr > 0.15")
        maxErr
      }
      val hllErrBase = hllGates(sfDir, "base")
      val hllErrScaled = hllGates(scaledDir, "scaled")

      // t-digest rank error at both scales
      def rankErr(dir: String): Double = {
        val sk = a8Map(dir, sketch = true)
        val errs = sk.flatMap { case (et, (p50, p95, p99)) =>
          val vals = Tables.events(spark, dir).filter(col("event_type") === et)
            .agg(count(lit(1)).as("n"),
              sum(when(col("value") <= p50, 1L).otherwise(0L)).as("r50"),
              sum(when(col("value") <= p95, 1L).otherwise(0L)).as("r95"),
              sum(when(col("value") <= p99, 1L).otherwise(0L)).as("r99"))
            .collect()(0)
          val n = vals.getLong(0).toDouble
          Seq(math.abs(vals.getLong(1) / n - 0.50),
            math.abs(vals.getLong(2) / n - 0.95),
            math.abs(vals.getLong(3) / n - 0.99))
        }
        errs.max
      }
      val rankErrBase = rankErr(sfDir)
      val rankErrScaled = rankErr(scaledDir)

      gate(rankErrBase <= 0.05, s"t-digest base rank error $rankErrBase > 0.05")
      gate(rankErrScaled <= 0.05, s"t-digest scaled rank error $rankErrScaled > 0.05")

      // Per-op MEASURED verdict (round-10 verdict item 5): the swap rule is
      // measurement-backed like the dedup/fingerprint dispatchers, not an
      // assumed "sketches always win". "sketch" only when the sketch run is
      // >1.2× faster at the scaled point (outside same-plan noise);
      // "either" inside the band; "exact" when exact wins — the x100
      // recording showed a8's t-digest ~1.8× SLOWER than exact and a3's
      // HLL tying it, so the honest verdict is per-op and per-scale.
      def verdictOf(es: Double, ss: Double): String =
        if (ss * 1.2 < es) "sketch" else if (es * 1.2 < ss) "exact" else "either"
      val timesJson = times.map { case (n, eb, es, sb, ss) =>
        s""""$n":{"exact_base_sec":$eb,"exact_scaled_sec":$es,""" +
          s""""sketch_base_sec":$sb,"sketch_scaled_sec":$ss,""" +
          s""""recommended_mode":"${verdictOf(es, ss)}"}"""
      }.mkString(",")
      s""""x$factor":{"factor":$factor,"times":{$timesJson},""" +
        s""""hll_max_rel_err":{"base":$hllErrBase,"scaled":$hllErrScaled,"bound":0.15},""" +
        s""""tdigest_max_rank_err":{"base":$rankErrBase,"scaled":$rankErrScaled,"bound":0.05}}"""
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(scaledDir))
    }
  }
}
