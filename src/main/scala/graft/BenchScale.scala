package graft

import org.apache.spark.sql.functions._

/** Scale-sweep benchmark: the 10× corpus evidence for the prefix-filtered
  * dedup joins, recorded as a first-class artifact instead of prose.
  *
  * Replicates the sf `documents` table `SPARK_GRAFT_SCALE_FACTOR` times
  * (default 10 → ~50k docs at sf0.1) with doc_ids shifted per replica —
  * same construction as the round-3 one-off smoke — then times the
  * prefix-filtered joins against their exhaustive twins and asserts the
  * output pair sets are IDENTICAL (count + two-way `except`). Writes
  * `BENCH_SCALE.json` to the working directory and prints the same JSON
  * as the last stdout line.
  *
  * Why this exists: the exhaustive joins are the documented winners at toy
  * SF, the prefix joins at corpus scale. sf0.1 sits near the crossover, so
  * a single-SF number cannot show the design property that matters at
  * 100 TB — sub-quadratic candidate growth. This sweep does.
  */
object BenchScale {

  /** The sweep's validity gate: a speedup is only evidence if the prefix
    * and exhaustive plans produced IDENTICAL pair sets. Called after the
    * artifact is written so a diverging run still leaves its (flagged)
    * record on disk — but the process exits nonzero, so the numbers cannot
    * be cited from a run that silently passed.
    */
  def enforcePairEquality(jaccardEqual: Boolean, containEqual: Boolean): Unit =
    if (!jaccardEqual || !containEqual)
      throw new IllegalStateException(
        s"prefix/exhaustive pair sets diverge (jaccard_pairs_equal=$jaccardEqual, " +
          s"containment_pairs_equal=$containEqual): artifact written but the run is " +
          "INVALID — its speedups must not be cited")

  private def exec(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  private def drop(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = GraftSession.get()
    // the sweep measures the prefix MACHINERY: disable the toy-scale
    // crossover so the prefix path never silently re-routes to the
    // exhaustive plan it is being compared against
    spark.conf.set(operators.Scale.PrefixCrossoverConf, "0")

    // Two scaling regimes, SPARK_GRAFT_SCALE_REGIME:
    //  - "linear" (default): each replica gets its own source suffix, so
    //    the corpus grows 10× while BLOCK sizes stay fixed — the realistic
    //    ingest model (new sources arrive over time; qualifying pairs grow
    //    linearly).
    //  - "quadratic": replicas share the original sources, so every block
    //    grows 10× and the qualifying pair set grows ~100× — the worst-case
    //    block-blowup stress.
    // Replica doc_ids shifted far past any real id in both regimes.
    val regime = sys.env.getOrElse("SPARK_GRAFT_SCALE_REGIME", "linear")
    def scaledDocs = {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"), col("text"))
      (0 until factor)
        .map { i =>
          val src = if (regime == "quadratic") col("source")
            else concat(col("source"), lit(s"_r$i"))
          docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            src.as("source"), col("text"))
        }
        .reduce(_ union _)
    }

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ngram_prefix"        -> (() => pipeline.Dedup.ngramJaccardPrefixFrom(scaledDocs)),
      "ngram_exhaustive"    -> (() => pipeline.Dedup.ngramJaccardExhaustiveFrom(scaledDocs)),
      // the dispatcher should pick prefix under linear blocks and
      // exhaustive under quadratic blowup — gated below, not assumed
      "ngram_adaptive"      -> (() => pipeline.Dedup.ngramJaccardAdaptiveFrom(scaledDocs)),
      "containment_prefix"  -> (() => pipeline.Dedup.bagOverlapPrefixFrom(scaledDocs)),
      "containment_exhaustive" -> (() => pipeline.Dedup.bagOverlapFrom(scaledDocs)))

    // warm the code paths once at base scale so JIT/codegen is off the clock
    variants.foreach { case (_, fn) =>
      try { exec(fn().limit(1)); () } catch { case _: Throwable => }
    }
    drop(spark)

    // snapshot the dispatcher's decision IMMEDIATELY after its timed run:
    // the equality phase below re-runs the prefix/exhaustive builders, and
    // reading the @volatile vars at gate time would record whatever the
    // LAST builder call left there, not what the timed adaptive run chose
    var adaptiveRoute = ""
    var adaptiveEst = (0.0, 0.0)
    val times = variants.map { case (name, fn) =>
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        exec(fn())
        val dt = (System.nanoTime() - t0) / 1e9
        drop(spark)
        dt
      }.min
      if (name == "ngram_adaptive") {
        adaptiveRoute = pipeline.Dedup.lastAdaptiveRoute
        adaptiveEst = pipeline.Dedup.lastAdaptiveEstimates
      }
      name -> t
    }

    // pair-set equality prefix vs exhaustive, both families: the speedup is
    // only evidence if the outputs are the same set. One family at a time,
    // blocks released between, so the four pair sets (and their lineage
    // checkpoints) are never all pinned at once.
    // DISK_ONLY, not localCheckpoint: the quadratic-regime pair sets run to
    // ~20M rows × two families, and pinning them deserialized on a default
    // 8g driver heap OOMs the equality phase (observed). The equality
    // checks are off the clock, so disk-backed materialization costs
    // nothing that matters and keeps the sweep runnable at any regime.
    def pairs(df: org.apache.spark.sql.DataFrame) = {
      val p = df.select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      p.count() // materialize once; both excepts below read the disk copy
      p
    }
    def family(prefix: => org.apache.spark.sql.DataFrame,
               exhaustive: => org.apache.spark.sql.DataFrame): (Long, Boolean) = {
      val p = pairs(prefix)
      val e = pairs(exhaustive)
      val n = e.count()
      val eq = p.count() == n && p.except(e).isEmpty && e.except(p).isEmpty
      p.unpersist(blocking = true)
      e.unpersist(blocking = true)
      drop(spark)
      (n, eq)
    }
    val (jaccardPairs, jaccardEqual) = family(
      pipeline.Dedup.ngramJaccardPrefixFrom(scaledDocs),
      pipeline.Dedup.ngramJaccardExhaustiveFrom(scaledDocs))
    val (containPairs, containEqual) = family(
      pipeline.Dedup.bagOverlapPrefixFrom(scaledDocs),
      pipeline.Dedup.bagOverlapFrom(scaledDocs))

    val (adExh, adPre) = adaptiveEst
    // dispatcher tripwire: the route was chosen from candidate-volume
    // estimates BEFORE timing — fail only when the choice measured ≥2×
    // slower than the alternative (reps=1 same-plan noise alone reaches
    // ~1.5×, so a tighter bound would gate on rig weather; a cost model
    // whose verdict inverts a 2× reality is broken, not unlucky).
    // History note: the round-5 "quadratic regime → exhaustive wins"
    // crossover no longer exists — the in-row vocab prefix slice and the
    // skinny candidate join have made prefix the measured winner in BOTH
    // regimes — so the gate checks the measurement, not a remembered map.
    // "exhaustive_toy" (corpus below the prefix crossover, estimates never
    // computed) has no alternative measurement to compare against: record
    // the route verbatim, skip the gate.
    val tPrefix = times.toMap.apply("ngram_prefix")
    val tExhaustive = times.toMap.apply("ngram_exhaustive")
    val routeOk = adaptiveRoute match {
      case "exhaustive_toy" => true
      case "prefix"         => tPrefix <= 2.0 * tExhaustive
      case _                => tExhaustive <= 2.0 * tPrefix
    }
    val (tChosen, tOther) =
      if (adaptiveRoute == "prefix") (tPrefix, tExhaustive) else (tExhaustive, tPrefix)
    val json = {
      val ts = times.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      s"""{"metric":"scale_sweep","regime":"$regime","sf":"$sfDir","factor":$factor,"reps":$reps,""" +
        s""""times_sec":$ts,"jaccard_pairs":$jaccardPairs,"containment_pairs":$containPairs,""" +
        s""""jaccard_pairs_equal":$jaccardEqual,"containment_pairs_equal":$containEqual,""" +
        s""""adaptive_route":"$adaptiveRoute","adaptive_est_pairs":{"exhaustive":$adExh,"prefix":$adPre},""" +
        s""""adaptive_route_within_2x":$routeOk}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"BENCH_SCALE_$regime.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
    // after the print (driver tail-capture still sees the record): an
    // uncaught throw here exits the JVM nonzero
    enforcePairEquality(jaccardEqual, containEqual)
    if (!routeOk)
      throw new IllegalStateException(
        s"adaptive dispatcher routed '$adaptiveRoute' ($tChosen s) against a ≥2× " +
          s"faster alternative ($tOther s) in the $regime regime: the candidate " +
          "estimates are mis-modeling the corpus — artifact written but INVALID")
  }
}
