package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. A query that throws
  * is reported with value -1 and listed under "failed" — breakage must be
  * visible in the output, not folded into a plausible timing.
  */
object Bench {

  /** Execute a query's FULL physical plan. `df.count()` lets Catalyst
    * rewrite to `count(1)` over pruned columns, so projection-only queries
    * (fingerprints, token counts, simhash tables…) would time their parquet
    * scan and skip the expression work being benchmarked. `toRdd.count()`
    * runs the exact physical plan of the dataframe — every projection
    * evaluated, every row materialized — without collecting to the driver.
    */
  private def exec(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** Between-query isolation: localCheckpoint blocks from the finished
    * query otherwise linger until the async ContextCleaner notices the
    * GC'd RDDs, evicting storage memory DURING the next query's timed
    * window (the round-2 "4× regression on cheap queries" class).
    * Explicit blocking unpersist drains them deterministically, off the
    * clock.
    */
  private def dropCheckpointBlocks(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // Warmup (excluded from timings, see BASELINE.md): run a representative
    // query subset once against the SMALLEST available scale factor. The
    // plans are identical to the timed runs (same tables/schemas), so this
    // warms exactly the paths the timed pass uses — Catalyst rules, Janino
    // codegen cache, JIT — at near-zero data cost, JMH-style. Each timed
    // query still executes its full pipeline on the bench SF.
    val warmDir = {
      val small = new java.io.File(sfDir).getParent + "/sf0.001"
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    val warmQueries = Seq(
      "q1_pricing_summary", "q5_region_revenue", "j4_bounce_detect",
      "p8_explode_json", "a4_keyword_stats", "sql_keyword_lateral",
      "a1_visitor_stats", "a6_session_window", "text_ngram_freq",
      "dedup_minhash_lsh", "dedup_simhash_pairs", "dedup_ngram_jaccard",
      "dedup_ngram_prefix", "dedup_clusters", "dedup_embedding",
      "ann_brute_topk", "ann_lsh_topk", "text_fingerprints")
    warmQueries.foreach { q =>
      try { exec(SparkEntry.queries(q)(spark, warmDir)); () }
      catch { case _: Throwable => }
    }
    dropCheckpointBlocks(spark)
    // min of N timed passes per query (default 3, override
    // SPARK_GRAFT_BENCH_REPS): single-pass timings on this rig vary ±30%
    // run-to-run (GC pauses, CPU noise) — the minimum is the standard
    // JMH-style estimator of the query's actual cost
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    def timedReps(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[Double] =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { exec(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        dropCheckpointBlocks(spark) // untimed; see scaladoc
        if (ok) elapsed else -1.0
      }
    def timed(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val times = timedReps(name, fn)
      if (times.contains(-1.0)) -1.0 else times.min
    }
    // iteration counts of the clusterLabels convergence loop, snapshot
    // RIGHT AFTER each caller's reps (the counter is last-call state —
    // reading it once at the end would report whichever caller ran last;
    // round 8 added er_entities as a second caller and the end-read
    // silently recorded its graph's count under dedup_clusters)
    val clusterCallers = Set("dedup_clusters", "er_entities")
    val iterByQuery = scala.collection.mutable.LinkedHashMap[String, Int]()
    // local-iteration aid, NOT used by the driver: a comma-separated
    // SPARK_GRAFT_BENCH_ONLY restricts the timed registry so a single
    // query can be profiled in a fresh JVM (isolates it from the cache/GC
    // pressure of the other ~190 — the r07 q1 "2×" investigation)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val timedQueries = only match {
      case Some(names) => SparkEntry.queries.toSeq.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries.toSeq
    }
    val repResults = timedQueries.map { case (name, fn) =>
      val r = name -> timedReps(name, fn)
      if (clusterCallers(name))
        iterByQuery(name) = graft.pipeline.Dedup.lastClusterIterations
      r
    }
    val results = repResults.map { case (name, ts) =>
      name -> (if (ts.contains(-1.0)) -1.0 else ts.min)
    }
    // Scale-mode appendix: the documented 100 TB profile (README "Scale
    // mode") — sketch rewrites on — re-timing the queries whose plans the
    // rules change. Approximate results, so they are NOT the oracle-gated
    // numbers above; the appendix records the switch works and what it buys.
    val scaleQueries =
      if (only.isDefined) Seq.empty[String] // profiling mode: appendix off
      else Seq("a2_product_stats", "a3_province_stats", "a8_percentiles")
    graft.operators.Scale.scaleMode(spark) // the one-switch 100 TB profile
    val scaleResults = scaleQueries.map { name =>
      name -> timed(s"scale-mode $name", SparkEntry.queries(name))
    }
    graft.operators.Scale.scaleMode(spark, on = false)
    // Reporting contract (round-3 directive, tightened round 8): the driver
    // captures only the LAST 2000 chars of stdout — every round whose final
    // line exceeded that shipped "parsed": null (r01, r03–r07; only r02's
    // 60-query line ever parsed). Two channels make the signal safe:
    //  1. the full (unrounded, incl. scale-mode appendix, ALL queries) JSON
    //     is WRITTEN to `BENCH_FULL_<sf>.json` in the working directory —
    //     BASELINE.md is regenerated from this file, never from an unlogged
    //     run. The filename carries the scale factor because a shared name
    //     let the verify recipe's sf0.001 smoke run clobber the recorded
    //     sf0.1 artifact BASELINE.md cites (round-5 incident);
    //  2. the driver line is printed LAST and carries ONLY the 46-query
    //     headline set (the queries the round-1 driver recording timed, so
    //     cross-round shared-query ratios keep working) plus the all-query
    //     total/count — ~1.5 KB, inside the 2000-char tail window. The
    //     registry's other ~140 queries are still timed; their numbers
    //     live in the full file.
    def fmt(v: Double): String =
      if (v < 0) "-1" else java.lang.String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def toJson(rs: Iterable[(String, Double)], f: Double => String): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def repsJson(rs: Seq[(String, Seq[Double])], f: Double => String): String =
      rs.map { case (k, ts) => "\"" + k + "\":" + ts.map(f).mkString("[", ",", "]") }
        .mkString("{", ",", "}")
    // per-rep times for the iterative family and the full per-query map go
    // in the FULL file only — the driver line must stay under the 2000-char
    // tail window (see reporting contract above)
    val iterativeReps = repResults.filter { case (k, _) => clusterCallers(k) }
    val iterationsJson = iterByQuery
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // the 46 queries the round-1 driver recording timed: the stable
    // cross-round comparison set (extracted from BENCH_r01.json's tail)
    val headline = Set(
      "a4_keyword_stats", "p4_derived_cols", "dedup_minhash_lsh", "j4_bounce_detect",
      "text_token_counts", "dedup_simhash_pairs", "multimodal_decode", "text_fingerprints",
      "text_lang_id", "text_ngram_freq", "st1_is_new_fix", "p1_parse_clean",
      "dedup_simhash", "dedup_minhash_sig", "p6_conditional_measure", "dedup_exact",
      "a6_session_window", "a7_sliding_window", "text_quality_score", "dedup_embedding",
      "ann_lsh_topk", "ann_brute_topk", "a5_top_brands", "st2_daily_uv",
      "sql_keyword_lateral", "q5_region_revenue", "p8_explode_json", "dedup_ngram_jaccard",
      "j1_interval_join", "ann_ivf_topk", "a5_gmv_by_day", "dedup_corpus_clean",
      "u1_split_words", "p2_delete_filter", "multimodal_features", "a3_province_stats",
      "a2_product_stats", "j2_interval_join_asym", "j3_dim_enrich", "q3_top_revenue",
      "a1_visitor_stats", "sql_gmv_serving", "p3_column_prune", "q1_pricing_summary",
      "sp1_log_split", "sp2_config_router")
    val headlineResults = results.filter { case (k, _) => headline(k) }
    def line(rs: Iterable[(String, Double)], f: Double => String, appendix: String): String =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${toJson(rs, f)},""" +
        s""""queries_all":${results.size},"failed":$failed$appendix,"sf":"$sfDir"}"""
    val full = line(results, _.toString,
      s""","iterative":{"reps":${repsJson(iterativeReps, _.toString)},"iterations":$iterationsJson}""" +
        s""","scale_mode":${toJson(scaleResults, _.toString)},"reps":${repsJson(repResults, _.toString)}""")
    // profiling mode must NOT clobber the recorded full-registry artifact
    // with a filtered run (it did, once — git caught it)
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"BENCH_FULL_${new java.io.File(sfDir).getName}.json"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // nothing after this print: it must be the last stdout line, and it must
    // fit the driver's 2000-char tail capture whole
    // ONLY-mode profiles arbitrary queries, most outside the headline set —
    // print the actual isolated results, or the run is silent about them
    val driverLine = line(if (only.isDefined) results else headlineResults, fmt, "")
    require(driverLine.length < 1950,
      s"driver line ${driverLine.length} chars would be tail-truncated")
    println(driverLine)
  }
}
