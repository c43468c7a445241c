package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. A query that throws
  * is reported with value -1 and listed under "failed" — breakage must be
  * visible in the output, not folded into a plausible timing.
  */
object Bench {
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
      "dedup_clusters", "dedup_embedding", "ann_brute_topk", "ann_lsh_topk")
    warmQueries.foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => }
    }
    System.gc()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // between-query isolation (untimed): drop refs to the finished
      // query's localCheckpoint blocks so the ContextCleaner can release
      // storage memory before the next query, not during it
      System.gc()
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
