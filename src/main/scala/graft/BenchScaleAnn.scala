package graft

import org.apache.spark.sql.functions._

/** ANN scale-sweep: the 10× corpus evidence for the blocked/quantized
  * search paths, recorded as a first-class artifact (the same contract as
  * `BenchScale` for the dedup joins — measured, written, enforced).
  *
  * Replicates the sf `embeddings` table `SPARK_GRAFT_SCALE_FACTOR` times
  * (default 10) with vec_ids shifted per replica and every element
  * perturbed by a deterministic per-(replica, position) offset large
  * enough that replicas are NOT each other's nearest neighbors — with a
  * tiny perturbation each query's top-k is just its own replicas, every
  * blocked method finds them in-bucket, and recall is vacuously 1. Times
  * brute / LSH / IVF / int8-quantized top-k at the scaled corpus, then
  * computes each approximate method's recall against the brute top-k ON
  * THE SAME scaled corpus. Writes `BENCH_SCALE_ann.json` and prints the
  * JSON as the last stdout line.
  *
  * Validity gates (after the artifact is written, like the dedup sweep):
  * quantized recall must stay ≥ 0.8 (int8 keeps ~2 decimal digits of
  * cosine — if the ranking collapses, the quantizer is broken, not
  * approximate) and the blocked methods must return non-empty results.
  */
object BenchScaleAnn {

  def enforce(quantRecall: Double, lshRows: Long, ivfRows: Long,
              pqRecall: Double = 1.0, ivfpqRows: Long = 1L): Unit = {
    if (quantRecall < 0.8)
      throw new IllegalStateException(
        s"quantized recall $quantRecall < 0.8: artifact written but the run is INVALID")
    if (lshRows == 0 || ivfRows == 0 || ivfpqRows == 0)
      throw new IllegalStateException(
        s"blocked method returned no rows (lsh=$lshRows, ivf=$ivfRows, " +
          s"ivfpq=$ivfpqRows): run INVALID")
    // 16 codes per 64-dim vector is lossy by design, but the ranking must
    // carry real signal: far above the k/N random floor (~1e-5 at 10×)
    if (pqRecall < 0.05)
      throw new IllegalStateException(
        s"PQ recall $pqRecall < 0.05 — codes carry no signal: run INVALID")
  }

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

    def scaledVecs = {
      val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      (0 until factor)
        .map { i =>
          e.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            transform(col("embedding"),
              (x, p) => x + lit(0.05f) * lit(i.toFloat) *
                (pmod(p * 7 + lit(i), lit(5)).cast("float") - lit(2.0f))).as("embedding"))
        }
        .reduce(_ union _)
    }

    // two query loads: at 10 queries the broadcast brute scan is hard to
    // beat (one pass, tiny probe side); the blocked methods' structural
    // win — each query touches nProbe/nCells of the corpus — shows under
    // query LOAD, so the artifact records both
    // JL two-stage: candidate depth = 2.5% of the scaled corpus — the
    // touch fraction is recorded and the recall gate is relative to it
    val baseCount = Tables.embeddings(spark, sfDir).count()
    val jlDepth = ((baseCount * factor) / 40).toInt.max(100)

    def variants(nq: Int): Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "brute" -> (() => pipeline.Similarity.bruteForceTopKFrom(scaledVecs, nQueries = nq)),
      "lsh"   -> (() => pipeline.Similarity.lshTopKFrom(scaledVecs, nQueries = nq)),
      "lsh_mp" -> (() => pipeline.Similarity.lshMultiProbeTopKFrom(scaledVecs, nQueries = nq)),
      "ivf"   -> (() => pipeline.Similarity.ivfTopKFrom(scaledVecs, nQueries = nq)),
      "quant" -> (() => pipeline.Similarity.quantTopKFrom(scaledVecs, nQueries = nq)),
      "pq"    -> (() => pipeline.Similarity.pqTopKFrom(scaledVecs, nQueries = nq)),
      "ivfpq" -> (() => pipeline.Similarity.ivfPqTopKFrom(scaledVecs, nQueries = nq)),
      "jl_rr" -> (() => pipeline.Similarity.jlRerankFrom(scaledVecs, nQueries = nq, depth = jlDepth)))

    // warm code paths once so JIT/codegen is off the clock
    variants(10).foreach { case (_, fn) =>
      try { exec(fn().limit(1)); () } catch { case _: Throwable => }
    }
    drop(spark)

    def timeAll(nq: Int) = variants(nq).map { case (name, fn) =>
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        exec(fn())
        val dt = (System.nanoTime() - t0) / 1e9
        drop(spark)
        dt
      }.min
      name -> t
    }
    val times = timeAll(10)
    val timesLoaded = timeAll(500)

    // recall vs brute on the SAME scaled corpus (off the clock)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairSet(pipeline.Similarity.bruteForceTopKFrom(scaledVecs))
    val recalls = Seq(
      "lsh"   -> pairSet(pipeline.Similarity.lshTopKFrom(scaledVecs)),
      "lsh_mp" -> pairSet(pipeline.Similarity.lshMultiProbeTopKFrom(scaledVecs)),
      "ivf"   -> pairSet(pipeline.Similarity.ivfTopKFrom(scaledVecs)),
      "quant" -> pairSet(pipeline.Similarity.quantTopKFrom(scaledVecs)),
      "pq"    -> pairSet(pipeline.Similarity.pqTopKFrom(scaledVecs)),
      "ivfpq" -> pairSet(pipeline.Similarity.ivfPqTopKFrom(scaledVecs)),
      "jl_rr" -> pairSet(pipeline.Similarity.jlRerankFrom(scaledVecs, depth = jlDepth)))
      .map { case (n, s) =>
        (n, (brute intersect s).size.toDouble / brute.size, s.size.toLong)
      }

    val json = {
      val ts = times.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val tl = timesLoaded.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val rc = recalls.map { case (k, r, _) => "\"" + k + "\":" + r }.mkString("{", ",", "}")
      s"""{"metric":"scale_sweep_ann","sf":"$sfDir","factor":$factor,"reps":$reps,""" +
        s""""times_sec_q10":$ts,"times_sec_q500":$tl,"recall_vs_brute":$rc,"brute_pairs":${brute.size},""" +
        s""""jl_depth":$jlDepth,"jl_touch":${jlDepth.toDouble / (baseCount * factor)}}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALE_ann.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
    enforce(recalls.collectFirst { case ("quant", r, _) => r }.get,
      recalls.collectFirst { case ("lsh", _, n) => n }.get,
      recalls.collectFirst { case ("ivf", _, n) => n }.get,
      recalls.collectFirst { case ("pq", r, _) => r }.get,
      recalls.collectFirst { case ("ivfpq", _, n) => n }.get)
    // JL rerank signal gate: recall must clearly beat its candidate-touch
    // fraction (a random depth-sized candidate set scores ~touch)
    val jlRecall = recalls.collectFirst { case ("jl_rr", r, _) => r }.get
    val jlTouch = jlDepth.toDouble / (baseCount * factor)
    if (jlRecall < (4 * jlTouch).max(0.2))
      throw new IllegalStateException(
        s"JL rerank recall $jlRecall carries no signal over touch $jlTouch: run INVALID")
  }
}
