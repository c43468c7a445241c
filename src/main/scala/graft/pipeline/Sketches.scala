package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions.md5Prefix60

/** KMV (k-minimum-values, "bottom-k") distinct sketches — the third
  * sketch family next to HLL (plans/GraftExtensions) and CMS/Bloom
  * (TextPipeline/Dedup). Where HLL answers only |S|, the KMV sketch is a
  * SAMPLE of S's hash space, so sketches compose: union = bottom-k of
  * the merged hash sets, and Jaccard/intersection fall out of one
  * sketch-level set operation — the standard way to estimate cross-set
  * overlap at corpus scale without a user-level join.
  *
  * Engine rendering: hashes are 60-bit md5 prefixes (md5Prefix60 — the
  * same cross-engine-deterministic fingerprint the substr/winnow family
  * uses), the bottom-k per key is a rank over distinct hashes, and every
  * estimate divides exact longs in double at the very end, so DuckDB
  * replays the result bit-for-bit.
  *
  * Scale notes: the only corpus-sized stage is the DISTINCT over
  * (key, member) — one map-side-combinable shuffle; ranks then run over
  * ≤|keys|·k sketch rows. In an incremental pipeline the per-key bottom-k
  * set IS the persistable sketch (merge = union + re-rank), exactly how
  * the reference's HLL-style distinct aggregates persist per window.
  */
object Sketches {

  private val TWO60 = 1152921504606846976.0 // 2^60, exact in double

  /** Distinct (event_type, user hash) pairs — the sketch input. */
  private def userHashes(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"), md5Prefix60(col("user_id").cast("string")).as("h"))
      .distinct()

  /** KMV distinct-count estimate per event_type, next to the exact count
    * and the relative error — the accuracy-audit artifact a pipeline
    * records when deciding a sketch can replace an exact DISTINCT.
    * Estimator: (k-1)/U_k with U_k = h_k/2^60 for groups with ≥k distinct
    * hashes; smaller groups are exact by construction (the sketch holds
    * the whole set).
    */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val byType = Window.partitionBy("event_type").orderBy("h")
    val sk = userHashes(spark, dir)
      .withColumn("rn", row_number().over(byType))
    val exact = events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_ct"))
    sk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"), max(when(col("rn") === k, col("h"))).as("hk"))
      .join(exact, "event_type")
      .select(col("event_type"), col("exact_ct"),
        round(when(col("m") < k, col("m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(TWO60) / col("hk").cast("double")), 6)
          .as("kmv_est"))
      .withColumn("rel_err",
        round((col("kmv_est") - col("exact_ct").cast("double")) / col("exact_ct").cast("double"), 6))
  }

  /** Pairwise audience overlap between event types, estimated purely at
    * the SKETCH level: for each pair the k smallest hashes of the union
    * are scanned and the fraction present in both sides estimates
    * Jaccard — no user-level pair join anywhere. The exact Jaccard
    * (computed here only as the audit column) is the thing this replaces
    * at scale.
    */
  def kmvOverlap(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val byType = Window.partitionBy("event_type").orderBy("h")
    val sk = userHashes(spark, dir)
      .withColumn("rn", row_number().over(byType)).filter(col("rn") <= k)
      .select(col("event_type"), col("h"))

    val types = sk.select(col("event_type")).distinct()
    val pairs = types.select(col("event_type").as("et_a"))
      .join(types.select(col("event_type").as("et_b")), col("et_a") < col("et_b"))

    // union sketch rows, flagged by side membership
    val ua = pairs.join(sk.withColumnRenamed("event_type", "et_a"), "et_a")
      .select(col("et_a"), col("et_b"), col("h"), lit(1).as("ia"), lit(0).as("ib"))
    val ub = pairs.join(sk.withColumnRenamed("event_type", "et_b"), "et_b")
      .select(col("et_a"), col("et_b"), col("h"), lit(0).as("ia"), lit(1).as("ib"))
    val byPair = Window.partitionBy("et_a", "et_b").orderBy("h")
    val est = ua.unionByName(ub)
      .groupBy(col("et_a"), col("et_b"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .withColumn("rn", row_number().over(byPair)).filter(col("rn") <= k)
      .groupBy(col("et_a"), col("et_b"))
      .agg(count(lit(1)).as("uk"), sum(col("ia") * col("ib")).as("both"))
      // m < k distinct union hashes ⇒ the sketch holds the whole union: exact
      .select(col("et_a"), col("et_b"),
        round(col("both").cast("double") / col("uk").cast("double"), 6).as("jaccard_est"))

    // exact audit: per-user membership flags, one agg — no pair explosion
    val exact = events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .groupBy(col("user_id")).agg(collect_set(col("event_type")).as("ets"))
      .select(explode(expr(
        "flatten(transform(ets, a -> transform(filter(ets, b -> a < b), b -> struct(a AS xa, b AS xb))))"))
        .as("p"))
      .groupBy(col("p.xa").as("xa"), col("p.xb").as("xb"))
      .agg(count(lit(1)).as("inter_ct"))
    val sizes = events(spark, dir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("sz"))

    est
      .join(exact, col("et_a") === col("xa") && col("et_b") === col("xb"), "left_outer")
      .join(sizes.select(col("event_type").as("sa"), col("sz").as("sza")), col("et_a") === col("sa"))
      .join(sizes.select(col("event_type").as("sb"), col("sz").as("szb")), col("et_b") === col("sb"))
      .select(col("et_a"), col("et_b"), col("jaccard_est"),
        round(coalesce(col("inter_ct"), lit(0L)).cast("double") /
          (col("sza") + col("szb") - coalesce(col("inter_ct"), lit(0L))).cast("double"), 6)
          .as("jaccard_exact"))
  }
}
