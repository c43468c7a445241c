package graft

import org.apache.spark.sql.functions._

/** Scale-sweep for the perceptual-fingerprint near-dup family
  * (`multimodal_phash_pairs` / `multimodal_afp_pairs`): the 10× evidence
  * that the byte-block candidate join scales with the number of genuine
  * collisions, not with corpus², when duplication structure is held
  * fixed.
  *
  * Construction: replica `i` shifts doc ids by `i·SHIFT` with SHIFT a
  * multiple of the variant-group width 5, so every replica reproduces the
  * base corpus's GROUP structure while its base-image/clip ids (and
  * therefore hashes) differ per replica. Two enforced gates:
  *
  *  1. copy-0 identity — the scaled output restricted to ids < SHIFT
  *     must equal the base output EXACTLY (replication may not perturb
  *     the work it contains);
  *  2. per-replica recall — every replica must recover planted pairs
  *     (a replica with zero within-group pairs means hashing broke under
  *     id shifting).
  *
  * Cross-replica pairs are legitimate (different bases can collide
  * within the Hamming radius) and are RECORDED, not gated. Artifact
  * `BENCH_SCALE_fingerprint.json` is written before the gates throw, so
  * an invalid run's numbers cannot be silently cited.
  */
object BenchScaleFingerprint {

  private val Shift = 10000000L // multiple of 5: groups never straddle replicas

  def enforceCopy0(base: Set[(Long, Long, Long)], copy0: Set[(Long, Long, Long)]): Unit =
    if (base.isEmpty || base != copy0)
      throw new IllegalStateException(
        s"fingerprint sweep invalid: copy-0 pairs (${copy0.size}) != base pairs " +
          s"(${base.size}) — replication perturbed the contained work")

  def enforceReplicaRecall(pairs: Seq[(Long, Long, Long)], factor: Int): Unit = {
    // same replica AND same planted variant group (width-5 id blocks,
    // Shift % 5 == 0 so p/5 identifies the group globally): a
    // within-replica cross-group false positive must not satisfy the
    // planted-pair gate
    val byReplica = pairs.filter(p => p._1 / Shift == p._2 / Shift && p._1 / 5 == p._2 / 5)
      .groupBy(_._1 / Shift).view.mapValues(_.size).toMap
    val empty = (0 until factor).filterNot(i => byReplica.getOrElse(i.toLong, 0) > 0)
    if (empty.nonEmpty)
      throw new IllegalStateException(
        s"fingerprint sweep invalid: replicas $empty recovered no planted pairs")
  }

  private def drop(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = GraftSession.get()

    def ids(n: Int) = (0 until n).map(i =>
        Tables.documents(spark, sfDir)
          .select((col("doc_id") + lit(i.toLong * Shift)).as("doc_id")))
      .reduce(_ union _)

    def collect(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // warm codegen off the clock
    collect(pipeline.Multimodal.phashPairsFrom(ids(1).limit(50)))
    drop(spark)

    def timed(mk: => org.apache.spark.sql.DataFrame): (Double, Seq[(Long, Long, Long)]) = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = collect(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        drop(spark)
        (dt, rows)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    val (phB, phBase) = timed(pipeline.Multimodal.phashPairsFrom(ids(1)))
    val (phS, phScaled) = timed(pipeline.Multimodal.phashPairsFrom(ids(factor)))
    val (afB, afBase) = timed(pipeline.Multimodal.afpPairsFrom(ids(1)))
    val (afS, afScaled) = timed(pipeline.Multimodal.afpPairsFrom(ids(factor)))
    // the multi-index scale forms: 16-bit substrings, tighter radius
    val (pmB, pmBase) = timed(pipeline.Multimodal.phashPairsFrom(ids(1), 3, 16))
    val (pmS, pmScaled) = timed(pipeline.Multimodal.phashPairsFrom(ids(factor), 3, 16))
    val (amB, amBase) = timed(pipeline.Multimodal.afpPairsFrom(ids(1), 1, 16))
    val (amS, amScaled) = timed(pipeline.Multimodal.afpPairsFrom(ids(factor), 1, 16))
    // probed-MIH: SAME radius as the byte-block forms (1-bit probe
    // expansion keeps pigeonhole recall exact) — the scale-path twin the
    // adaptive dispatcher routes to, gated pair-set EQUAL below.
    // 1× probed legs feed the toy-scale tripwire (the round-10 verdict's
    // dispatcher-overhead finding).
    val (ppB, _) = timed(pipeline.Multimodal.phashPairsProbedFrom(ids(1)))
    val (ppS, ppScaled) = timed(pipeline.Multimodal.phashPairsProbedFrom(ids(factor)))
    val (apB, _) = timed(pipeline.Multimodal.afpPairsProbedFrom(ids(1)))
    val (apS, apScaled) = timed(pipeline.Multimodal.afpPairsProbedFrom(ids(factor)))
    // the dispatcher at BOTH operating points: estimates/routes are
    // snapshotted IMMEDIATELY after each timed run (any later builder call
    // could overwrite the @volatile observability vars). At 1× (5k docs at
    // sf0.1, below dispatchMinDocs) the dispatcher must short-circuit —
    // its whole-query wall is gated against the fixed probed route below.
    val (padB, _) = timed(pipeline.Multimodal.phashPairsAdaptiveFrom(ids(1)))
    val phRouteB = pipeline.Multimodal.lastFingerprintRoute
    val phShortB = pipeline.Multimodal.lastFingerprintShortCircuit
    val (padS, _) = timed(pipeline.Multimodal.phashPairsAdaptiveFrom(ids(factor)))
    val phRoute = pipeline.Multimodal.lastFingerprintRoute
    val (phByteCost, phMihCost) = pipeline.Multimodal.lastFingerprintEstimates
    val (aadB, _) = timed(pipeline.Multimodal.afpPairsAdaptiveFrom(ids(1)))
    val afRouteB = pipeline.Multimodal.lastFingerprintRoute
    val afShortB = pipeline.Multimodal.lastFingerprintShortCircuit
    val (aadS, _) = timed(pipeline.Multimodal.afpPairsAdaptiveFrom(ids(factor)))
    val afRoute = pipeline.Multimodal.lastFingerprintRoute
    val (afByteCost, afMihCost) = pipeline.Multimodal.lastFingerprintEstimates

    def cross(ps: Seq[(Long, Long, Long)]) = ps.count(p => p._1 / Shift != p._2 / Shift)
    def leg(n: String, b: Double, s: Double, bp: Seq[(Long, Long, Long)],
            sp: Seq[(Long, Long, Long)]) =
      s""""$n":{"base_sec":$b,"scaled_sec":$s,"base_pairs":${bp.size},""" +
        s""""scaled_pairs":${sp.size},"cross_replica":${cross(sp)}}"""
    val json =
      s"""{"metric":"scale_sweep_fingerprint","sf":"$sfDir","factor":$factor,"reps":$reps,""" +
        leg("phash", phB, phS, phBase, phScaled) + "," +
        leg("afp", afB, afS, afBase, afScaled) + "," +
        leg("phash_mih", pmB, pmS, pmBase, pmScaled) + "," +
        leg("afp_mih", amB, amS, amBase, amScaled) + "," +
        s""""phash_probed":{"base_sec":$ppB,"scaled_sec":$ppS,"scaled_pairs":${ppScaled.size}},""" +
        s""""afp_probed":{"base_sec":$apB,"scaled_sec":$apS,"scaled_pairs":${apScaled.size}},""" +
        s""""phash_adaptive":{"base_sec":$padB,"base_route":"$phRouteB","base_short_circuit":$phShortB,""" +
        s""""scaled_sec":$padS,"route":"$phRoute",""" +
        s""""est_cost":{"byte_block":$phByteCost,"mih_probed":$phMihCost}},""" +
        s""""afp_adaptive":{"base_sec":$aadB,"base_route":"$afRouteB","base_short_circuit":$afShortB,""" +
        s""""scaled_sec":$aadS,"route":"$afRoute",""" +
        s""""est_cost":{"byte_block":$afByteCost,"mih_probed":$afMihCost}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALE_fingerprint.json"),
      json.getBytes("UTF-8"))
    println(json)

    enforceCopy0(phBase.toSet, phScaled.filter(p => p._1 < Shift && p._2 < Shift).toSet)
    enforceCopy0(afBase.toSet, afScaled.filter(p => p._1 < Shift && p._2 < Shift).toSet)
    enforceCopy0(pmBase.toSet, pmScaled.filter(p => p._1 < Shift && p._2 < Shift).toSet)
    enforceCopy0(amBase.toSet, amScaled.filter(p => p._1 < Shift && p._2 < Shift).toSet)
    enforceReplicaRecall(phScaled, factor)
    enforceReplicaRecall(afScaled, factor)
    enforceReplicaRecall(pmScaled, factor)
    enforceReplicaRecall(amScaled, factor)
    // radius containment: the scale form may never invent a pair the
    // high-recall form lacks (mih ⊆ byte-block at the wider radius)
    if (!pmScaled.map(p => (p._1, p._2)).toSet.subsetOf(phScaled.map(p => (p._1, p._2)).toSet))
      throw new IllegalStateException("fingerprint sweep invalid: phash_mih ⊄ phash")
    if (!amScaled.map(p => (p._1, p._2)).toSet.subsetOf(afScaled.map(p => (p._1, p._2)).toSet))
      throw new IllegalStateException("fingerprint sweep invalid: afp_mih ⊄ afp")
    // and the scale form must actually be cheaper at 10× — that's its job
    if (pmS >= phS || amS >= afS)
      throw new IllegalStateException(
        s"fingerprint sweep invalid: mih not faster at ${factor}× (phash $pmS vs $phS, afp $amS vs $afS)")
    // probed-MIH is a same-radius rendering: its pair set must EQUAL the
    // byte-block one (not just ⊆ like the tighter-radius mih forms)
    if (ppScaled.map(p => (p._1, p._2)).toSet != phScaled.map(p => (p._1, p._2)).toSet)
      throw new IllegalStateException("fingerprint sweep invalid: phash_probed != phash")
    if (apScaled.map(p => (p._1, p._2)).toSet != afScaled.map(p => (p._1, p._2)).toSet)
      throw new IllegalStateException("fingerprint sweep invalid: afp_probed != afp")
    // dispatcher tripwire (the ngram_adaptive discipline): the chosen route
    // must not measure ≥2× slower than the alternative at this operating
    // point — reps=1 same-plan noise reaches ~1.5×, so 2× is the bound
    // that flags a broken cost model rather than rig weather
    def routeGate(name: String, route: String, tByte: Double, tProbed: Double): Unit = {
      val ok = route match {
        case "mih_probed" => tProbed <= 2.0 * tByte
        case _            => tByte <= 2.0 * tProbed
      }
      if (!ok)
        throw new IllegalStateException(
          s"fingerprint sweep invalid: $name adaptive routed '$route' against a ≥2× " +
            s"faster alternative (byte_block $tByte s, mih_probed $tProbed s)")
    }
    routeGate("phash", phRoute, phS, ppS)
    routeGate("afp", afRoute, afS, apS)
    // toy-scale tripwire (round-10 verdict): at 1× the dispatcher must
    // short-circuit — no estimation aggregates — and its whole-query wall
    // must stay within 2× of the BETTER fixed route (same-plan noise bound;
    // the pre-fix overhead measured 1.6–2×, the short-circuit targets
    // ≤1.2×). Applies only when the 1× corpus actually sits below the
    // configured dispatchMinDocs: pointed at a ≥20k-doc corpus the adaptive
    // 1× call legitimately takes the estimation path (round-11 ADVICE), so
    // the gate is skipped and the artifact's recorded route stands alone.
    val baseDocs = Tables.documents(spark, sfDir).count()
    val minDocs = spark.conf
      .getOption("spark.graft.fingerprint.dispatchMinDocs").map(_.toLong).getOrElse(20000L)
    def overheadGate(name: String, short: Boolean, tAdaptive: Double,
                     tByte: Double, tProbed: Double): Unit = {
      if (baseDocs >= minDocs) return
      if (!short)
        throw new IllegalStateException(
          s"fingerprint sweep invalid: $name adaptive did not short-circuit at 1× " +
            s"(corpus $baseDocs docs < dispatchMinDocs $minDocs must skip estimation)")
      val best = math.min(tByte, tProbed)
      if (tAdaptive > 2.0 * best)
        throw new IllegalStateException(
          s"fingerprint sweep invalid: $name adaptive 1× wall $tAdaptive s > 2× the " +
            s"better fixed route ($best s) — dispatcher overhead regressed")
    }
    overheadGate("phash", phShortB, padB, phB, ppB)
    overheadGate("afp", afShortB, aadB, afB, apB)
  }
}
