package graft

import org.apache.spark.sql.functions._

/** Scale-sweep for the blocked-ER family (`er_blocked_pairs` →
  * `er_entities` → `er_golden_records`) — after the triangles fix this is
  * the registry's heaviest family, and its cost model (within-block
  * Levenshtein fan-out + iterative label propagation + one survivorship
  * aggregate) deserves the same scaled evidence as the dedup joins: a
  * blocking key that silently stopped blocking would still pass the
  * sf0.01 oracle.
  *
  * Construction: f replicas of `customer` with BOTH c_custkey and
  * c_nationkey shifted per replica (names untouched). The ER ops block on
  * the nation key alone, so replica blocks are disjoint while every
  * within-replica name distance is bit-identical to the base — the
  * outputs MUST satisfy exact ×factor relations: the match-pair count and
  * its distance histogram, the entity-size histogram, and the
  * golden-record histogram over (n_members, n_segments, total_balance)
  * all scale by the factor. Entity IDS shift with the keys (min member
  * key), so gates compare replica-invariant histograms, never raw ids.
  *
  * Default legs are 10× and 100× (the brief's "survive a 100× scale-up"
  * bar): 100× of sf0.1 `customer` is 1.5M rows — in-RAM, so the only cost
  * is wall-clock.
  *
  * Each scaled input is WRITTEN AS PARQUET and read through the same
  * dir-based entry points as production. Artifact first, nonzero exit on
  * any gate violation (the `BenchScale` contract).
  *
  * Writes `BENCH_SCALE_er.json`; prints the JSON as the last line.
  */
object BenchScaleEr {

  private def exec(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  private def drop(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.get("SPARK_GRAFT_SCALE_FACTOR").map(f => Seq(f.toInt))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "10,100")
        .split(",").map(_.trim.toInt).toSeq)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = GraftSession.get()

    // the artifact is re-flushed after EVERY leg: a crash in a later leg
    // must not discard finished legs' timings (round-11 ADVICE)
    val legs = scala.collection.mutable.ArrayBuffer[(String, () => Unit)]()
    def flush(): String = {
      val json =
        s"""{"metric":"scale_sweep_er","sf":"$sfDir","reps":$reps,""" +
          s""""factors":[${factors.mkString(",")}],"legs_done":${legs.size},""" +
          s""""legs":{${legs.map(_._1).mkString(",")}}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SCALE_er.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      json
    }
    factors.foreach { f => legs += runLeg(spark, sfDir, f, reps); flush() }
    val json = flush()
    spark.stop()
    println(json)
    // uncaught throw after the print exits the JVM nonzero (BenchScale contract)
    legs.foreach(_._2.apply())
  }

  private def runLeg(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                     factor: Int, reps: Int): (String, () => Unit) = {
    val SHIFT = 1000000000L
    val scaledDir = SweepTmp.dir(s"graft_sweep_er_x$factor")
    val base = Tables.table(spark, sfDir, "customer")
    (0 until factor).map { i =>
      base.withColumn("c_custkey", col("c_custkey") + lit(i * SHIFT))
        .withColumn("c_nationkey", col("c_nationkey") + lit(i * 1000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scaledDir/customer.parquet")

    val family = Seq("er_blocked_pairs", "er_entities", "er_golden_records")
      .map(n => n -> SparkEntry.queries(n))

    family.foreach { case (_, mk) =>
      try { exec(mk(spark, sfDir).limit(1)); () } catch { case _: Throwable => }
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
      (name, timed(mk(spark, sfDir)), timed(mk(spark, scaledDir)))
    }

    // ---- exact ×factor gates over replica-invariant histograms ----------
    def hist(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Long] =
      df.collect().map { r =>
        (0 until r.length - 1).map(r.get) -> r.getLong(r.length - 1)
      }.toMap
    def exactMultiple(mkHist: String => org.apache.spark.sql.DataFrame): Boolean = {
      val b = hist(mkHist(sfDir))
      val s = hist(mkHist(scaledDir))
      b.nonEmpty && s.keySet == b.keySet &&
        b.forall { case (k, v) => s(k) == factor * v }
    }
    // match pairs: per-distance counts
    val pairsExact = exactMultiple(d =>
      SparkEntry.queries("er_blocked_pairs")(spark, d)
        .groupBy(col("dist")).agg(count(lit(1)).as("ct")))
    // entities: cluster-size histogram (sizes are replica-invariant)
    val entitiesExact = exactMultiple(d =>
      SparkEntry.queries("er_entities")(spark, d)
        .groupBy(col("entity_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("ct")))
    // golden records: full survivorship histogram — balances and segment
    // spans are identical per replica, so every cell must scale exactly
    val goldenExact = exactMultiple(d =>
      SparkEntry.queries("er_golden_records")(spark, d)
        .groupBy(col("n_members"), col("n_segments"),
          round(col("total_balance"), 2).as("bal"))
        .agg(count(lit(1)).as("ct")))

    val timesJson = times.map { case (n, b, s) =>
      s""""$n":{"base_sec":$b,"scaled_sec":$s}"""
    }.mkString(",")
    val legJson =
      s""""x$factor":{"factor":$factor,"times":{$timesJson},""" +
        s""""pairs_exact_multiple":$pairsExact,"entities_exact_multiple":$entitiesExact,""" +
        s""""golden_exact_multiple":$goldenExact}"""
    val enforce = () => {
      def gate(ok: Boolean, what: String): Unit =
        if (!ok) throw new IllegalStateException(
          s"ER sweep invalid at x$factor: $what — artifact written but timings " +
            "must not be cited")
      gate(pairsExact, "pair distance histogram not an exact multiple")
      gate(entitiesExact, "entity-size histogram not an exact multiple")
      gate(goldenExact, "golden-record histogram not an exact multiple")
    }
    (legJson, enforce)
  }
}
