package graft

/** Whole-registry executed-plan audit: runs EVERY SparkEntry query at the
  * given SF and records per-query plan-health counters into
  * `PLAN_AUDIT.json` — the automated successor of the per-round manual
  * `PlanDump*` spot checks.
  *
  * Counters per query (from the AQE-final executed plan):
  *  - `exchanges`           shuffle exchanges (corpus reshuffle points)
  *  - `single_partition`    `Exchange SinglePartition` occurrences — the
  *                          scale smell WHEN its input is corpus-sized.
  *                          Benign occurrences exist by design: group-less
  *                          final aggregates (one row per partial),
  *                          bounded P-row offset windows
  *                          (`Scale.distributedPrefixSum`), TakeOrdered
  *                          final merges, 1-row scalar attaches — so this
  *                          column is a RECORD to diff across rounds, not
  *                          a zero-gate.
  *  - `cartesian`           `CartesianProduct` nodes — HARD-GATED to zero
  *                          registry-wide: every intentional small-side
  *                          cross join must plan as a BROADCAST nested
  *                          loop, never a shuffled cartesian.
  *  - `bnlj`                BroadcastNestedLoopJoin (the documented 1-row
  *                          / catalog-row scalar attaches)
  *  - `codegen_spans`       WholeStageCodegen regions
  *
  * The artifact is written BEFORE the gate throws, so a violating run
  * still ships its evidence (the BenchScale convention). Run with the
  * usual Spark-jars + classes classpath: `java -cp &lt;spark jars&gt;
  * graft.PlanAudit`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get()
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val counts =
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.toRdd.count() // execute so AQE finalizes
          // the AQE toString appends an "== Initial Plan ==" section that
          // would double-count every node: audit the FINAL plan only
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          def n(marker: String): Int =
            plan.sliding(marker.length).count(_ == marker)
          // whole-stage regions print as "*(k)" prefixes in tree mode —
          // count DISTINCT region ids, not occurrences
          val codegenIds = raw"\*\((\d+)\)".r.findAllMatchIn(plan)
            .map(_.group(1)).toSet.size
          Map(
            "exchanges" -> n("Exchange "),
            "single_partition" -> n("Exchange SinglePartition"),
            "cartesian" -> n("CartesianProduct"),
            "bnlj" -> n("BroadcastNestedLoopJoin"),
            "codegen_spans" -> codegenIds)
        } catch {
          case e: Throwable =>
            System.err.println(s"[audit] $name failed: ${e.getMessage}")
            Map("failed" -> 1)
        }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      name -> counts
    }
    val failed = rows.collect { case (n, c) if c.contains("failed") => n }
    val cartesianOffenders = rows.collect {
      case (n, c) if c.getOrElse("cartesian", 0) > 0 => n
    }
    val spTotal = rows.map(_._2.getOrElse("single_partition", 0)).sum
    def js(m: Map[String, Int]) =
      m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"plan_audit","sf":"$sfDir","queries":${rows.size},""" +
        s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""cartesian_offenders":${cartesianOffenders.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""single_partition_total":$spTotal,""" +
        s""""per_query":${rows.map { case (k, v) => "\"" + k + "\":" + js(v) }.mkString("{", ",", "}")}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("PLAN_AUDIT.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(s"""{"metric":"plan_audit","queries":${rows.size},"failed":${failed.size},""" +
      s""""cartesian_offenders":${cartesianOffenders.size},"single_partition_total":$spTotal}""")
    if (failed.nonEmpty)
      throw new IllegalStateException(s"plan audit: ${failed.size} queries failed: $failed")
    if (cartesianOffenders.nonEmpty)
      throw new IllegalStateException(
        s"plan audit: CartesianProduct in ${cartesianOffenders.mkString(", ")} — " +
          "every cross join must broadcast")
  }
}
