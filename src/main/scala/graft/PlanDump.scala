package graft

/** Optimization-round evidence dumper: writes `explain("formatted")` for
  * registry queries to `<outDir>/<query>_<tag>.txt` (the judge checks plan
  * claims against these files; guide §1 "capture .explain for every
  * declared query").
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR     data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_PLAN_DIR   output dir (default plans/r14)
  *   SPARK_GRAFT_PLAN_TAG   filename suffix (default "before")
  *   SPARK_GRAFT_PLAN_ONLY  comma-separated query names (default: all)
  *
  * Plans are captured WITHOUT executing (initial AQE plan): join strategy,
  * PushedFilters/ReadSchema, Exchange placement and codegen spans are all
  * visible pre-execution; the AQE-final counters live in PLAN_AUDIT.json.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r14")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = only match {
      case Some(names) => SparkEntry.queries.toSeq.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    var failed = List.empty[String]
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      // queries that localCheckpoint during CONSTRUCTION leave blocks behind
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
    println(s"""{"metric":"plan_dump","dir":"$outDir","tag":"$tag","queries":${qs.size},"failed":${failed.size}}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
