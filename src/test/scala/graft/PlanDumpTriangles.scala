package graft

/** Round-9: executed-plan skeleton dump for heavy queries — born from the
  * triangles 3×-enumeration find (the per-corner unionAll planned three
  * independent join branches). Run:
  * `sbt "Test/runMain graft.PlanDumpTriangles [query ...]"`; defaults to
  * the round-9 heavy list. SPARK_GRAFT_SF_DIR picks the input (default
  * sf0.01).
  */
object PlanDumpTriangles {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("graph_triangles")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      println(s"\n########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Sort") || l.contains("Aggregate") || l.contains("Scan") ||
          l.contains("Window") || l.contains("Generate"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
