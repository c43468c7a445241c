package graft

/** Round-9: the triangles closing-join shape at a representative SF —
  * is the 41M-row wedge table being exchanged/sorted against a 19 MB
  * edge set? Run: `sbt "Test/runMain graft.PlanDumpTriangles"`.
  */
object PlanDumpTriangles {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val df = SparkEntry.queries("graph_triangles")(spark, d)
    df.collect()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Sort") || l.contains("Aggregate") || l.contains("Scan"))
      .map(_.take(220)).mkString("\n"))
    spark.stop()
  }
}
