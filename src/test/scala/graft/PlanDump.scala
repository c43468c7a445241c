package graft

/** Dev tool: dump executed plans for headline queries (not a test). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val interesting = Seq("j1_interval_join", "j2_interval_join_asym", "q3_top_revenue",
      "q5_region_revenue", "a3_province_stats", "dedup_ngram_jaccard", "st1_is_new_fix",
      "a2_product_stats")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      println(s"\n########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Sort") || l.contains("Window") ||
          l.contains("Filter"))
        .map(_.take(200)).mkString("\n"))
    }
    spark.stop()
  }
}
