package graft

object PlanDumpR8 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    Seq("profile_columns", "layout_zorder", "skew_salted_distinct",
      "mine_bitext", "er_blocked_pairs", "er_entities", "j8_bloom_semi").foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      df.collect() // let AQE finalize
      println(s"\n########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Window") || l.contains("Filter"))
        .map(_.take(200)).mkString("\n"))
    }
    spark.stop()
  }
}
