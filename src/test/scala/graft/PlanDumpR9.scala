package graft

/** Round-7 session-2 additions: plan audit for the relational subquery
  * widening, path analytics, KMV sketches, triangles, and the index
  * builder. Run: `sbt "Test/runMain graft.PlanDumpR9"`.
  */
object PlanDumpR9 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    Seq("q11_top_value", "q13_order_dist", "q14_promo_share", "q15_top_supplier",
      "q2_min_cost_supp", "a20_path_transitions", "a21_path_topk",
      "a22_mad_outliers", "sketch_kmv_distinct", "sketch_kmv_overlap",
      "sample_bottomk", "graph_triangles", "index_postings",
      "mine_assoc_rules").foreach { name =>
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
