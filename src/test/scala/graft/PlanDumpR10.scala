package graft

/** Round-7 session-3 additions: plan audit for the remaining TPC-H-shape
  * relational queries (scan-bound q6, the q8/q9 join topologies, q12's
  * conditional counts, q16's distinct+anti, q19's pushed disjunction,
  * q20's stacked aggregates, q21's existence self-joins).
  * Run: `sbt "Test/runMain graft.PlanDumpR10"`.
  */
object PlanDumpR10 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    Seq("q6_forecast_revenue", "q8_market_share", "q9_product_profit",
      "q12_ship_lag", "q16_supplier_cnt", "q19_disjunctive_rev",
      "q20_excess_supp", "q21_waiting_supp").foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      df.collect() // let AQE finalize
      println(s"\n########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Window") || l.contains("Filter"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
