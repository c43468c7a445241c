package graft

/** Round-8 session-2 additions: plan audit for the passage dedup /
  * threshold-kNN / collocations / golden-record / lateness / decay /
  * hashed-features / contrastive operators.
  * Run: `sbt "Test/runMain graft.PlanDumpR11"`.
  */
object PlanDumpR11 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    Seq("dedup_passage_strip", "dedup_jaccard_knn", "text_collocations",
      "er_golden_records", "multimodal_ppm_resize", "a25_lateness_profile",
      "a26_value_decay", "text_hashed_features", "text_langid_eval",
      "mine_contrastive").foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      df.collect() // let AQE finalize
      println(s"\n########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Window") || l.contains("Filter") ||
          l.contains("TakeOrdered"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
