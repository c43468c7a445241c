package graft

object PlanDumpR7 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    Seq("retrieval_bm25", "retrieval_hybrid_rrf", "ann_ivfpq_topk").foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      println(s"\n########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Window"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
