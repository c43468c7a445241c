package graft

object PlanDumpNew {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val interesting = Seq("text_dsir_weight", "quantize_int8", "ann_quant_topk",
      "sample_cluster_balance", "text_quality_buckets", "text_chunks", "text_zipf_fit",
      "text_oov_rate")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      println(s"\n########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Sort") || l.contains("Window") ||
          l.contains("Generate") || l.contains("Filter"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
