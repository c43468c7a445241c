package graft

import org.apache.spark.sql.functions._

/** Scratch grid for the 100× IVF-PQ operating point (round-14: the tuned
  * depth-50 rerank recorded 0.40 recall at 100× vs 0.62 at 10× — the ADC
  * shortlist starves among 10× more distractors). Numbers land in the
  * BenchScaleAnn leg params + BASELINE.md prose.
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val f = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val vecs = BenchScaleAnn.scaledVecsFrom(spark, sfDir, f)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairSet(pipeline.Similarity.bruteForceTopKFrom(vecs))
    Seq((3, 50), (3, 100), (3, 200), (6, 100), (6, 200)).foreach { case (np, rd) =>
      val t0 = System.nanoTime()
      val s = pairSet(pipeline.Similarity.ivfPqTopKFrom(vecs,
        m = 32, nProbe = np, iters = 2, rerankDepth = rd))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probeann] f=$f nProbe=$np depth=$rd recall=${(brute intersect s).size.toDouble / brute.size}%.2f wall=$dt%.1f s")
    }
    spark.stop()
  }
}
