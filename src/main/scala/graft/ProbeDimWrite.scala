package graft

import org.apache.spark.sql.functions._

/** Scratch A/B probe for the dim-store staged-write floor (round-13
  * verdict item 4): times `DimStore.upsert`'s phases over a 20-batch
  * replay shaped like the warehouse leg's dim traffic (two tables,
  * ~hundreds of keys per batch, all 16 buckets touched), under the
  * variant selected by SPARK_GRAFT_DIMPROBE_VARIANT. Not an artifact
  * main — numbers land in BASELINE.md prose.
  */
object ProbeDimWrite {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val variant = sys.env.getOrElse("SPARK_GRAFT_DIMPROBE_VARIANT", "base")
    val nBatches = 20
    val phases = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[Double]]()
    val hook = (name: String, sec: Double) => {
      phases.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer()).append(sec); ()
    }
    val base = java.nio.file.Files.createTempDirectory("dimprobe").toString
    val store = new graft.sources.DimStore(spark, base, hook)
    (0 until nBatches).foreach { b =>
      Seq("user_info", "sku_info").foreach { t =>
        val rows = (0 until 400).map { i =>
          (b * 400L + i, b.toLong, s"v${b}_$i", s"w$i")
        }.toDF("k", "ts", "v", "w")
        store.upsert(t, rows, "k", "ts")
      }
    }
    def med(xs: Seq[Double]) = { val s = xs.sorted; if (s.isEmpty) 0.0 else s(s.size / 2) }
    println(s"[dimprobe] variant=$variant batches=$nBatches tables=2")
    phases.toSeq.sortBy(_._1).foreach { case (k, v) =>
      // drop the first batch (cold JVM/codegen) from the median
      println(f"[dimprobe] $k%-16s median=${med(v.drop(2).toSeq)}%.3f s  sum=${v.sum}%.2f s  n=${v.size}")
    }
    spark.stop()
  }
}
