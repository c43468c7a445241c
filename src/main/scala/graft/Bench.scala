package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. A query that throws
  * is reported with value -1 and listed under "failed" — breakage must be
  * visible in the output, not folded into a plausible timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // warmup (excluded from timings, see BASELINE.md): exercise the shared
    // execution infrastructure once — scan, shuffle, window, broadcast
    // join, explode, and the graft_* kernel codegen — so the first measured
    // query doesn't absorb JVM/session/codegen-framework initialization.
    // Only framework paths are warmed; each query still pays its own
    // plan + codegen on its measured run.
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
      val toks = docs.select(col("doc_id"), col("source"),
        split(lower(col("text")), "\\s+").as("toks"))
      toks.select(col("doc_id"), explode(col("toks")).as("w"))
        .groupBy("w").count()
        .withColumn("r", row_number().over(Window.partitionBy(lit(1)).orderBy(col("count").desc)))
        .join(broadcast(docs.select(col("doc_id"))), col("r") === col("doc_id"))
        .count()
      spark.sql(
        """SELECT graft_minhash(graft_shingles(graft_hash_tokens(array('a','b','c','d')))),
          |graft_simhash32(graft_hash_tokens(array('a','b'))),
          |graft_dot(array(1.0D), array(2.0D)), graft_norm(array(CAST(1.0 AS FLOAT)))
          |""".stripMargin).count()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
