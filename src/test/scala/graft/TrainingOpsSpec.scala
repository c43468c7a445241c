package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextPipeline}

/** Round-2 training-data operators: clustering, contamination, repetition,
  * stratified sampling.
  */
class TrainingOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = sf("documents")

  test("corpus clusters: pair endpoints co-labeled, min-id labels, singletons self-labeled") {
    val labels = Dedup.corpusClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashLsh(spark, dir).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    // every near-dup pair lands in one component
    pairs.foreach { case (a, b) => assert(labels(a) == labels(b)) }
    // labels are component minima: never above the member id, and the label
    // doc is its own label
    labels.foreach { case (id, lab) =>
      assert(lab <= id)
      assert(labels(lab) == lab)
    }
    // docs outside the pair graph keep their own id
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.filterNot(kv => inPairs(kv._1)).foreach { case (id, lab) => assert(lab == id) }
  }

  test("contamination: flagged docs verifiably share a 5-gram with the benchmark set") {
    val flagged = Dedup.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force recompute on the driver for the small test corpus
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
    def grams(t: String): Set[String] = {
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (ws.length < 5) Set.empty
      else ws.sliding(5).map(_.mkString(" ")).toSet
    }
    val bench = docs.filter(_._1 < 50).flatMap(d => grams(d._2)).toSet
    val expect = docs.filter(_._1 >= 50)
      .map(d => d._1 -> grams(d._2).count(bench))
      .filter(_._2 > 0).toMap
    assert(flagged == expect.map { case (k, v) => k -> v.toLong })
  }

  test("repetition score: degenerate text scores high, clean text zero") {
    val df = Seq((1L, "spam spam spam spam spam spam"), (2L, "all words here are unique"), (3L, "x"))
      .toDF("doc_id", "text")
    // same column pipeline as repetitionScore, applied to a local frame
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val bg = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val out = df.select(col("doc_id"),
        when(size(bg) > 0, round(lit(1.0) - size(array_distinct(bg)).cast("double") /
          size(bg).cast("double"), 6)).otherwise(0.0).as("dup_frac"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.8)  // 5 bigrams, 1 distinct
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0)  // no bigrams
    // and the table-level op runs end to end
    assert(TextPipeline.repetitionScore(spark, dir).count() > 0)
  }

  test("pii redaction: no pattern survives, counts reconcile, clean docs untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jane.doe+spam@example.com or 5551234567 now"),
      (2L, "order 123456 and 99999 are short, 1234567890123 is not"),
      (3L, "clean text with no pii at all"))
      .toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val tmp = java.nio.file.Files.createTempDirectory("pii").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextPipeline.piiRedact(spark, tmp)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // nothing matching the patterns survives in clean_text
    out.foreach { case (_, clean, _, _) =>
      assert(!clean.matches(s".*${TextPipeline.EmailPattern}.*"), clean)
      assert(!clean.matches(".*[0-9]{6,}.*"), clean)
    }
    assert(out(0)._3 == 1 && out(0)._4 == 1) // one email, one long number
    assert(out(1)._3 == 0 && out(1)._4 == 2) // 123456 and the 13-digit run
    assert(out(2)._2 == "clean text with no pii at all" && out(2)._3 == 0 && out(2)._4 == 0)
  }

  test("bag overlap: containment catches small-inside-large that Jaccard misses") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val small = (1 to 10).map(i => s"w$i").mkString(" ") // fully contained
    val df = Seq((1L, big), (2L, small))
      .toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val tmp = java.nio.file.Files.createTempDirectory("ovl").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ovl = Dedup.bagOverlap(spark, tmp, 0.8).as[(Long, Long, Double)].collect()
    assert(ovl.toSeq == Seq((1L, 2L, 1.0)), s"containment must flag the pair: ${ovl.toSeq}")
    // the same pair is invisible to Jaccard at 0.5: J = 10/40 = 0.25
    val jac = Dedup.ngramJaccard(spark, tmp, 0.5).count()
    assert(jac == 0, "Jaccard 0.5 must NOT flag it — that asymmetry is the op's reason to exist")
  }

  test("stratified sample: deterministic, honors per-source rates") {
    val s1 = TextPipeline.stratifiedSample(spark, dir).collect().map(_.getLong(0)).sorted
    val s2 = TextPipeline.stratifiedSample(spark, dir).collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2)) // no RNG, no partition sensitivity
    val byLen = TextPipeline.stratifiedSample(spark, dir)
      .groupBy(length(col("source")).as("l")).count()
      .as[(Int, Long)].collect().toMap
    val totals = Tables.documents(spark, dir)
      .groupBy(length(col("source")).as("l")).count()
      .as[(Int, Long)].collect().toMap
    // rates land near 25% / 75% (md5 buckets are uniform-ish; wide tolerance)
    byLen.foreach { case (l, kept) =>
      val rate = kept.toDouble / totals(l)
      val target = if (l == 4) 0.25 else 0.75
      assert(math.abs(rate - target) < 0.15, s"len=$l rate=$rate")
    }
  }
}
