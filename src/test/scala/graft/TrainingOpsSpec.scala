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

  test("sequence packing: bins partition each source's token stream in order") {
    val budget = 256
    val bins = TextPipeline.packSequences(spark, dir, budget)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(bins.keySet == docs.keySet)
    docs.foreach { case (src, ds) =>
      // driver-side replay of concat-and-chunk
      var cum = 0L
      val expected = ds.map { case (_, id, n) =>
        val bin = cum / budget; cum += n; (bin, id, n)
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (bin, xs) =>
        (src, bin, xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max)
      }
      assert(bins(src).toSeq == expected, s"source $src")
      // bins tile the stream: ids never interleave across bins
      val flat = bins(src).sortBy(_._2)
      flat.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"bins overlap in $src")
        case _           =>
      }
    }
  }

  test("filter reasons: codes match thresholds, kept iff no reason fired") {
    val out = TextPipeline.filterReasons(spark, dir)
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == Tables.documents(spark, dir).count())
    out.foreach { case (_, n, kept, reasons) =>
      assert((kept == 1L) == reasons.isEmpty)
      assert((reasons.contains("too_short")) == (n < 20))
      assert((reasons.contains("too_long")) == (n > 80))
    }
    // thresholds are corpus-tuned: every rule must actually fire somewhere
    Seq("too_short", "too_long", "repetitive", "low_diversity").foreach { r =>
      assert(out.exists(_._4.contains(r)), s"rule $r never fires — dead threshold")
    }
    assert(out.exists(_._3 == 1L), "no survivors — degenerate filter")
  }

  test("kmeans: one Lloyd step keeps every vector, non-empty clusters, valid cosines") {
    val out = graft.pipeline.Similarity.kmeansAssign(spark, dir)
      .as[(Long, Long, Double)].collect()
    val n = Tables.embeddings(spark, dir).count()
    assert(out.length == n, "every vector assigned exactly once")
    assert(out.map(_._1).distinct.length == n)
    val clusters = out.map(_._2).distinct
    assert(clusters.forall(c => c >= 0 && c < 8))
    assert(clusters.length > 1, "degenerate clustering: everything in one cluster")
    out.foreach { case (_, _, cos) => assert(cos >= -1.0001 && cos <= 1.0001) }
  }

  test("incremental dedup: orientation fixed, matches the symmetric LSH pairs") {
    val batchIds = Tables.documents(spark, dir)
      .filter(col("source") === "src7").select("doc_id").as[Long].collect().toSet
    val inc = Dedup.incrementalDedup(spark, dir)
      .as[(Long, Long, Double)].collect()
    inc.foreach { case (b, c, est) =>
      assert(batchIds(b), s"batch side $b not from src7")
      assert(!batchIds(c), s"corpus side $c from the batch source")
      assert(est >= 0.5)
    }
    // parity with the symmetric op: exactly the full-LSH pairs that straddle
    // the batch boundary, re-oriented (batch id first)
    val sym = Dedup.minhashLsh(spark, dir)
      .as[(Long, Long, Double)].collect()
      .collect {
        case (a, b, est) if batchIds(a) ^ batchIds(b) =>
          (if (batchIds(a)) a else b, if (batchIds(a)) b else a, est)
      }.toSet
    assert(inc.toSet == sym, "incremental output must equal the straddling symmetric pairs")
  }

  test("token-budget sample: distributed cumsum equals the single-window reference") {
    import org.apache.spark.sql.expressions.Window
    val got = TextPipeline.tokenBudgetSample(spark, dir, budget = 2000L)
      .as[(Long, Double, Long, Long)].collect().toSet
    // naive single-partition global window — the plan shape the operator
    // exists to avoid, used here as the semantic reference
    val w = Window.orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.uniqueTokenRatioFrom(col("toks")).as("quality"),
        size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast("long"))
      .filter(col("cum_tokens") <= 2000L)
      .as[(Long, Double, Long, Long)].collect().toSet
    assert(got == ref, s"distributed prefix sum diverged: ${(got diff ref) ++ (ref diff got)}")
    assert(got.nonEmpty, "budget selected nothing — test is vacuous")
    // the corpus-scale cumsum must run partitioned by __pid (the whole
    // point); only the P-row offset window is allowed to be global
    val plan = TextPipeline.tokenBudgetSample(spark, dir, budget = 2000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"),
      s"expected a __pid-partitioned window in:\n$plan")
  }

  test("language rebalance: integer per-mille rates, deterministic membership") {
    val got = TextPipeline.langBalanceSample(spark, dir)
      .as[(Long, String, Long)].collect()
    assert(got.nonEmpty)
    // recompute the expected rate table driver-side
    val counts = Tables.documents(spark, dir).groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val nMin = counts.values.min
    got.foreach { case (_, lang, pm) =>
      assert(pm == math.min(1000L, 1000L * nMin / counts(lang)),
        s"wrong permille for $lang")
    }
    // the over-represented language is actually downsampled; the smallest
    // keeps (nearly) everything
    val keptByLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    val maxLang = counts.maxBy(_._2)._1
    assert(keptByLang(maxLang) < counts(maxLang),
      s"over-represented $maxLang not downsampled")
    // membership is the deterministic md5 bucket — rerun identical
    val again = TextPipeline.langBalanceSample(spark, dir)
      .as[(Long, String, Long)].collect()
    assert(got.toSet == again.toSet)
  }

  test("vocab coverage: rank and cumulative coverage match the single-window reference") {
    import org.apache.spark.sql.expressions.Window
    val got = TextPipeline.vocabCoverage(spark, dir, topK = 20)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got.size == 20, s"expected a truncating cut, got ${got.size} rows")
    // naive single-partition reference
    val tf = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val w = Window.orderBy(col("freq").desc, col("tok").asc)
    val total = tf.agg(sum(col("freq")).cast("double")).head.getDouble(0)
    val ref = tf
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("freq")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rnk") <= 20)
      .select(col("tok"), col("freq"), col("rnk"),
        round(col("cum").cast("double") / lit(total), 6).as("coverage"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == ref, s"diverged: ${(got diff ref) ++ (ref diff got)}")
    // coverage is monotone in rank and ends below 1 for a 50-token cut
    val byRank = got.toSeq.sortBy(_._3).map(_._4)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    assert(byRank.last < 1.0)
  }

  test("oov rate: reconciles with a driver-side recount against the vocab cut") {
    val got = TextPipeline.oovRate(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val vocab = TextPipeline.vocabCoverage(spark, dir)
      .select("tok").as[String].collect().toSet
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, n, oov, rate) =>
      val toks = docs(id).toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(n == toks.length)
      assert(oov == toks.count(t => !vocab(t)), s"doc $id oov mismatch")
      assert(rate == BigDecimal(oov.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the signal is non-degenerate on the test corpus
    assert(got.exists(_._3 > 0) && got.exists(r => r._3 < r._2))
  }

  test("dsir weight: reconciles with a driver-side log-ratio recount") {
    val got = TextPipeline.dsirWeight(spark, dir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val all = docs.flatMap(d => toks(d._3))
    val cf = all.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val tq = docs.filter(_._2 == "en").flatMap(d => toks(d._3))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val (nc, nt, v) = (cf.values.sum.toDouble, tq.values.sum.toDouble, cf.size.toDouble)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // log-ratio rounded once per distinct token, doc terms exact decimal
    val lr = cf.keys.map(t => t -> r6(math.log((tq.getOrElse(t, 0L) + 1) / (nt + v))
      - math.log((cf(t) + 1) / (nc + v)))).toMap
    docs.filter(d => toks(d._3).nonEmpty).foreach { case (id, _, text) =>
      val tf = toks(text).groupBy(identity).map { case (t, xs) => t -> xs.length }
      val s = tf.toSeq.map { case (t, n) => n * lr(t) }.sum
      val (n, w) = got(id)
      assert(n == tf.values.sum)
      // integer half-up division, the engine/oracle contract (no doubles)
      val s6 = (s * 1000000).toLongExact
      val expect = (s6.sign * ((2 * math.abs(s6) + n) / (2 * n))).toDouble / 1000000.0
      assert(w == expect, s"doc $id weight mismatch")
    }
    // the signal separates the target slice: mean weight of en docs exceeds
    // the mean over the rest (the statistic DSIR resamples on)
    val byLang = docs.map(d => d._2 -> got(d._1)._2)
    val enMean = byLang.filter(_._1 == "en").map(_._2).sum /
      byLang.count(_._1 == "en")
    val restMean = byLang.filterNot(_._1 == "en").map(_._2).sum /
      byLang.count(_._1 != "en")
    assert(enMean > restMean)
  }

  test("quality buckets: NTILE distribution over the surprisal ranking") {
    val s = TextPipeline.surprisalScore(spark, dir).as[(Long, Double)].collect()
    val got = TextPipeline.qualityBuckets(spark, dir).as[(Long, Double, Long)].collect()
    assert(got.length == s.length && got.nonEmpty)
    // scores pass through unchanged; bucket = NTILE over (surprisal, doc_id)
    val scores = s.toMap
    val order = s.sortBy(x => (x._2, x._1)).map(_._1)
    val n = order.length
    val expect = order.zipWithIndex.map { case (id, i) => id -> (i.toLong * 10 / n + 1) }.toMap
    got.foreach { case (id, sur, b) =>
      assert(sur == scores(id))
      assert(b == expect(id), s"doc $id bucket mismatch")
    }
    // balanced tiers: sizes differ by at most 1; tiers are surprisal-ordered
    val byBucket = got.groupBy(_._3).toSeq.sortBy(_._1)
    assert(byBucket.map(_._1) == (1L to 10L))
    val sizes = byBucket.map(_._2.length)
    assert(sizes.max - sizes.min <= 1)
    byBucket.map(_._2.map(_._2)).sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min)
      case _ =>
    }
  }

  test("chunking: stride coverage, overlap structure, reconstruction") {
    val (chunkSize, stride) = (32, 24)
    val got = TextPipeline.chunkDocuments(spark, dir, chunkSize, stride)
      .as[(Long, Long, Long, String)].collect()
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    assert(got.map(_._1).toSet == docs.filter(_._2.nonEmpty).keySet)
    got.groupBy(_._1).foreach { case (id, rows) =>
      val toks = docs(id)
      val byId = rows.sortBy(_._2)
      // chunk ids dense from 0; one chunk per stride start below n
      assert(byId.map(_._2).toSeq == (0L until ((toks.length + stride - 1) / stride).toLong))
      byId.foreach { case (_, cid, n, chunk) =>
        val start = (cid * stride).toInt
        val expect = toks.slice(start, math.min(start + chunkSize, toks.length))
        assert(n == expect.length)
        assert(chunk == expect.mkString(" "), s"doc $id chunk $cid mismatch")
      }
      // dropping each chunk's overlap with its predecessor reconstructs the doc
      val rebuilt = byId.flatMap { case (_, cid, _, chunk) =>
        val ws = chunk.split(" ").toSeq
        if (cid == 0) ws else ws.drop(chunkSize - stride)
      }
      assert(rebuilt.toSeq == toks)
    }
  }

  test("boilerplate strip: exact mask recount, prose survives, boilerplate vanishes") {
    val got = TextPipeline.boilerplateStrip(spark, dir)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    assert(got.keySet == docs.map(_._1).toSet)
    // mine: 5-grams in >= 3 distinct docs
    def grams(toks: Seq[String]) = toks.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSeq
    val mined = docs.flatMap { case (id, toks) => grams(toks).distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 3).keySet
    var removedAny = false
    docs.foreach { case (id, toks) =>
      val starts = grams(toks).zipWithIndex.collect { case (g, i) if mined(g) => i }
      val kept = toks.indices.filterNot(p => starts.exists(s => s <= p && p <= s + 4))
      val (_, n, rm, clean) = got(id)
      assert(n == toks.length)
      assert(rm == toks.length - kept.length)
      assert(clean == kept.map(toks).mkString(" "), s"doc $id clean text mismatch")
      removedAny ||= rm > 0
    }
    assert(removedAny, "no boilerplate removed — test corpus makes this vacuous")
  }

  test("leakage-free split: near-dup pairs never straddle splits, cuts match the hash") {
    val got = Dedup.leakageFreeSplit(spark, dir)
      .as[(Long, Long, String)].collect()
    val byDoc = got.map(r => r._1 -> r._3).toMap
    val labels = Dedup.corpusClusters(spark, dir).as[(Long, Long)].collect().toMap
    assert(got.map(_._1).toSet == labels.keySet)
    // THE invariant: both endpoints of every near-dup pair share a split
    val pairs = Dedup.minhashLsh(spark, dir).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) straddles ${byDoc(a)}/${byDoc(b)}")
    }
    // split is a pure function of the cluster hash (driver recount)
    def md5p(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    got.foreach { case (id, c, split) =>
      assert(c == labels(id))
      val h = md5p(c.toString) % 1000
      val expect = if (h < 10) "test" else if (h < 20) "val" else "train"
      assert(split == expect, s"doc $id split mismatch (h=$h)")
    }
    // all three splits non-empty is corpus-dependent; train must dominate
    val n = got.length.toDouble
    assert(got.count(_._3 == "train") / n > 0.9)
  }

  test("split leakage audit: exact driver recount; cluster row zero, naive bites at 50% holdout") {
    def md5p(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    def split(h: Long, test: Int, v: Int) =
      if (h < test) "test" else if (h < test + v) "val" else "train"
    val pairs = Dedup.minhashLsh(spark, dir).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val clusters = Dedup.corpusClusters(spark, dir).as[(Long, Long)].collect().toMap
    val rows = Dedup.splitLeakageAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val naive = pairs.count { case (a, b) =>
      split(md5p(a.toString) % 1000, 10, 10) != split(md5p(b.toString) % 1000, 10, 10) }
    val clus = pairs.count { case (a, b) =>
      split(md5p(clusters(a).toString) % 1000, 10, 10) !=
        split(md5p(clusters(b).toString) % 1000, 10, 10) }
    assert(rows("naive_doc_hash") == ((naive.toLong, pairs.length.toLong)))
    assert(rows("cluster_aware") == ((clus.toLong, pairs.length.toLong)))
    assert(clus == 0, "cluster-aware split leaked — violates its construction")
    // bite: at a 500-permille holdout the naive per-doc hash must straddle
    // (each near-dup pair lands same-side w.p. ~1/2 under independent md5)
    val wide = Dedup.splitLeakageAudit(spark, dir, 0.5, 500, 0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide("cluster_aware") == 0L)
    assert(wide("naive_doc_hash") > 0L,
      "naive split shows no leakage at a 50% holdout — audit vacuous")
  }

  test("curriculum phases: exact global-rank replay, equal masses, monotone quality") {
    val got = graft.pipeline.TextPipeline.curriculumPhase(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
    val want = docs.map { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (id, r6(toks.distinct.length.toDouble / math.max(toks.length, 1).toDouble))
    }.sortBy { case (id, q) => (-q, id) }.zipWithIndex
      .map { case ((id, q), i) => (id, q, i.toLong * 10L / docs.length) }
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq)
    // equal-mass phases (floor split: sizes differ by at most 1)
    val sizes = got.groupBy(_._3).view.mapValues(_.length).values
    assert(sizes.max - sizes.min <= 1, s"unbalanced phases: $sizes")
    // quality never increases across phase boundaries
    val byPhase = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    byPhase.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(p, q) => assert(byPhase(p).min >= byPhase(q).max,
        s"phase $p not uniformly cleaner than $q")
      case _ =>
    }
  }

  test("k-center weights: Voronoi masses and mean distances replay on the driver") {
    val ed = sf("embeddings")
    val centers = graft.pipeline.Similarity.kcenterSample(spark, ed)
      .select("vec_id").as[Long].collect().toVector
    val got = graft.pipeline.Similarity.kcenterWeights(spark, ed).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val embs = Tables.embeddings(spark, ed).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
    val nrm = embs.view.mapValues(normD).toMap
    def dist(a: Long, b: Long): Double =
      r6(1.0 - r6(dotD(embs(a), embs(b)) / (nrm(a) * nrm(b))))
    val assign = embs.keys.toSeq.map { v =>
      val (c, dd) = centers.map(c => c -> dist(v, c)).minBy { case (c, dd) => (dd, c) }
      (v, c, dd)
    }
    def dec10(x: Double) = BigDecimal.valueOf(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val want = assign.groupBy(_._2).map { case (c, g) =>
      c -> ((g.length.toLong, r6(g.map(t => dec10(t._3)).sum.toDouble / g.length)))
    }
    assert(got == want, s"got $got\nwant $want")
    // total mass = corpus; each center sits in its own cell at distance 0
    assert(got.values.map(_._1).sum == embs.size)
    centers.foreach { c =>
      val (v, cc, dd) = assign.find(_._1 == c).get
      assert(cc == c && dd == 0.0, s"center $c not self-assigned ($cc, $dd)")
    }
  }

  test("mixture plan: waterfill arithmetic replays; no source over-drawn; budget is maximal") {
    val got = graft.pipeline.TextPipeline.mixturePlan(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))).toMap
    val masses = Tables.documents(spark, dir).select("source", "text")
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(
        _.map(_._2.toLowerCase.split("\\s+").count(_.nonEmpty).toLong).sum).toMap
    def dec10(x: Double) = BigDecimal.valueOf(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val sqSum = masses.values.map(n => dec10(r6(math.sqrt(n.toDouble)))).sum.toDouble
    val weights = masses.view.mapValues(n => r6(r6(math.sqrt(n.toDouble)) / sqSum)).toMap
    val budget = masses.map { case (s, n) => math.floor(n.toDouble / weights(s)).toLong }.min
    masses.foreach { case (s, n) =>
      val w = weights(s)
      val want = (n, w, budget, r6(w * budget.toDouble / n.toDouble),
        math.floor(w * budget.toDouble).toLong)
      assert(got(s) == want, s"source $s: got ${got(s)} want $want")
      // feasibility: the take never exceeds what the source holds
      assert(got(s)._5 <= n)
      assert(got(s)._4 <= 1.0)
    }
    // maximality: one more token of budget would over-draw SOME source
    assert(masses.exists { case (s, n) =>
      weights(s) * (budget + 1).toDouble / n.toDouble > 1.0 ||
        math.floor(n.toDouble / weights(s)).toLong == budget
    }, "budget not binding anywhere")
    // weights normalize to ~1 (6dp rounding drift only)
    assert(math.abs(weights.values.sum - 1.0) < 1e-4)
  }

  test("shard rebalance: exact move recount; rendezvous beats mod by the consistent-hashing margin") {
    val got = graft.pipeline.TextPipeline.shardRebalance(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def md5p(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    val ids = Tables.documents(spark, dir).select("doc_id").as[Long].collect()
    val mvMod = ids.count(id => md5p(id.toString) % 16 != md5p(id.toString) % 17)
    val mvRdv = ids.count { id =>
      val scores = (0 to 16).map(s => md5p(s"${id}_$s"))
      scores.indexOf(scores.max) == 16 // first occurrence, like array_position
    }
    assert(got("mod")._1 == ids.length && got("rendezvous")._1 == ids.length)
    assert(got("mod")._2 == mvMod.toLong, s"mod moves ${got("mod")._2} vs $mvMod")
    assert(got("rendezvous")._2 == mvRdv.toLong)
    assert(got("mod")._3 == r6(mvMod.toDouble / ids.length))
    assert(got("rendezvous")._3 == r6(mvRdv.toDouble / ids.length))
    // the consistent-hashing contract: rendezvous near 1/(k+1), mod near k/(k+1)
    assert(got("rendezvous")._3 < 0.15, "rendezvous moved too much — HRW broken")
    assert(got("mod")._3 > 0.8, "mod moved too little — hash not spreading")
  }

  test("duplicate spans: islands match a driver-side seed-merge; spans are verbatim-repeated") {
    val k = 5
    val got = Dedup.duplicateSpans(spark, dir, k)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, s, e, n) => (id, s, e, n) }.toSet
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    // global k-gram occurrence counts (string identity — the md5-64 hash
    // is collision-free at this scale, so string recount == hash recount)
    val all = docs.flatMap { case (id, ws) =>
      ws.sliding(k).filter(_.length == k).zipWithIndex
        .map { case (g, i) => (id, i + 1L, g.mkString(" ")) } }
    val cnt = all.groupBy(_._3).map { case (g, o) => g -> o.length }
    val expect = all.filter(t => cnt(t._3) >= 2).groupBy(_._1).flatMap { case (id, seeds) =>
      val ps = seeds.map(_._2).sorted
      // gaps-and-islands: break when the next seed starts past coverage end
      val islands = ps.foldLeft(List.empty[List[Long]]) {
        case (acc, p) if acc.nonEmpty && p - acc.head.head <= k => (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }
      islands.map(is => (id, is.min, is.max + k - 1, is.length.toLong))
    }.toSet
    assert(got == expect, s"islands diverge: extra=${got -- expect} missing=${expect -- got}")
    assert(got.nonEmpty, "no duplicate spans — test corpus makes this vacuous")
    // the semantic claim: every k-window inside a reported span occurs
    // verbatim at another (doc, offset) of the corpus — that's what makes
    // the whole span repeated text (maximal merged spans need not repeat
    // as a whole: different sources can cover different windows)
    val byId = docs.toMap
    val index = all.groupBy(_._3).map { case (g, o) => g -> o.map(t => (t._1, t._2)).toList }
    got.foreach { case (id, s, e, _) =>
      val span = byId(id).slice(s.toInt - 1, e.toInt)
      span.sliding(k).filter(_.length == k).zipWithIndex.foreach { case (win, off) =>
        val locs = index.getOrElse(win.mkString(" "), Nil)
        assert(locs.exists(_ != ((id, s + off))),
          s"span window not repeated: doc $id pos ${s + off}")
      }
    }
  }

  test("curation funnel: every stage count reconciles with a sequential driver recount") {
    val got = Dedup.curationFunnel(spark, dir)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(0L -> "ingest", 1L -> "quality", 2L -> "exact_dedup",
        3L -> "near_dedup", 4L -> "decontaminated"))
    val counts = got.map(_._3)
    assert(counts.sliding(2).forall(s => s(0) >= s(1)), "funnel must be non-increasing")

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val corpus = docs.keySet.filter(_ >= 50)
    assert(counts(0) == corpus.size.toLong)
    // stage 1: the filterReasons rules, recounted
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = corpus.filter { id =>
      val ws = toks(docs(id)); val n = ws.length
      val bg = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val dup = if (n > 1) r6(1.0 - bg.distinct.length.toDouble / bg.length) else 0.0
      n >= 20 && n <= 80 && dup <= 0.05 &&
        r6(ws.distinct.length.toDouble / n) >= 0.4
    }
    assert(counts(1) == s1.size.toLong)
    // stage 2: canonical (min id) per normalized-text fingerprint among s1
    val s2 = s1.groupBy(id => docs(id).toLowerCase.trim.replaceAll("\\s+", " "))
      .map(_._2.min).toSet
    assert(counts(2) == s2.size.toLong)
    // stage 3: LSH among s2 — engine signatures (kernel is bit-parity
    // tested), banding + threshold recounted driver-side
    val sigs = Tables.documents(spark, dir).filter(col("doc_id").isin(s2.toSeq: _*))
      .select(col("doc_id"), Dedup.minhashSignature(col("text")).as("sig"))
      .as[(Long, Seq[Long])].collect()
    val losers = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if (0 until 16).exists(bd => (0 until 4).forall(r => sa(bd * 4 + r) == sb(bd * 4 + r)))
      if sa.zip(sb).count(p => p._1 == p._2) / 64.0 >= 0.5
    } yield b).toSet
    val s3 = s2 -- losers
    assert(counts(3) == s3.size.toLong)
    // stage 4: minus benchmark-contaminated (5-gram share with docs < 50)
    def grams(ws: Seq[String]) = ws.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val bench = docs.collect { case (id, t) if id < 50 => grams(toks(t)) }.fold(Set.empty)(_ ++ _)
    val s4 = s3.filter(id => (grams(toks(docs(id))) & bench).isEmpty)
    assert(counts(4) == s4.size.toLong)
  }

  test("source overlap matrix: canonical pair counts and decimal-exact means") {
    val got = Dedup.sourceOverlapMatrix(spark, dir)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val srcOf = Tables.documents(spark, dir).select("doc_id", "source")
      .as[(Long, String)].collect().toMap
    val pairs = Dedup.minhashLsh(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = pairs.map { case (a, b, est) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) (sa, sb) else (sb, sa)) -> BigDecimal(est.toString) }
      .groupBy(_._1).map { case (k, es) =>
        k -> (es.length.toLong, r6(es.map(_._2).sum.toDouble / es.length).toDouble) }
    assert(got == expect)
    // canonical ordering: every key upper-triangular
    got.keys.foreach { case (a, b) => assert(a <= b) }
  }

  test("substr strip: clean text is exactly the tokens outside the spans") {
    val k = 5
    val spans = Dedup.duplicateSpans(spark, dir, k)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, ss) => id -> ss.map(s => (s._2, s._3)).toList }
    val got = Dedup.duplicateSpanStrip(spark, dir, k)
      .as[(Long, Long, Long, String)].collect()
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    assert(got.map(_._1).toSet == docs.keySet, "strip must emit every doc")
    got.foreach { case (id, nTok, nRem, clean) =>
      val toks = docs(id)
      val ss = spans.getOrElse(id, Nil)
      val kept = toks.zipWithIndex.collect {
        case (w, i) if !ss.exists(sp => sp._1 <= i + 1 && i + 1 <= sp._2) => w }
      assert(nTok == toks.length.toLong, s"doc $id n_tokens")
      assert(nRem == (toks.length - kept.length).toLong, s"doc $id n_removed")
      assert(clean == kept.mkString(" "), s"doc $id clean_text")
    }
    assert(got.exists(_._3 > 0), "nothing stripped — vacuous corpus")
    assert(got.exists(r => r._2 == r._3 && r._2 > 0), "no fully-stripped doc exercised the empty-text path")
  }

  test("decontaminate: exactly the unflagged corpus docs survive") {
    val kept = Dedup.decontaminate(spark, dir).select("doc_id")
      .as[Long].collect().toSet
    val flagged = Dedup.contamination(spark, dir).select("doc_id")
      .as[Long].collect().toSet
    val corpus = Tables.documents(spark, dir).select("doc_id")
      .as[Long].collect().filter(_ >= 50).toSet
    assert(kept == corpus -- flagged)
    assert(flagged.nonEmpty, "no contaminated docs — test corpus makes this vacuous")
    assert((kept & flagged).isEmpty)
  }

  test("bigram surprisal: matches a driver-side add-one bigram LM recount") {
    val got = TextPipeline.bigramSurprisal(spark, dir)
      .as[(Long, Double)].collect().toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val cu = docs.flatMap(_._2).groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val v = cu.size.toLong
    val cb = docs.flatMap(_._2.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).map { case (b, bs) => b -> bs.length.toLong }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = docs.filter(_._2.length >= 2).map { case (id, ws) =>
      val terms = ws.sliding(2).filter(_.length == 2).toSeq
        .groupBy(p => (p.head, p.mkString(" ")))
        .map { case ((w1, b), occ) =>
          r6(occ.length * math.log((cu(w1) + v).toDouble / (cb(b) + 1))) }
      id -> r6(terms.sum.toDouble / (ws.length - 1)).toDouble
    }.toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, s) => assert(s == expect(id), s"doc $id: $s vs ${expect(id)}") }
    // degenerate repeated text must score below the corpus median (the
    // filter's reason to exist): sanity on direction, not exact values
    assert(got.values.min < got.values.max)
  }

  test("bpe pairs: top merge candidates match a driver-side weighted recount") {
    val got = TextPipeline.bpePairFreq(spark, dir).as[(String, Long)].collect()
    val docs = Tables.documents(spark, dir).select("text").as[String].collect()
    val wf = docs.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val expect = wf.toSeq.filter(_._1.length >= 2)
      .flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).sum }
      .toSeq.sortBy { case (p, f) => (-f, p) }.take(200)
    assert(got.toSeq == expect, "pair table diverges from the driver recount")
    assert(got.nonEmpty && got.forall(_._1.length == 2))
    // ranked output: non-increasing frequency
    assert(got.sliding(2).forall(s => s.length < 2 || s(0)._2 >= s(1)._2))
  }

  test("zipf fit: reconciles with a driver-side least-squares recount, slope negative") {
    val Array((nv, slope, intercept)) =
      TextPipeline.zipfFit(spark, dir).as[(Long, Double, Double)].collect()
    val docs = Tables.documents(spark, dir).select("text").as[String].collect()
    val freq = docs.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
    assert(nv == freq.size)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ranked = freq.toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((_, f), i) => (math.log(i + 1.0), math.log(f.toDouble)) }
    val n = ranked.length.toDouble
    val (sx, sy, sxx, sxy) = (
      ranked.map(p => r6(p._1)).sum.toDouble, ranked.map(p => r6(p._2)).sum.toDouble,
      ranked.map(p => r6(p._1 * p._1)).sum.toDouble,
      ranked.map(p => r6(p._1 * p._2)).sum.toDouble)
    val m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(slope == r6(m).toDouble)
    assert(intercept == r6((sy - m * sx) / n).toDouble)
    // frequency decays with rank on any natural-ish corpus
    assert(slope < 0)
  }

  test("keep-best-of-cluster: one representative per cluster, argmax quality") {
    val labels = Dedup.corpusClusters(spark, dir).as[(Long, Long)].collect().toMap
    val kept = Dedup.keepBestOfCluster(spark, dir)
      .as[(Long, Long, Double)].collect()
    // exactly one representative per distinct cluster, and it belongs there
    assert(kept.map(_._1).distinct.length == kept.length)
    assert(kept.map(_._1).toSet == labels.values.toSet)
    kept.foreach { case (cl, keep, _) => assert(labels(keep) == cl) }
    // the representative has the cluster-max quality (driver recompute)
    val quality = Tables.documents(spark, dir).select(col("doc_id"),
        graft.functions.TextFunctions.uniqueTokenRatio(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    val byCluster = labels.groupBy(_._2)
    kept.foreach { case (cl, keep, q) =>
      val best = byCluster(cl).keys.map(d => (-quality(d), d)).min
      assert(keep == best._2 && q == quality(keep),
        s"cluster $cl kept $keep, expected ${best._2}")
    }
  }

  test("boilerplate n-grams: every reported gram verifiably spans >= minDocs docs") {
    val got = TextPipeline.boilerplateNgrams(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got.nonEmpty, "no boilerplate grams found — test is vacuous")
    assert(got.values.forall(_ >= 3))
    // brute-force recount on the driver for the small test corpus
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
    def grams(t: String): Set[String] = {
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (ws.length < 5) Set.empty
      else ws.sliding(5).map(_.mkString(" ")).toSet
    }
    val counts = docs.flatMap { case (id, t) => grams(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length).toMap
    got.foreach { case (g, n) =>
      assert(counts.get(g).contains(n), s"gram '$g': reported $n, actual ${counts.get(g)}")
    }
    // completeness: no >=3-doc gram missing
    counts.filter(_._2 >= 3).foreach { case (g, n) =>
      assert(got.get(g).contains(n.toLong), s"missing boilerplate gram '$g' ($n docs)")
    }
  }

  test("shard assignment: total, deterministic, positions dense per shard") {
    val rows = TextPipeline.shardAssign(spark, dir, nShards = 8)
      .as[(Long, Long, Long)].collect()
    val total = Tables.documents(spark, dir).count()
    assert(rows.length == total, "every document gets exactly one shard row")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are 1..count within each shard, no gaps or ties
    rows.groupBy(_._2).foreach { case (s, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length.toLong),
        s"shard $s positions not dense: ${g.map(_._3).sorted.mkString(",")}")
    }
    // deterministic: a rerun produces the identical assignment
    val again = TextPipeline.shardAssign(spark, dir, nShards = 8)
      .as[(Long, Long, Long)].collect()
    assert(rows.toSet == again.toSet)
  }

  test("CMS heavy hitters: est >= exact, no false negatives, cells recount") {
    val got = TextPipeline.cmsHeavyHitters(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    // the CMS overestimate bound: collisions only inflate
    got.foreach { case (t, exact, est) =>
      assert(est >= exact, s"'$t' est $est < exact $exact")
    }
    // driver-side exact counts + threshold
    val exact = Tables.documents(spark, dir)
      .select(col("text")).as[String].collect()
      .flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, os) => t -> os.length.toLong }
    val total = exact.values.sum
    // no false negatives: every true heavy hitter is reported
    exact.filter { case (_, n) => n * 1000 >= total * 2 }.foreach { case (t, n) =>
      val hit = got.find(_._1 == t)
      assert(hit.isDefined, s"true heavy hitter '$t' ($n) missing")
      assert(hit.get._2 == n, s"'$t' exact ${hit.get._2} != recount $n")
    }
    // recount one sketch cell: est of the hottest token never exceeds the
    // sum of exact counts colliding into its min cell (per-row identity)
    val hottest = got.maxBy(_._2)
    assert(hottest._3 <= total, "estimate cannot exceed total occurrences")
    // vocab-built sketch == occurrence-built sketch: every reported est
    // is the min over its d cells of the pure-transform cell table
    val cells = TextPipeline.cmsCells(Tables.documents(spark, dir).select("text"))
      .as[(Int, Long, Long)].collect().map { case (j, b, c) => (j, b) -> c }.toMap
    def bucket(j: Int, tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${j}_$tok".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    got.foreach { case (t, _, est) =>
      val byCells = (0 until 4).map(j => cells((j, bucket(j, t)))).min
      assert(est == byCells, s"'$t' est $est != cell-table min $byCells")
    }
  }

  test("corpus report: totals reconcile with the component pipelines") {
    val rep = TextPipeline.corpusReport(spark, dir)
      .as[(String, Long, Long, Double, Long, Long)].collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rep.map(_._2).sum == nDocs, "per-source doc counts must total the corpus")
    // kept permille reconciles with filterReasons
    val keptTotal = TextPipeline.filterReasons(spark, dir)
      .agg(sum(col("kept"))).as[Long].head()
    val impliedKept = rep.map(r => r._5 * r._2 / 1000.0).sum
    assert(math.abs(impliedKept - keptTotal) <= rep.length,
      s"kept permille drifts: implied $impliedKept vs $keptTotal")
    // within-source dup pairs total <= all near-dup pairs
    val allPairs = Dedup.minhashLsh(spark, dir).count()
    assert(rep.map(_._6).sum <= allPairs)
    assert(rep.forall(r => r._4 > 0.0 && r._3 >= r._2), "token stats sane")
  }

  test("temperature sampling: skewed mixture flattens toward n^tau, smallest source kept whole") {
    // 80/16/4 skew — the regime the knob exists for (the sf corpus is
    // uniform across sources, where every rate is legitimately 1000)
    val rows = (0 until 400).map(i => (i.toLong, "big", "en", s"doc $i")) ++
      (400 until 480).map(i => (i.toLong, "mid", "en", s"doc $i")) ++
      (480 until 500).map(i => (i.toLong, "small", "en", s"doc $i"))
    val tmp = java.nio.file.Files.createTempDirectory("tsample").toString
    rows.toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextPipeline.temperatureSample(spark, tmp)
      .as[(Long, String, Long)].collect()
    val permille = got.groupBy(_._2).map { case (s, g) => s -> g.head._3 }
    // smallest source is the rate anchor; larger sources are downsampled
    // by (n_small/n_s)^(1-tau): (20/400)^0.3 = 0.407, (20/80)^0.3 = 0.660
    assert(permille("small") == 1000L)
    assert(permille("big") == 407L, s"big rate ${permille("big")}")
    assert(permille("mid") == 659L || permille("mid") == 660L, s"mid rate ${permille("mid")}")
    // the md5 cut actually thins the big source near its rate
    val kept = got.groupBy(_._2).map { case (s, g) => s -> g.length }
    assert(kept("small") == 20)
    assert(kept("big") < 400 && kept("big") > 100, s"big kept ${kept("big")}")
    // every emitted row respects its own permille cut (recount)
    got.foreach { case (id, _, p) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      assert(java.lang.Long.parseLong(hex, 16) % 1000 < p)
    }
  }

  test("bloom contamination screen: one-sided vs the exact check (no false negatives)") {
    val exact = Dedup.contamination(spark, dir)
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.bloomContamination(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty && bloom.nonEmpty)
    // every exactly-contaminated doc tests bloom-positive with at least
    // as many grams — a benchmark gram's bits are set by construction
    exact.foreach { case (doc, nShared) =>
      assert(bloom.contains(doc), s"doc $doc contaminated but bloom-negative")
      assert(bloom(doc) >= nShared,
        s"doc $doc bloom $nShared grams > bloom-positive ${bloom(doc)}")
    }
    // and the sketch is a SCREEN, not an oracle: false positives are
    // allowed (collisions), clean verdicts are not
    assert(bloom.keySet.forall(_ >= 50L), "benchmark docs must not self-report")
  }

  test("winnowing: match guarantee, density bound, fingerprints are real gram hashes") {
    // planted corpus: docs 1 and 2 share a 40-char verbatim span (>= w+k-1=8
    // chars, so the winnowing guarantee REQUIRES a shared fingerprint);
    // doc 3 shares nothing
    val shared = "the identical plagiarized span of text!"
    val rows = Seq(
      (1L, "web", "en", s"unique prefix one $shared and a tail"),
      (2L, "web", "en", s"other opening here $shared differing end"),
      (3L, "web", "en", "completely unrelated content with zero overlap at all"))
    val tmp = java.nio.file.Files.createTempDirectory("winnow").toString
    rows.toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextPipeline.winnowFingerprints(spark, tmp)
      .as[(Long, Long)].collect()
    val byDoc = got.groupBy(_._1).map { case (d, fs) => d -> fs.map(_._2).toSet }
    // guarantee: the shared span yields at least one shared fingerprint
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty, "shared span missed")
    // every selected fingerprint is the hash of a real 5-gram of its doc
    def gramHashes(t: String): Set[Long] = {
      val low = t.toLowerCase
      (0 to low.length - 5).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(low.substring(i, i + 5).getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16)
      }.toSet
    }
    rows.foreach { case (id, _, _, t) =>
      assert(byDoc(id).subsetOf(gramHashes(t)), s"doc $id emitted a non-gram hash")
    }
    // density: winnowing selects ~2/(w+1) of grams — far below all of them
    rows.foreach { case (id, _, _, t) =>
      assert(byDoc(id).size < gramHashes(t).size, s"doc $id kept every gram")
    }
    // the pairs consumer: the planted copy pair is detected, the
    // unrelated doc pairs with neither
    val pairs = TextPipeline.winnowPairs(spark, tmp)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)), "planted partial copy missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc flagged")
  }

  test("Heaps fit: 10 prefix points, sublinear growth exponent, driver recount") {
    val Array((n, beta, icept)) = TextPipeline.heapsFit(spark, dir)
      .as[(Long, Double, Double)].collect()
    assert(n == 10L)
    // vocab growth must be sublinear (beta < 1); this synthetic corpus
    // saturates its vocabulary early, so beta ~ 0 is the expected flag
    assert(beta >= -1e-6 && beta < 1.0, s"beta $beta outside [0, 1)")
    assert(icept > 0.0, "ln-vocab intercept must be positive")
    // driver recount of the two prefix series feeding the regression
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val nd = docs.length
    val pts = (1 to 10).map { i =>
      val cp = (nd.toLong * i + 9) / 10
      val pre = docs.filter(_._1 < cp)
      (pre.map(_._2.length.toLong).sum, pre.flatMap(_._2).distinct.length.toLong)
    }
    // regression inputs: both series strictly positive and monotone
    assert(pts.forall { case (a, b) => a > 0 && b > 0 })
    assert(pts.zip(pts.tail).forall { case ((n1, v1), (n2, v2)) => n2 >= n1 && v2 >= v1 })
    // recount the slope with plain doubles; 6dp-rounded pipeline must agree
    val xs = pts.map(p => math.log(p._1.toDouble)); val ys = pts.map(p => math.log(p._2.toDouble))
    val sn = xs.length.toDouble
    val slope = (sn * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum) /
      (sn * xs.map(a => a * a).sum - xs.sum * xs.sum)
    assert(math.abs(beta - slope) < 1e-4, s"beta $beta != recount $slope")
  }

  test("KL per source: every source covered, Gibbs bound holds, deterministic") {
    val got = TextPipeline.klPerSource(spark, dir).as[(String, Double)].collect()
    val sources = Tables.documents(spark, dir)
      .select("source").distinct().as[String].collect().toSet
    assert(got.map(_._1).toSet == sources)
    // both smoothed distributions are proper, so KL >= 0 (Gibbs), up to
    // the 6dp rounding of a near-zero sum
    got.foreach { case (s, kl) => assert(kl >= -1e-5, s"$s KL $kl negative") }
    assert(got.exists(_._2 > 0.0), "sources cannot all be exactly on-distribution")
    val again = TextPipeline.klPerSource(spark, dir).as[(String, Double)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("BPE training matches an independent in-memory trainer") {
    // reference trainer: greedy left-to-right fuse over (word, freq)
    def refBpe(vocab: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
      var words: Map[Vector[String], Long] = vocab.collect {
        case (w, f) if w.length >= 2 => w.map(_.toString).toVector -> f
      }.groupMapReduce(_._1)(_._2)(_ + _)
      (1 to n).flatMap { _ =>
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- words; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        if (counts.isEmpty) None
        else {
          val ((a, b), f) = counts.minBy { case ((x, y), c) => (-c, x, y) }
          words = words.map { case (syms, wf) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> wf
          }.groupMapReduce(_._1)(_._2)(_ + _)
          Some((a, b, f))
        }
      }
    }
    val vocab = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy($"w").agg(count(lit(1)).cast("long").as("f"))
      .as[(String, Long)].collect().toMap
    val want = refBpe(vocab, 8).zipWithIndex
      .map { case ((a, b, f), i) => (i + 1L, a, b, f) }
    val got = TextPipeline.bpeTrain(spark, dir, 8)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("RAKE keyphrases: planted phrases score degree/frequency exactly") {
    val df = Seq(
      // phrases: "red keyword mining" (×2 via co-occurring words), "red", "plain text"
      (1L, "red keyword mining of the red keyword mining and plain text"),
      (2L, "single")) // one 1-word phrase
      .toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val tmp = java.nio.file.Files.createTempDirectory("rake").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextPipeline.rakeKeyphrases(spark, tmp)
      .as[(Long, String, Long, Double)].collect().groupBy(_._1)
    // doc 1 replay: phrases = [red keyword mining]×2, [plain text]
    // freq: red 2, keyword 2, mining 2, plain 1, text 1
    // deg:  red 6, keyword 6, mining 6, plain 2, text 2 (phrase lens 3,3,2)
    // wscore: red/keyword/mining = 3.0; plain/text = 2.0
    // "red keyword mining" = 9.0; "plain text" = 4.0
    val d1 = got(1L).sortBy(_._3).map(r => (r._2, r._3, r._4)).toSeq
    assert(d1 == Seq(("red keyword mining", 1L, 9.0), ("plain text", 2L, 4.0)), d1.toString)
    // doc 2: the single word scores deg/freq = 1/1 = 1
    assert(got(2L).map(r => (r._2, r._4)).toSeq == Seq(("single", 1.0)))
    // and on the real corpus: every emitted phrase is stopword-free and ranks densely
    val real = TextPipeline.rakeKeyphrases(spark, dir)
      .as[(Long, String, Long, Double)].collect()
    val stops = Set("the", "a", "of", "and", "to")
    assert(real.nonEmpty)
    real.foreach { case (_, p, _, _) =>
      assert(p.split(" ").forall(w => !stops(w)), s"stopword inside phrase: '$p'") }
    real.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq) }
  }

  test("top n-gram coverage: planted chant dominates; driver recount agrees") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),          // one bigram dominates
      (2L, "the quick brown fox jumps over the dog"),   // prose: low coverage
      (3L, "a b a b c a b a b c a b a b c"))            // period-5 chant
      .toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val tmp = java.nio.file.Files.createTempDirectory("topng").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextPipeline.topNgramCoverage(spark, tmp)
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    def recount(text: String, n: Int): (Long, Long) = {
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val grams = t.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      (t.length.toLong, if (grams.isEmpty) 0L else grams.groupBy(identity).values.map(_.size).max.toLong)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((1L, "buy now buy now buy now buy now"),
        (2L, "the quick brown fox jumps over the dog"),
        (3L, "a b a b c a b a b c a b a b c")).foreach { case (id, text) =>
      val (nt, m2) = recount(text, 2)
      val (_, m3) = recount(text, 3)
      val (_, m4) = recount(text, 4)
      val (_, gnt, g2, g3, g4) = got(id)
      assert(gnt == nt)
      assert(g2 == r6(2.0 * m2 / nt) && g3 == r6(3.0 * m3 / nt) && g4 == r6(4.0 * m4 / nt),
        s"doc $id: got ($g2,$g3,$g4) want (${r6(2.0 * m2 / nt)},${r6(3.0 * m3 / nt)},${r6(4.0 * m4 / nt)})")
    }
    // the chant docs dominate prose on 2-gram coverage
    assert(got(1L)._3 > got(2L)._3 && got(3L)._3 > got(2L)._3)
  }

  test("BPE encode: per-doc piece counts replay the merge table word by word") {
    val merges = TextPipeline.bpeTrain(spark, dir, 8)
      .orderBy("step").as[(Long, String, String, Long)].collect()
    def encode(word: String): Long = {
      var sym = " " + (if (word.length >= 2) word.toCharArray.mkString(" ") else word) + " "
      merges.foreach { case (_, a, b, _) =>
        val (pat, rep) = (s" $a $b ", s" $a$b ")
        sym = sym.replace(pat, rep).replace(pat, rep)
      }
      sym.trim.split(" ").length.toLong
    }
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
    val got = TextPipeline.bpeEncode(spark, dir)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.size == docs.count(d => toks(d._2).nonEmpty))
    docs.filter(d => toks(d._2).nonEmpty).foreach { case (id, text) =>
      val ws = toks(text)
      val np = ws.map(encode).sum
      val (gid, gw, gp, ratio) = got(id)
      assert(gw == ws.length && gp == np,
        s"doc $id: got ($gw words, $gp pieces), replay (${ws.length}, $np)")
      // merges genuinely compress: pieces strictly below char count somewhere
      assert(ratio == BigDecimal(np.toDouble / ws.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the trained merges compress the corpus: total pieces < total chars
    val totalChars = docs.flatMap(d => toks(d._2)).map(_.length.toLong).sum
    assert(got.values.map(_._3).sum < totalChars, "8 merges produced zero compression")
  }

  test("DSIR Gumbel selection: exact top-⌈pN/1000⌉ of the deterministic noisy keys") {
    val weights = TextPipeline.dsirWeight(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // recompute the deterministic Gumbel key per doc
    def gkey(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$id".getBytes("UTF-8"))
      val h = md.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val u = (h + 0.5) / 4294967296.0
      BigDecimal(w - math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val n = weights.size
    val k = (n * 250 + 999) / 1000
    val want = weights.toSeq.map { case (id, w) => (id, w, gkey(id, w)) }
      .sortBy { case (id, _, g) => (-g, id) }.take(k).zipWithIndex
      .map { case ((id, w, g), i) => (id, w, g, i + 1L) }.toSet
    val got = TextPipeline.dsirSample(spark, dir)
      .as[(Long, Double, Double, Long)].collect().toSet
    assert(got.size == k, s"selection must be exactly ⌈N/4⌉ = $k rows, got ${got.size}")
    assert(got == want, s"only-in-got=${got -- want}\nonly-in-want=${want -- got}")
  }

  test("dup-size histogram: planted multiplicities recovered, totals reconcile") {
    val df = Seq(
      (1L, "same text"), (2L, "Same   TEXT"), (3L, " same text "), // 3 normalize equal
      (4L, "other doc"), (5L, "other doc"),                        // pair
      (6L, "unique one"))
      .toDF("doc_id", "text").withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val tmp = java.nio.file.Files.createTempDirectory("duphist").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val hist = Dedup.dupSizeHistogram(spark, tmp)
      .as[(Long, Long, Long)].collect().toSet
    assert(hist == Set((3L, 1L, 3L), (2L, 1L, 2L), (1L, 1L, 1L)), hist.toString)
    // and on the real corpus the doc totals reconcile with the group table
    val real = Dedup.dupSizeHistogram(spark, dir).as[(Long, Long, Long)].collect()
    assert(real.map(_._3).sum == graft.Tables.documents(spark, dir).count())
    assert(real.forall { case (sz, groups, docs) => sz * groups == docs })
  }

  test("minhash accuracy audit: same pairs as LSH, errors inside the 64-slot bound") {
    val pairs = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val acc = Dedup.minhashAccuracy(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // audit covers exactly the LSH candidate set with identical estimates
    assert(acc.map(_._1).toSet == pairs.keySet)
    acc.foreach { case (k, est, exact, err) =>
      assert(est == pairs(k))
      assert(exact >= 0.0 && exact <= 1.0)
      assert(err == BigDecimal(math.abs(est - exact))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // estimator quality: σ ≈ √(j(1−j)/64) ≤ 0.0625; mean |err| must sit
    // well inside a few σ on the deterministic fixture
    val meanErr = acc.map(_._4).sum / acc.length
    assert(meanErr < 0.125, s"mean |err| $meanErr — estimator off the rails")
  }

  test("span corruption: sentinel splice reconstructs the original token stream") {
    val rows = TextPipeline.spanCorrupt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val orig = graft.Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    assert(rows.length == orig.size)
    var maskedTotal = 0L
    rows.foreach { case (id, nMasked, nSpans, input, target) =>
      // parse target into sentinel → span tokens
      val spans = scala.collection.mutable.Map.empty[String, Seq[String]]
      var cur: String = null
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Seq.empty }
        else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size == nSpans)
      assert(spans.values.map(_.size).sum == nMasked)
      // splice spans back into the input at their sentinels
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t)
      }.toSeq
      assert(rebuilt == orig(id), s"doc $id: splice does not reconstruct")
      // spans are ≥1 and ≤3·(merged starts) tokens; sentinels numbered densely
      spans.keys.foreach { k =>
        val n = k.stripPrefix("<extra_id_").stripSuffix(">").toInt
        assert(n >= 0 && n < nSpans)
      }
      maskedTotal += nMasked
    }
    // the 10% start rate actually fires corpus-wide
    assert(maskedTotal > 0)
  }

  test("KMV sketches: small groups exact, big groups inside the k=64 error bound") {
    val rows = graft.pipeline.Sketches.kmvDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, est, relErr) =>
      // sketch σ = 1/√(k−2) ≈ 0.127 at k=64; 4σ is a deterministic-fixture
      // sanity margin, not a statistical test
      assert(math.abs(relErr) <= 0.51, s"$et: est=$est exact=$exact relErr=$relErr")
      if (exact < 64) assert(est == exact.toDouble, s"$et under-k group must be exact")
      assert(relErr == BigDecimal((est - exact) / exact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

    // overlap: estimates live in [0,1] and track the exact jaccard within
    // the union-sketch bound (±4σ); est from sketches only, exact audited
    val ov = graft.pipeline.Sketches.kmvOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(ov.nonEmpty)
    ov.foreach { case (a, b, est, exact) =>
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      assert(math.abs(est - exact) <= 0.51, s"$a×$b: est=$est exact=$exact")
    }
  }

  test("bottom-k sample: exact quota per source, ranks dense, stable under growth") {
    val smp = TextPipeline.bottomKSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perSource = smp.groupBy(_._2)
    val srcSizes = graft.Tables.documents(spark, dir).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    srcSizes.foreach { case (src, n) =>
      val got = perSource.getOrElse(src, Array.empty)
      assert(got.length == math.min(50L, n), s"$src quota")
      assert(got.map(_._3).sorted.toSeq == (1L to got.length).toSeq, s"$src ranks not dense")
    }
    // growth stability: sampling a PREFIX of the corpus never admits a doc
    // the full-corpus sample rejected at the same rank budget — the
    // bottom-k invariant that makes incremental resampling cheap
    val fullIds = smp.map(_._1).toSet
    val byHash = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.md5Prefix64(col("doc_id").cast("string")).as("h"))
      .filter(col("doc_id") < 250).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    byHash.groupBy(_._2).foreach { case (src, docs) =>
      val bottom = docs.sortBy(d => (d._3, d._1)).take(50).map(_._1).toSet
      // every prefix-sample doc that also survives in the full corpus's
      // bottom-50 keeps membership — no flapping
      val fullSrc = perSource.getOrElse(src, Array.empty).map(_._1).toSet
      assert((fullSrc & docs.map(_._1).toSet).subsetOf(bottom),
        s"$src: full-corpus picks among prefix docs must be prefix picks too")
    }
    assert(fullIds.nonEmpty)
  }

  test("epoch shuffle: identical membership, dense per-shard orders, decorrelated epochs") {
    val d = sf("documents")
    val rows = TextPipeline.epochShuffle(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val allDocs = graft.Tables.documents(spark, d).select("doc_id")
      .as[Long].collect().toSet
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (ep, rs) =>
      // every doc exactly once per epoch
      assert(rs.map(_._2).toSet == allDocs && rs.length == allDocs.size,
        s"epoch $ep membership broken")
      // orders dense 1..size within every shard
      rs.groupBy(_._3).foreach { case (sh, srs) =>
        assert(srs.map(_._4).sorted.toSeq == (1L to srs.length).toSeq,
          s"epoch $ep shard $sh order not dense")
      }
      // hash sharding spreads: no shard takes more than half the corpus
      assert(rs.groupBy(_._3).values.map(_.size).max <= allDocs.size / 2)
    }
    // epochs are decorrelated: most docs land at a different (shard, ord)
    // slot in the next epoch
    val slot0 = byEpoch(0L).map(r => r._2 -> ((r._3, r._4))).toMap
    val slot1 = byEpoch(1L).map(r => r._2 -> ((r._3, r._4))).toMap
    val same = allDocs.count(id => slot0(id) == slot1(id))
    assert(same < allDocs.size / 10,
      s"epochs not decorrelated: $same/${allDocs.size} docs kept their slot")
    // deterministic: a second evaluation is identical
    assert(TextPipeline.epochShuffle(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet == rows.toSet)
  }

  test("threshold histogram: bins partition the audit table, mean errors replay") {
    val audit = Dedup.minhashAccuracy(spark, dir).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4))) // est, exact, abs_err
    val hist = Dedup.thresholdHist(spark, dir).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(hist.values.map(_._1).sum == audit.length, "bins partition the pairs")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = audit.groupBy { case (_, exact, _) => math.floor(exact * 20) / 20.0 }
      .view.mapValues { rs =>
        val s = rs.map(r => BigDecimal(r._3).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
        (rs.length.toLong, r6((s.toDouble / rs.length)))
      }.toMap
    assert(hist == want, s"got $hist want $want")
  }

  test("ngram novelty: first-appearance recount, first doc fully novel, bounded") {
    val got = TextPipeline.ngramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_._2.size >= 3)
    val grams = docs.map { case (id, ws) =>
      id -> ws.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val firstDoc = grams.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSet == grams.keySet)
    got.foreach { case (id, nG, nNov, nov) =>
      assert(nG == grams(id).size, s"doc $id gram count")
      val wantNovel = grams(id).count(g => firstDoc(g) == id).toLong
      assert(nNov == wantNovel, s"doc $id novel count")
      assert(nov == r6(nNov.toDouble / nG) && nov >= 0.0 && nov <= 1.0)
    }
    // the earliest doc introduces every one of its grams
    val minDoc = grams.keySet.min
    assert(got.find(_._1 == minDoc).get._4 == 1.0, "first doc must be fully novel")
  }

  test("PSI drift: full driver recount, identical cohorts give zero drift") {
    val got = TextPipeline.psiDrift(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set("len_bucket", "lang"))
    // driver recount of the whole statistic
    val base = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def psiOf(cells: Seq[(String, Long)]): (Long, Double) = {
      val byCell = cells.groupBy(_._1)
      val ctA = byCell.view.mapValues(_.count(_._2 % 2 == 0).toLong).toMap
      val ctB = byCell.view.mapValues(_.count(_._2 % 2 == 1).toLong).toMap
      val (nA, nB, nC) = (ctA.values.sum, ctB.values.sum, byCell.size.toLong)
      val terms = byCell.keys.toSeq.map { c =>
        val pa = (ctA(c) + 1).toDouble / (nA + nC)
        val pb = (ctB(c) + 1).toDouble / (nB + nC)
        r6((pa - pb) * math.log(pa / pb))
      }
      (nC, r6(terms.sum.toDouble).toDouble)
    }
    val lenCells = base.map { case (id, _, nc) => (math.min(nc / 50, 9L).toString, id) }.toSeq
    val langCells = base.map { case (id, lg, _) => (lg, id) }.toSeq
    assert(got("len_bucket") == psiOf(lenCells), "len_bucket recount")
    assert(got("lang") == psiOf(langCells), "lang recount")
    // sanity: identical cohort distributions (every doc mirrored into both
    // parities) give PSI exactly 0
    val mirrored = base.flatMap { case (_, lg, _) => Seq((lg, 0L), (lg, 1L)) }.toSeq
    assert(psiOf(mirrored)._2 == 0.0)
  }

  test("langid eval: matrix is the grouped per-doc prediction, mass = corpus") {
    val matrix = TextPipeline.langIdEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perDoc = TextPipeline.langIdQuery(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val want = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(matrix == want)
    assert(matrix.values.sum == perDoc.length)
    // the predictor is better than chance on the labeled corpus: the
    // diagonal dominates a uniform 1/|langs| baseline
    val diag = matrix.collect { case ((l, p), n) if l == p => n }.sum
    val langs = perDoc.map(_._1).distinct.length
    assert(diag.toDouble / perDoc.length > 1.0 / langs,
      s"accuracy ${diag.toDouble / perDoc.length} not above chance")
  }

  test("passage dedup: one survivor per distinct passage, untouched docs round-trip") {
    val w = 32
    val out = Dedup.passageDedupStrip(spark, dir, width = w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // independent passage recount on the driver (sf0.001 is 50 docs)
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
    def passages(t: String): Seq[String] = {
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      ws.grouped(w).map(_.mkString(" ")).toSeq
    }
    val byDoc = docs.map { case (id, t) => id -> passages(t) }.toMap
      .filter(_._2.nonEmpty)
    assert(out.map(_._1).toSet == byDoc.keySet)
    out.foreach { case (id, nP, nKept, _) =>
      assert(nP == byDoc(id).size, s"doc $id passage count")
      assert(nKept <= nP)
    }
    // keep-first: total survivors == number of DISTINCT passage texts
    val distinctPassages = byDoc.values.flatten.toSet
    assert(out.map(_._3).sum == distinctPassages.size)
    // a doc whose passages all survive reassembles to its normalized text
    val untouched = out.filter(o => o._2 == o._3)
    assert(untouched.nonEmpty, "test corpus has no fully-kept doc")
    untouched.foreach { case (id, _, _, clean) =>
      assert(clean == byDoc(id).mkString(" "), s"doc $id round-trip")
    }
    // and the survivor set is exactly first-occurrence by (doc_id, pidx)
    val firstSeen = scala.collection.mutable.Map[String, (Long, Int)]()
    byDoc.toSeq.sortBy(_._1).foreach { case (id, ps) =>
      ps.zipWithIndex.foreach { case (p, i) =>
        if (!firstSeen.contains(p)) firstSeen(p) = (id, i)
      }
    }
    val keptPerDoc = firstSeen.values.groupBy(_._1).view.mapValues(_.size).toMap
    out.foreach { case (id, _, nKept, _) =>
      assert(nKept == keptPerDoc.getOrElse(id, 0).toLong, s"doc $id keep-first")
    }
  }

  test("jaccard kNN: ranks dense, similarity non-increasing, pairs consistent") {
    val k = 3
    val knn = Dedup.jaccardKnn(spark, dir, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val pairs = Dedup.ngramJaccardPrefix(spark, dir)
      .as[(Long, Long, Double)].collect()
    val sym = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .map(p => (p._1, p._2) -> p._3).toMap
    // every kNN row is a real pair with the pair list's similarity
    knn.foreach { case (d, _, n, j) =>
      assert(sym.get((d, n)).contains(j), s"($d,$n) not in pair list at $j")
    }
    knn.groupBy(_._1).foreach { case (d, rows) =>
      val byRank = rows.sortBy(_._2)
      // dense ranks from 1, capped at k and at the doc's true degree
      val degree = sym.keys.count(_._1 == d)
      assert(byRank.map(_._2).toSeq == (1L to math.min(k, degree).toLong))
      // similarity non-increasing in rank, ties broken by neighbor id
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3), s"doc $d order")
        case _ =>
      }
      // rank 1 is the true maximum (min neighbor id on ties); toSeq first —
      // collect-to-pairs on the Map would key by jaccard and drop ties
      val best = sym.toSeq.collect { case ((`d`, n), j) => (j, n) }
        .sortBy { case (j, n) => (-j, n) }.head
      assert((byRank.head._4, byRank.head._3) == best, s"doc $d top-1")
    }
  }

  test("collocations: PMI recount from raw counts, support floor, ordered") {
    val out = TextPipeline.collocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    // driver recount of all three count tables
    val docs = Tables.documents(spark, dir).select("text").as[String].collect()
      .map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = uni.values.sum
    val bis = docs.filter(_.size >= 2).flatMap(ws => ws.zip(ws.tail))
    val nb = bis.size.toLong
    val cb = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { case (bigram, cab, pmi) =>
      assert(cab >= 5, s"$bigram below support floor")
      val Array(w1, w2) = bigram.split(" ", 2)
      assert(cb((w1, w2)) == cab, s"$bigram count")
      val expect = BigDecimal(math.log(
        ((cab.toDouble * nt) * nt) / ((nb.toDouble * uni(w1)) * uni(w2))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - expect) < 1e-9, s"$bigram pmi $pmi vs $expect")
    }
    // ordering: pmi desc, bigram asc — and the cut is the true top slice
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
      case _ =>
    }
    // NOTE cb.toSeq first: collect-to-pairs on a Map would key by pmi and
    // silently collapse equal-PMI bigrams
    val all = cb.toSeq.collect { case ((w1, w2), c) if c >= 5 =>
      (BigDecimal(math.log(((c.toDouble * nt) * nt) /
        ((nb.toDouble * uni(w1)) * uni(w2))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, w1 + " " + w2)
    }.toSeq.sortBy { case (p, bg) => (-p, bg) }.take(100)
    assert(out.map(o => (o._3, o._1)).toSeq == all)
  }

  test("priority sample: exact E-S weighted bottom-k vs driver recomputation") {
    val out = TextPipeline.prioritySample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 100)
    // recompute every doc's priority on the driver and take the true 100
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect()
    def md5p64(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val all = docs.map { case (id, text) =>
      val w = math.max(text.toLowerCase.split("\\s+").count(_.nonEmpty), 1).toLong
      val u = (md5p64(id.toString) % 1000000L + 1L).toDouble / 1000001.0
      (id, w, -math.log(u) / w.toDouble)
    }.sortBy { case (id, _, p) => (p, id) }.take(100)
    assert(out.map(_._1).toSeq == all.map(_._1).toSeq, "selected ids")
    out.zip(all).foreach { case ((_, w, pr), (_, ew, ep)) =>
      assert(w == ew)
      assert(math.abs(pr - BigDecimal(ep).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // weighting sanity: the sample over-represents long docs vs uniform
    val meanSel = out.map(_._2).sum.toDouble / out.length
    val corpusMean = docs.map(d =>
      math.max(d._2.toLowerCase.split("\\s+").count(_.nonEmpty), 1)).sum.toDouble / docs.length
    assert(meanSel > corpusMean, s"weighted draw should skew long: $meanSel <= $corpusMean")
  }

  test("normalize stats: removed = raw−norm, changed flag consistent, idempotent") {
    val out = TextPipeline.normalizeStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == Tables.documents(spark, dir).count())
    def norm(t: String): String =
      t.replaceAll("[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
        .replaceAll("[ \\t]+", " ").trim
    val texts = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    out.foreach { case (id, raw, nl, removed, changed) =>
      val t = texts(id)
      val n = norm(t)
      assert(raw == t.length && nl == n.length && removed == raw - nl)
      assert(changed == (if (n != t) 1L else 0L))
      assert(norm(n) == n, "normalization must be idempotent")
    }
    // the pass must bite on dirty input (constructed, since the corpus is clean)
    assert(norm("ab  c\td ") == "ab c d")
  }

  test("compression ratio: matches direct per-row Deflater, ranks text compressibility") {
    val out = TextPipeline.compressionRatio(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val texts = Tables.documents(spark, dir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.length == texts.size)
    def deflate(s: String): (Long, Long) = {
      val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6, false)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192); var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      (raw.length.toLong, n)
    }
    out.foreach { case (id, raw, comp, ratio, bucket) =>
      val (eRaw, eComp) = deflate(texts(id))
      assert(raw == eRaw && comp == eComp, s"doc $id bytes")
      val eRatio = math.rint(eComp.toDouble / math.max(eRaw, 1).toDouble * 1e6) / 1e6
      assert(ratio == eRatio && bucket == math.floor(eRatio * 10).toLong)
    }
    // ordering sanity at matched length: repeated-char padding compresses
    // far below prose, which compresses below seeded-random bytes
    val pad = deflate("a" * 2000)
    val rnd = new scala.util.Random(7)
    val blobBytes = new Array[Byte](1500); rnd.nextBytes(blobBytes)
    val blob = deflate(java.util.Base64.getEncoder.encodeToString(blobBytes).take(2000))
    val pr = deflate(texts.values.toSeq.sortBy(_.length).reverse.mkString(" ").take(2000))
    assert(pad._2.toDouble / pad._1 < pr._2.toDouble / pr._1)
    assert(pr._2.toDouble / pr._1 < blob._2.toDouble / blob._1)
  }

  test("KS two-sample: exact sup-gap vs driver ECDFs, detects a shifted cohort") {
    val Array(row) = TextPipeline.ksLengths(spark, dir).collect()
    val docs = Tables.documents(spark, dir).select("source", "text")
      .as[(String, String)].collect()
      .map { case (s, t) =>
        (if (s.length == 4) "a" else "b",
          t.toLowerCase.split("\\s+").count(_.nonEmpty).toLong) }
    val a = docs.filter(_._1 == "a").map(_._2).sorted
    val b = docs.filter(_._1 == "b").map(_._2).sorted
    def ecdf(xs: Array[Long], x: Long): Double = {
      // count of elements <= x
      var lo = 0; var hi = xs.length
      while (lo < hi) { val m = (lo + hi) >>> 1; if (xs(m) <= x) lo = m + 1 else hi = m }
      lo.toDouble / xs.length
    }
    val values = (a ++ b).distinct
    val dmax = values.map(v => math.abs(ecdf(a, v) - ecdf(b, v))).max
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    assert(math.abs(row.getDouble(2) - dmax) < 1e-6)
    val crit = 1.358 * math.sqrt((a.length + b.length).toDouble /
      (a.length.toDouble * b.length.toDouble))
    assert(math.abs(row.getDouble(3) - crit) < 1e-6)
    assert(row.getLong(4) == (if (dmax > crit) 1L else 0L))
    // sensitivity: the op's statistic machinery flags an injected shift —
    // identical cohorts give D=0, a disjoint shift gives D=1
    assert(values.map(v => math.abs(ecdf(a, v) - ecdf(a, v))).max == 0.0)
    val shifted = a.map(_ + 100000L)
    assert(values.concat(shifted).distinct
      .map(v => math.abs(ecdf(a, v) - ecdf(shifted, v))).max == 1.0)
  }

  private def r6(x: Double) =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // in-order fold mirroring the graft_dot / graft_norm kernels
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def normD(a: Array[Double]): Double = math.sqrt(dotD(a, a))

  test("silhouette: same partition as kmeans_assign, bounded values, ordered quality") {
    val ed = sf("embeddings")
    val sil = graft.pipeline.Similarity.kmeansSilhouette(spark, ed).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val km = graft.pipeline.Similarity.kmeansAssign(spark, ed)
      .groupBy(col("cluster")).count().as[(Long, Long)].collect().toMap
    // the audit must describe the IDENTICAL partition the assignment made
    assert(sil.view.mapValues(_._1).toMap == km,
      "per-cluster sizes diverge from kmeans_assign")
    assert(sil.values.map(_._1).sum == Tables.embeddings(spark, ed).count())
    sil.values.foreach { case (_, s) => assert(s >= -1.0 && s <= 1.0) }
    // simplified silhouette vs the NEAREST centroid is non-negative by
    // construction (b >= a for every point); a strictly-positive mean
    // somewhere is the non-degenerate-signal floor
    assert(sil.values.forall(_._2 >= 0.0))
    assert(sil.values.exists(_._2 > 0.0), "silhouette signal collapsed to zero")
  }

  test("fisher scores: full driver recomputation under the same rounding contract") {
    val ed = sf("embeddings")
    val got = graft.pipeline.Similarity.embeddingFisher(spark, ed).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val rows = Tables.embeddings(spark, ed).select("label", "embedding")
      .as[(Int, Array[Float])].collect()
      .map { case (l, e) => (l, e.map(_.toDouble)) }
    val dims = rows.head._2.length
    // engine shape: decimal(28,12) exact sum, cast double FIRST, then /n
    def decMean(vs: Seq[Double]): Double = r6(
      vs.map(v => BigDecimal.valueOf(v).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / vs.length)
    (0 until dims).foreach { d =>
      val byLab = rows.groupBy(_._1).view.mapValues(_.map(_._2(d)).toSeq).toMap
      val gmu = decMean(rows.map(_._2(d)).toSeq)
      val mus = byLab.view.mapValues(vs => decMean(vs)).toMap
      def dec10(x: Double) = BigDecimal.valueOf(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      val within = r6(byLab.map { case (l, vs) =>
        vs.map(v => dec10(r6((v - mus(l)) * (v - mus(l))))).sum
      }.sum.toDouble)
      val between = r6(byLab.map { case (l, vs) =>
        dec10(r6(vs.length * (mus(l) - gmu) * (mus(l) - gmu)))
      }.sum.toDouble)
      val fisher = if (within == 0.0) 0.0 else r6(between / within)
      val (gb, gw, gf) = got(d.toLong)
      assert(gb == between && gw == within && gf == fisher,
        s"dim $d: got ($gb,$gw,$gf) want ($between,$within,$fisher)")
    }
    // the labeled synthetic corpus must show SOME discriminative dimension,
    // else the score is vacuous on its own test data
    assert(got.values.exists(_._3 > 0.0), "no dimension carries label signal")
  }

  test("k-center sample: greedy farthest-point replays exactly on the driver") {
    val ed = sf("embeddings")
    val got = graft.pipeline.Similarity.kcenterSample(spark, ed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val embs = Tables.embeddings(spark, ed).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
    val nrm = embs.view.mapValues(normD).toMap
    def dist(a: Long, b: Long): Double =
      1.0 - r6(dotD(embs(a), embs(b)) / (nrm(a) * nrm(b)))
    var sel = Vector(0L)
    val want = scala.collection.mutable.ArrayBuffer((1L, 0L, 0.0))
    while (sel.size < 8) {
      val (nid, md) = embs.keys.filterNot(sel.contains).toSeq
        .map(c => c -> sel.map(s => dist(c, s)).min)
        .minBy { case (id, m) => (-m, id) }
      want += ((sel.size + 1L, nid, r6(md)))
      sel = sel :+ nid
    }
    assert(got.toSeq == want.toSeq, s"greedy traversal diverged:\n$got\nvs\n$want")
    // diversity property: every chosen pair is farther apart than the
    // LAST pick's covering radius (the Gonzalez 2-approx invariant)
    val lastMd = want.last._3
    for (a <- sel; b <- sel if a < b)
      assert(dist(a, b) >= lastMd - 1e-9, s"picks $a,$b closer than final radius")
  }
}
