package graft

import graft.pipeline.{Retrieval, Similarity}

class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("BM25 more-like-this: shape, self-exclusion, monotone ranks, determinism") {
    val got = Retrieval.bm25MoreLikeThis(spark, d)
      .select("query_id", "doc_id", "rnk", "bm25")
      .as[(Long, Long, Long, Double)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet)
    // full top-10 per query, contiguous ranks, no seed doc retrieving itself
    assert(byQ.values.forall(_.map(_._3).sorted.toSeq == (1L to 10L)))
    assert(got.forall(r => r._1 != r._2))
    // scores non-increasing along the ranking; all positive (every hit
    // shares >= 1 query term and the Lucene idf form is non-negative)
    byQ.values.foreach { rs =>
      val ordered = rs.sortBy(_._3).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
      assert(ordered.forall(_ > 0.0))
    }
    // bit-determinism across plans (decimal partial sums, 6dp contract)
    val again = Retrieval.bm25MoreLikeThis(spark, d)
      .select("query_id", "doc_id", "rnk", "bm25")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("hybrid RRF: fused set within the legs' union, both-leg docs outrank single-leg tails") {
    val depth = 20
    val dense = Similarity.bruteForceTopK(spark, d, 10, depth)
      .select("query_id", "neighbor_id", "rnk").as[(Long, Long, Long)].collect()
    val sparse = Retrieval.bm25MoreLikeThis(spark, d, 10, k = depth)
      .select("query_id", "doc_id", "rnk").as[(Long, Long, Long)].collect()
    val fused = Retrieval.hybridRrf(spark, d)
      .select("query_id", "doc_id", "rnk", "rrf").as[(Long, Long, Long, Double)].collect()
    val union = (dense.map(r => (r._1, r._2)) ++ sparse.map(r => (r._1, r._2))).toSet
    assert(fused.map(r => (r._1, r._2)).toSet.subsetOf(union))
    assert(fused.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == (1L to 10L)))
    // rrf bounds: one leg contributes at most 1/61, two legs at most 2/61
    assert(fused.forall(r => r._4 > 0.0 && r._4 <= 2.0 / 61.0 + 1e-9))
    // any doc present in BOTH legs beats any doc present in only one leg
    // whose best single-leg rank is no better — RRF's defining property
    val inBoth = (dense.map(r => (r._1, r._2)).toSet
      intersect sparse.map(r => (r._1, r._2)).toSet)
    val fusedScore = fused.map(r => ((r._1, r._2), r._4)).toMap
    val singleMax = 1.0 / 61.0 // best possible one-leg score (rank 1)
    inBoth.foreach { k =>
      fusedScore.get(k).foreach(s => assert(s > 1.0 / (60.0 + depth) ,
        s"both-leg doc $k scored $s, below the two-leg floor"))
    }
    // at least one query actually fuses evidence from both legs
    assert(inBoth.nonEmpty && fused.exists(r => r._4 > singleMax + 1e-9))
  }

  test("rerank: scores candidates only, exact cosine, stage-2 order replayed") {
    val d = "/root/testdata/sf0.001"
    val cands = graft.pipeline.Retrieval.hybridRrf(spark, d, k = 10)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    val got = graft.pipeline.Retrieval.rerankTopK(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    // stage 2 never scores outside the stage-1 candidate list
    assert(got.map(r => (r._1, r._2)).toSet.subsetOf(cands))
    // rerank scores are the exact embedding cosine, and the final order is
    // the driver re-sort of the candidate scores
    val vecs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = cands.toSeq.map { case (q, dd) => (q, dd, cos(vecs(q), vecs(dd))) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy { case (_, dd, c) => (-c, dd) }.take(5).zipWithIndex
          .map { case ((q, dd, c), i) => (q, dd, (i + 1).toLong, c) }
      }.toSet
    assert(got.toSet == want,
      s"only-got=${got.toSet -- want}\nonly-want=${want -- got.toSet}")
  }

  test("retrieval eval: hit recount from the ranking, metric bounds, capped recall") {
    import graft.pipeline.Retrieval
    val eval = Retrieval.retrievalEval(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(eval.map(_._1).toSet == (0L until 10L).toSet, "one row per query")
    val ranked = Retrieval.bm25MoreLikeThis(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val src = Tables.documents(spark, d).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val srcCt = src.values.groupBy(identity).view.mapValues(_.size).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    eval.foreach { case (q, hits, nRel, p, rec) =>
      val wantHits = ranked.count { case (qq, dd) => qq == q && src(dd) == src(q) }
      assert(hits == wantHits, s"query $q hits")
      assert(nRel == srcCt(src(q)) - 1, s"query $q n_rel")
      assert(p == r6(hits / 10.0) && p >= 0.0 && p <= 1.0)
      assert(rec == r6(hits.toDouble / math.min(nRel, 10L)) && rec <= 1.0)
    }
  }

  test("phrase match: adjacency recount on the driver, self-hit present, order matters") {
    val d = "/root/testdata/sf0.001"
    val got = graft.pipeline.Retrieval.phraseMatch(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
      .toMap
    val want = (for {
      (qid, qtoks) <- docs.toSeq if qid < 10 && qtoks.length >= 2
      (w1, w2) = (qtoks(0), qtoks(1))
      (did, dtoks) <- docs.toSeq
      n = dtoks.sliding(2).count { case Seq(a, b) => a == w1 && b == w2; case _ => false }
      if n > 0
    } yield (qid, did) -> n.toLong).toMap
    assert(got == want, s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    // every query with >= 2 tokens contains its own phrase
    docs.filter { case (id, t) => id < 10 && t.length >= 2 }.keys.foreach { qid =>
      assert(got.contains((qid, qid)), s"query $qid missing its self-hit")
    }
    // order sensitivity: bag-of-words co-occurrence strictly exceeds
    // adjacency somewhere, else the positional join proved nothing
    val bagPairs = (for {
      (qid, qtoks) <- docs.toSeq if qid < 10 && qtoks.length >= 2
      (did, dtoks) <- docs.toSeq
      if dtoks.contains(qtoks(0)) && dtoks.contains(qtoks(1))
    } yield (qid, did)).toSet
    assert(got.keySet.subsetOf(bagPairs))
    assert(got.keySet.size < bagPairs.size,
      "adjacency == co-occurrence on this corpus — phrase test vacuous")
  }
}
