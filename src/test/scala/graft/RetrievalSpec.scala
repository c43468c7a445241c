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
}
