package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Mining

/** Corpus-mining operators: margin-based bitext pairs + blocked ER. */
class MiningSpec extends SparkSpecBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("bitext pairs are cross-lingual, unique per source, and margin-consistent") {
    val out = Mining.bitextMarginPairs(spark, d).collect()
    assert(out.nonEmpty)
    // one row per source doc
    val srcs = out.map(_.getLong(0))
    assert(srcs.distinct.length == srcs.length)
    // all pairs leave the source language (targets are the en leg)
    assert(out.forall(_.getString(1) != "en"))
    out.foreach { r =>
      val (cos, margin) = (r.getDouble(3), r.getDouble(4))
      assert(cos >= 0.3)
      assert(margin >= 0.0, "top-1 must beat the runner-up") // ties → 0
    }
  }

  test("bitext margin equals top1 - top2 against a brute recomputation") {
    val emb = Tables.embeddings(spark, d)
    val docs = Tables.documents(spark, d).select($"doc_id", $"lang")
    val vecs = emb.join(docs, $"vec_id" === $"doc_id")
      .select($"vec_id", $"lang", $"embedding").as[(Long, String, Array[Float])]
      .collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dp / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val tgts = vecs.filter(_._2 == "en")
    val expect = vecs.filter(_._2 != "en").map { case (sid, _, se) =>
      val scored = tgts.map { case (tid, _, te) => (tid, cos(se, te)) }
        .sortBy { case (tid, c) => (-c, tid) }
      sid -> (scored(0), scored(1))
    }.toMap
    Mining.bitextMarginPairs(spark, d).collect().foreach { r =>
      val (top1, top2) = expect(r.getLong(0))
      assert(r.getLong(2) == top1._1, s"src ${r.getLong(0)}: wrong top-1")
      assert(math.abs(r.getDouble(3) - top1._2) < 1e-9)
      assert(math.abs(r.getDouble(4) - (top1._2 - top2._2)) < 1e-6)
    }
  }

  test("LSH bitext: top-1/margin correct over the multi-probe candidate set") {
    val emb = Tables.embeddings(spark, d)
    val dim = emb.select(size($"embedding")).head.getInt(0)
    val buckets = emb
      .select($"vec_id", graft.pipeline.Similarity.lshBucket($"embedding", 8, dim).as("b"))
      .as[(Long, Long)].collect().toMap
    val docs = Tables.documents(spark, d).select($"doc_id", $"lang")
    val vecs = emb.join(docs, $"vec_id" === $"doc_id")
      .select($"vec_id", $"lang", $"embedding").as[(Long, String, Array[Float])]
      .collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      BigDecimal(dp / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val en = vecs.filter(_._2 == "en")
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val out = graft.pipeline.Mining.bitextMarginPairsLsh(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val sid = r.getLong(0)
      val probes = (Set(buckets(sid)) ++ (0 until 8).map(f => buckets(sid) ^ (1L << f))).toSet
      val cands = en.filter(t => probes.contains(buckets(t._1)))
        .map(t => (t._1, cos(byId(sid), t._3)))
        .sortBy { case (tid, c) => (-c, tid) }
      assert(cands.nonEmpty && r.getLong(2) == cands.head._1,
        s"src $sid: wrong candidate top-1")
      assert(math.abs(r.getDouble(3) - cands.head._2) < 1e-9)
      if (cands.length >= 2)
        assert(math.abs(r.getDouble(4) - (cands(0)._2 - cands(1)._2)) < 1e-6)
      else assert(r.isNullAt(4), "single-candidate source must carry a null margin")
    }
  }

  test("sorted-neighborhood ER stays in-window and finds cross-block matches") {
    val out = Mining.erSortedNeighborhood(spark, d).collect()
    assert(out.nonEmpty)
    val ranked = Tables.customer(spark, d)
      .select($"c_custkey", $"c_name").as[(Long, String)].collect()
      .sortBy { case (k, n) => (n, k) }.zipWithIndex
      .map { case ((k, _), i) => k -> (i + 1) }.toMap
    out.foreach { r =>
      val (ra, rb) = (ranked(r.getLong(0)), ranked(r.getLong(1)))
      assert(rb > ra && rb <= ra + 4, s"pair out of window: ranks $ra,$rb")
      assert(r.getLong(4) <= 2)
    }
    // the point of SNM: it crosses hard blocking keys — at least one found
    // pair must span two nations (a pair erBlockedPairs cannot emit)
    val nations = Tables.customer(spark, d)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    assert(out.exists(r => nations(r.getLong(0)) != nations(r.getLong(1))),
      "no cross-block pair found — window blocking adds nothing here")
  }

  test("ER entities: pair endpoints co-labeled, min-key labels, singletons self-labeled") {
    val entities = Mining.erEntities(spark, d).as[(Long, Long)].collect().toMap
    val pairs = Mining.erBlockedPairs(spark, d)
      .select($"a_key", $"b_key").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(entities(a) == entities(b), s"pair ($a,$b) split across entities")
    }
    // every label is the minimum key of its member set
    entities.groupBy(_._2).foreach { case (lab, members) =>
      assert(members.keys.min == lab)
    }
    // records with no match pair keep their own key
    val matched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    entities.foreach { case (k, lab) =>
      if (!matched.contains(k)) assert(lab == k, s"singleton $k relabeled $lab")
    }
  }

  test("blocked ER verifies only within-block pairs at the set distance") {
    val out = Mining.erBlockedPairs(spark, d).collect()
    assert(out.nonEmpty)
    val nations = Tables.customer(spark, d)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical pair order")
      assert(nations(r.getLong(0)) == nations(r.getLong(1)), "cross-block pair leaked")
      assert(r.getLong(4) == lev(r.getString(2), r.getString(3)).toLong)
      assert(r.getLong(4) <= 2)
    }
  }

  test("assoc rules: confidence/lift replay driver-side; rules come in directed twins") {
    import spark.implicits._
    val d = sf("lineitem")
    val rules = graft.pipeline.Mining.assocRules(spark, d, minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rules.nonEmpty)
    // driver replay
    val pl = graft.Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_partkey").distinct().as[(Long, Long)].collect()
    val nB = pl.map(_._1).distinct.length.toDouble
    val supp = pl.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCt = pl.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rules.foreach { case (a, c, ct, conf, lift) =>
      val key = if (a < c) (a, c) else (c, a)
      assert(pairCt(key) == ct && ct >= 2)
      assert(conf == r6(ct.toDouble / supp(a)))
      assert(lift == r6(ct.toDouble * nB / (supp(a).toDouble * supp(c).toDouble)))
    }
    // every undirected pair appears exactly twice, once per direction,
    // with identical lift (lift is symmetric)
    rules.groupBy { case (a, c, _, _, _) => if (a < c) (a, c) else (c, a) }
      .foreach { case (_, twins) =>
        assert(twins.length == 2)
        assert(twins.map(_._5).distinct.length == 1, "lift must be symmetric")
      }
  }

  test("sequential rules: gap-3 pair counts replay, all leads share one Window node") {
    val d = sf("events")
    val got = Mining.seqRules(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // all three leads must plan into a single Window node
    val plan = Mining.seqRules(spark, d).queryExecution.executedPlan.toString
    assert(plan.split("\\bWindow\\b").length - 1 == 1,
      s"gap leads must share one Window node:\n$plan")
    // driver replay: per-user (ts, event_id)-ordered sequences, pairs
    // within 3 positions
    val ev = graft.Tables.events(spark, d)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
    val want = scala.collection.mutable.Map[(String, String), Long]()
    ev.groupBy(_._1).foreach { case (_, rs) =>
      val seq = rs.sortBy(r => (r._3.toString, r._4)).map(_._2)
      for (i <- seq.indices; j <- (i + 1) to math.min(i + 3, seq.length - 1))
        want((seq(i), seq(j))) = want.getOrElse((seq(i), seq(j)), 0L) + 1
    }
    val anteCt = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case ((a, c), (ct, conf)) =>
      assert(ct == want((a, c)), s"($a,$c): $ct vs ${want((a, c))}")
      val wantConf = BigDecimal(ct.toDouble / anteCt(a))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(conf == wantConf, s"($a,$c) confidence $conf vs $wantConf")
    }
  }

  test("contrastive triplets: positives are pairs, negatives are md5-argmin non-neighbors") {
    import graft.pipeline.{Dedup, Mining}
    val trip = Mining.contrastiveTriplets(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(trip.nonEmpty)
    val pairs = Dedup.ngramJaccardPrefix(spark, d).as[(Long, Long, Double)].collect()
    val sym = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .map(p => (p._1, p._2) -> p._3).toMap
    val docs = Tables.documents(spark, d).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    trip.foreach { case (a, p, n, j) =>
      assert(sym.get((a, p)).contains(j), s"($a,$p) not a near-dup pair")
      assert(docs(n) == docs(a), s"negative $n crosses source for anchor $a")
      assert(n != a && !sym.contains((a, n)), s"negative $n is self/neighbor of $a")
      // deterministic pick: md5 argmin over the anchor's eligible block
      val want = docs.collect {
        case (c, src) if src == docs(a) && c != a && !sym.contains((a, c)) =>
          (md5hex(s"$a:$c"), c)
      }.toSeq.min._2
      assert(n == want, s"anchor $a negative $n vs argmin $want")
    }
    // every direction of every pair whose anchor has an eligible negative
    val anchorsWithNeg = trip.map(_._1).toSet
    sym.keys.filter(k => anchorsWithNeg(k._1)).foreach { case (a, b) =>
      assert(trip.exists(t => t._1 == a && t._2 == b), s"missing triplet ($a,$b)")
    }
  }

  test("golden records: partition of the key set, per-rule driver recount") {
    import graft.pipeline.Mining
    val dir = sf("customer")
    val labels = Mining.erEntities(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val golden = Mining.erGoldenRecords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getLong(5)))
    // one golden row per entity, members partition the customer key set
    assert(golden.map(_._1).distinct.length == golden.length)
    assert(golden.map(_._2).sum == labels.size)
    assert(golden.map(_._1).toSet == labels.values.toSet)
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        r.getString(3)))
    val byEntity = cust.groupBy(c => labels(c._1))
    golden.foreach { case (ent, nMembers, canon, bestName, totBal, nSegs) =>
      val ms = byEntity(ent)
      assert(nMembers == ms.length, s"entity $ent size")
      assert(canon == ms.map(_._1).min, s"entity $ent canonical")
      // richest member wins, min-key tie-break
      val want = ms.sortBy(c => (-c._3, c._1)).head._2
      assert(bestName == want, s"entity $ent best_name")
      assert(math.abs(totBal - ms.map(_._3).sum.toDouble) < 1e-6, s"entity $ent balance")
      assert(nSegs == ms.map(_._4).distinct.length, s"entity $ent segments")
    }
  }
}
