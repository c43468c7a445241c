package graft

import graft.pipeline.Graph

/** PageRank over the customer↔supplier transaction graph. */
class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("pagerank: integer pico-unit iterations replay driver-side; mass conserved") {
    val d = sf("lineitem")
    val got = Graph.pageRank(spark, d)
      .as[(String, Double)].collect().toMap

    // rebuild the graph and replay 3 iterations with the same integer ops
    val pairs = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (c, s) =>
      Seq((s"c$c", s"s$s"), (s"s$s", s"c$c")) }
    val od = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = edges.map(_._1).distinct
    val n = nodes.length.toLong
    def halfUp(num: Long, den: Long): Long = (2 * num + den) / (2 * den)
    val U = 1000000000000L
    val teleport = halfUp(15L * U / 100L, n)
    var pr = nodes.map(_ -> halfUp(U, n)).toMap
    for (_ <- 1 to 3) {
      val su = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case (src, dst) =>
        su(dst) = su.getOrElse(dst, 0L) + halfUp(pr(src), od(src)) }
      pr = nodes.map(nd => nd ->
        (teleport + halfUp(85L * su.getOrElse(nd, 0L), 100L))).toMap
    }
    val want = pr.view.mapValues(_.toDouble / 1e12).toMap
    assert(got.size == n)
    assert(got == want,
      s"diverging nodes: ${got.filter { case (k, v) => want(k) != v }.take(5)}")

    // damped-walk invariants: positive everywhere, mass ≈ 1 (6dp rounding
    // drift only), and the floor (1−d)/n is respected
    assert(got.values.forall(_ > 0))
    val mass = got.values.sum
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass drifted: $mass")
    val floor = 0.15 / n
    assert(got.values.forall(_ >= floor - 1e-6))
    // high-degree entities outrank the minimum-degree floor dwellers
    val maxDeg = od.maxBy(_._2)._1
    assert(got(maxDeg) > got.values.min)
  }

  test("triangles: degree-oriented enumeration replays the brute-force count") {
    val d = sf("lineitem")
    val got = Graph.triangles(spark, d)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // brute-force driver replay: adjacency sets, per-vertex closed wedges
    val pl = Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val edgeSet = pl.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edgeSet.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    adj.foreach { case (v, nb) =>
      val deg = nb.size.toLong
      val tri = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => edgeSet(if (a < b) (a, b) else (b, a)) }.toLong
      val coeff = if (deg >= 2)
        BigDecimal(2.0 * tri / (deg.toDouble * (deg - 1).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      val (gd, gt, gc) = got(v)
      assert(gd == deg && gt == tri && gc == coeff,
        s"part $v: got ($gd,$gt,$gc) want ($deg,$tri,$coeff)")
    }
    assert(got.keySet == adj.keySet)
    // the fixture actually exercises triangles
    assert(got.values.map(_._2).sum > 0, "fixture has no triangles")
  }

  test("declined-broadcast fallback is semantics-free: shuffled-hash closing join equals broadcast") {
    // past the measured-broadcast gate the triangle closing join plans as a
    // shuffled-hash build of the oriented edge set (the ≥60× sweep path) —
    // the gate bound must change the JOIN STRATEGY, never the triangles
    val d = sf("lineitem")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val viaBroadcast = rows(Graph.triangles(spark, d))
    spark.conf.set(graft.operators.Scale.BroadcastGateConf, "1") // decline everything
    try {
      val declined = Graph.triangles(spark, d)
      assert(rows(declined) == viaBroadcast)
      // executed AFTER collect so AQE's final plan is the one inspected
      assert(declined.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
        "gate at 1 byte must route the closing join to shuffled-hash")
    } finally spark.conf.unset(graft.operators.Scale.BroadcastGateConf)
  }

  test("checkpoint storage level is semantics-free: DISK_ONLY equals default") {
    // the ≥40× sweep legs run the graph operators with DISK_ONLY reused
    // frames (Scale.checkpointed) — the conf must change WHERE checkpoint
    // blocks live, never what any operator computes
    val d = sf("lineitem")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val triDefault = rows(Graph.triangles(spark, d))
    val prDefault = rows(Graph.pageRank(spark, d))
    spark.conf.set(graft.operators.Scale.CheckpointLevelConf, "DISK_ONLY")
    try {
      assert(rows(Graph.triangles(spark, d)) == triDefault)
      assert(rows(Graph.pageRank(spark, d)) == prDefault)
    } finally spark.conf.unset(graft.operators.Scale.CheckpointLevelConf)
  }
}
