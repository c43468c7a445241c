package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Scale-posture specs: shuffle placement and skew handling — the
  * properties that decide whether a plan survives 100× data.
  */
class ScaleSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a dropped catalog entry can leave its managed location behind (e.g.
    // fresh metastore over an old warehouse dir) — clear the paths too
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Tables.orders(spark, sf("orders")).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, sf("lineitem")).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      $"l_orderkey" === $"o_orderkey")
    // co-located (bucketed) join: no Exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        Tables.lineitem(spark, sf("lineitem")).join(
          Tables.orders(spark, sf("orders")), $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
  }

  test("salted join returns exactly the plain-join rows under skew") {
    // pathological skew: 90% of probe rows share one key
    val probe = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong % 50, i))
      .toDF("k", "v")
    val build = (0L to 60L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = probe.join(build, "k")
    val salted = Scale.saltedJoin(probe, build, "k", salt = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "v", "name").collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString(",")))
    val b = salted.select("k", "v", "name").collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString(",")))
    assert(a.toSeq == b.toSeq)
  }

  test("co-partitioned frames join with reused partitioning") {
    val (l, r) = Scale.coPartitioned(
      Tables.lineitem(spark, sf("lineitem")).select("l_orderkey", "l_quantity"),
      Tables.orders(spark, sf("orders")).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "l_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = l.join(r, "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // exactly the two explicit repartitions — the join itself adds none
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 2, s"expected 2 explicit exchanges, plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
  }
}
