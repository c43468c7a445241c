package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.operators.{Layout, Scale}

/** Layout / table-management operators + the salted exact-distinct. */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  // reference bit-interleave, written independently of the Column version
  private def zRef(a: Long, b: Long): Long =
    (0 until Layout.ZBits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zInterleave matches the scalar Morton reference on random keys") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", Layout.zInterleave($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == zRef(a, b), s"($a,$b)") }
  }

  test("zorder key: zbucket is the top-5-bit range of zval") {
    val out = Layout.zorderKey(spark, d)
      .select($"zval", $"zbucket").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (z, bkt) => assert(bkt == (z >> 27), s"z=$z") }
  }

  test("zorderLayout range-partitions disjointly on the Z-value") {
    val laid = Layout.zorderLayout(Tables.lineitem(spark, d), "l_partkey", "l_suppkey",
      buckets = 8)
    val ranges = laid
      .select(spark_partition_id().as("pid"),
        Layout.zInterleave($"l_partkey", $"l_suppkey").as("z"))
      .groupBy($"pid").agg(min($"z").as("lo"), max($"z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // clustering quality: rows near in BOTH dims share a partition, so the
    // number of partitions a small 2-D box touches stays O(1). The pid must
    // be captured BEFORE the box filter (a filter projected after a
    // nondeterministic spark_partition_id cannot be pushed below it —
    // filtering first would range-partition only the box rows).
    // box = ~3% of rows (sf0.001 keys: l_partkey<200, l_suppkey<10)
    val boxParts = laid
      .select(spark_partition_id().as("pid"), $"l_partkey", $"l_suppkey")
      .filter($"l_partkey" < 16 && $"l_suppkey" < 4)
      .select($"pid").distinct().count()
    assert(boxParts <= 2, s"2-D box scattered over $boxParts partitions")
  }

  test("profileColumns reads the table exactly once") {
    val prof = Layout.profileColumns(spark, d)
    val rows = prof.collect()
    assert(rows.length == 5)
    val plan = prof.queryExecution.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => 1
      case other => other.children.map(scans).sum +
        other.subqueries.map(scans).sum
    }
    assert(scans(plan) == 1, s"expected a single scan:\n$plan")
    // spot-check one row against direct aggregation
    val li = Tables.lineitem(spark, d)
    val flag = rows.find(_.getString(0) == "l_returnflag").get
    assert(flag.getLong(1) == li.filter($"l_returnflag".isNotNull).count())
    assert(flag.getLong(2) ==
      li.select($"l_returnflag").distinct().count())
  }

  test("bloom-pruned semi join is exact and the bloom genuinely prunes") {
    val got = graft.operators.Relational.bloomPruneSemiJoin(spark, d)
      .orderBy($"l_returnflag").as[(String, Long, Double)].collect().toSeq
    val o = Tables.orders(spark, d)
      .filter($"o_orderstatus" === "F" && $"o_totalprice" > 200000.0)
      .select($"o_orderkey")
    val want = Tables.lineitem(spark, d)
      .join(o, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("line_ct"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy($"l_returnflag").as[(String, Long, Double)].collect().toSeq
    assert(got == want)
    // the pre-filter must pass all true matches and drop most non-matches
    val li = Tables.lineitem(spark, d)
    val bloom = o.agg(call_function("graft_bloom_agg", $"o_orderkey", lit(1000000L)))
      .head.getAs[Array[Byte]](0)
    val kept = li.filter(
      call_function("graft_bloom_might_contain", lit(bloom), $"l_orderkey")).count()
    val trueMatches = li.join(o, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    val total = li.count()
    assert(kept >= trueMatches, "bloom must have no false negatives")
    assert(kept < total / 2, s"bloom kept $kept of $total — not pruning")
  }

  test("bucketed join: SMJ with zero join-side exchanges, one agg exchange total") {
    val d = "/root/testdata/sf0.001"
    val df = graft.operators.Layout.bucketedJoin(spark, d)
    df.collect()
    // AQE's toString appends the Initial Plan after the Final one — scope
    // the exchange count to the plan that actually ran
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), s"bucketed join lost SMJ:\n$plan")
    // the ONLY exchange is the final priority aggregate — the join itself
    // reads partitioning-aligned bucketed scans
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"bucketed join must be shuffle-free up to the final agg:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"scans not bucketed:\n$plan")
    // results equal the plain parquet join (bucketing is layout, not semantics)
    val want = graft.Tables.lineitem(spark, d)
      .join(graft.Tables.orders(spark, d), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("line_ct"),
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .as[(String, Long, Double)].collect().toSet
    assert(df.as[(String, Long, Double)].collect().toSet == want)
    // second call reuses the session's tables (write-once marker)
    val marker = spark.conf.getOption("graft.layout.bucketedDir")
    graft.operators.Layout.bucketedJoin(spark, d).collect()
    assert(spark.conf.getOption("graft.layout.bucketedDir") == marker)
  }

  test("partitioned layout: month predicate prunes to one directory") {
    val d = "/root/testdata/sf0.001"
    val df = graft.operators.Layout.partitionPrunedMonth(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("PartitionFilters") && plan.contains("ship_month#"),
      s"month predicate not a partition filter:\n$plan")
    // the written layout has many month dirs, exactly one matching — and
    // that single directory holds exactly the rows the query aggregates,
    // so the PartitionFilters above read one directory of dozens
    val base = spark.conf.get("graft.layout.partitionedDir").split('#')(1)
    val dirs = new java.io.File(s"$base/lineitem").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_ == "ship_month=1997-03") == 1 && dirs.length > 10, dirs.mkString(","))
    val prunedRows = spark.read.parquet(s"$base/lineitem/ship_month=1997-03").count()
    val aggRows = df.as[(String, Long, Double)].collect().map(_._2).sum
    assert(aggRows == prunedRows,
      s"month dir holds $prunedRows rows but the query counted $aggRows")
    // layout must not change semantics
    val want = graft.Tables.lineitem(spark, d)
      .filter(date_format($"l_shipdate", "yyyy-MM") === "1997-03")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("line_ct"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .as[(String, Long, Double)].collect().toSet
    assert(df.as[(String, Long, Double)].collect().toSet == want)
    // second call reuses the written layout
    val marker = spark.conf.getOption("graft.layout.partitionedDir")
    graft.operators.Layout.partitionPrunedMonth(spark, d).collect()
    assert(spark.conf.getOption("graft.layout.partitionedDir") == marker)
  }

  test("dynamic partition pruning: dim-side quarter filter prunes the fact scan at runtime") {
    val d = "/root/testdata/sf0.001"
    val df = graft.operators.Layout.dppQuarterJoin(spark, d)
    val rows = df.as[(String, Long, Double)].collect()
    // the quarter's three months, via the dim join, no literal on the fact
    assert(rows.map(_._1).sorted.toSeq == Seq("1997-01", "1997-02", "1997-03"))
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan carries no runtime partition pruning subquery:\n$plan")
    // semantics: per-month rows replay against the unpartitioned table
    val want = graft.Tables.lineitem(spark, d)
      .filter(date_format($"l_shipdate", "yyyy-MM").isin("1997-01", "1997-02", "1997-03"))
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("m"))
      .agg(count(lit(1)).cast("long"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(rows.toSet == want)
  }

  test("expectation suite: one row per rule, violations replay, denominators cover") {
    val d = "/root/testdata/sf0.001"
    val got = graft.operators.Layout.expectations(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 7)
    val lineCt = graft.Tables.lineitem(spark, d).count()
    val orderCt = graft.Tables.orders(spark, d).count()
    // denominators are the full checked populations
    assert(got("lineitem.l_quantity.range_1_50")._2 == lineCt)
    assert(got("lineitem.l_discount.max_0.07")._2 == lineCt)
    assert(got("orders.o_custkey.fk_customer")._2 == orderCt)
    // clean-by-construction rules pass; the tight range genuinely fails
    assert(got("lineitem.l_quantity.range_1_50")._1 == 0L)
    assert(got("orders.o_orderkey.unique")._1 == 0L)
    assert(got("orders.o_custkey.fk_customer")._1 == 0L)
    assert(got("documents.n_chars.positive")._1 == 0L)
    assert(got("events.value.nonnull")._1 == 0L)
    val discViol = graft.Tables.lineitem(spark, d).filter($"l_discount" > 0.07).count()
    assert(discViol > 0 && got("lineitem.l_discount.max_0.07")._1 == discViol)
    val negBal = graft.Tables.supplier(spark, d).filter($"s_acctbal" < 0).count()
    assert(got("supplier.s_acctbal.nonnegative")._1 == negBal)
  }

  test("saltedDistinctCount is exact, including on a single hot key") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(5000)(("hot", rnd.nextInt(700).toLong)) ++
      Seq.fill(200)(("cold", rnd.nextInt(40).toLong))
    val df = rows.toDF("k", "u")
    val got = Scale.saltedDistinctCount(df, "k", "u", salt = 16, outCol = "n")
      .as[(String, Long)].collect().toMap
    val want = df.groupBy($"k").agg(countDistinct($"u").cast("long"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("skewProfile matches a driver recomputation and bounds hold") {
    val Array(row) = Layout.skewProfile(spark, d).collect()
    val counts = Tables.events(spark, d).groupBy($"user_id").count()
      .as[(Long, Long)].collect()
    val n = counts.length.toLong
    val total = counts.map(_._2).sum
    val mx = counts.map(_._2).max
    // rank identity Gini over counts sorted (count asc, key asc)
    val sorted = counts.sortBy { case (k, c) => (c, k) }
    val ws = sorted.zipWithIndex.map { case ((_, c), i) => (i + 1).toLong * c }.sum
    val gini = BigDecimal(2.0 * ws / (n.toDouble * total.toDouble) - (n + 1).toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) == n && row.getLong(1) == total && row.getLong(2) == mx)
    assert(row.getDouble(3) == BigDecimal(mx.toDouble / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(row.getDouble(4) - gini) < 1e-9)
    assert(row.getLong(5) == (mx * n + total - 1) / total)
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) < 1.0)
    assert(row.getLong(5) >= 1L)
  }

  test("benfordAudit: digit shares recount, Benford expectations sum to 1") {
    val rows = Layout.benfordAudit(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val prices = Tables.lineitem(spark, d).select("l_extendedprice")
      .as[Double].collect()
    val hist = prices.map(p => p.toLong.toString.head.asDigit)
      .filter(_ >= 1).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = hist.values.sum
    assert(rows.map(_._1).toSet == hist.keySet.map(_.toLong))
    rows.foreach { case (dig, n, obs, exp, dev) =>
      assert(n == hist(dig.toInt))
      val eObs = BigDecimal(n.toDouble / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val eExp = BigDecimal(math.log(1.0 + 1.0 / dig) / math.log(10.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(obs == eObs && exp == eExp)
      assert(math.abs(dev - math.abs(obs - exp)) < 1e-9)
    }
    // Benford expectation is a proper distribution over 1..9
    val full = (1 to 9).map(dd => math.log(1.0 + 1.0 / dd) / math.log(10.0)).sum
    assert(math.abs(full - 1.0) < 1e-12)
  }
}
