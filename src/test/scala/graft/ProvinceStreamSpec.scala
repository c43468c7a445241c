package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** A3 streaming: windowed stats with HLL distinct vs the exact batch
  * oracle — counts within HLL tolerance, money sums exact.
  */
class ProvinceStreamSpec extends SparkSpecBase {

  test("streaming province stats ≈ batch (HLL counts, exact sums)") {
    val d = "/root/testdata/sf0.001"
    val src = Files.createTempDirectory("ps_src").toString
    val enriched = Tables.orders(spark, d)
      .join(broadcast(Tables.customer(spark, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("o_orderkey"),
        // watermarks require TIMESTAMP (LTZ); testdata parquet reads as NTZ
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_totalprice"), col("n_name"))
    enriched.write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(enriched.schema).parquet(src)
    val q = StreamOps.a3ProvinceStats(stream)
      .writeStream.format("memory").queryName("ps_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ps_out").collect()
      .map(r => (r.getString(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    val exact = graft.operators.Relational.a3ProvinceStats(spark, d).collect()
      .map(r => (r.getString(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap

    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, (cnt, amt)) =>
      val (gCnt, gAmt) = got(k)
      assert(gAmt == amt, s"money must be exact for $k: $gAmt vs $amt")
      assert(math.abs(gCnt - cnt) <= math.max(2L, (cnt * 0.15).toLong),
        s"HLL count out of tolerance for $k: $gCnt vs $cnt")
    }
  }

  test("streaming DAU ≈ batch active-users (HLL tolerance per day)") {
    val d = "/root/testdata/sf0.001"
    val src = Files.createTempDirectory("dau_src").toString
    // watermarks require TIMESTAMP (LTZ); testdata parquet reads as NTZ
    Tables.events(spark, d)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    val q = StreamOps.a18DailyActive(stream)
      .writeStream.format("memory").queryName("dau_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dau_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.operators.LogPipeline.a18ActiveUsers(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (day, dau) =>
      assert(math.abs(got(day) - dau) <= math.max(2L, (dau * 0.15).toLong),
        s"HLL DAU out of tolerance for $day: ${got(day)} vs $dau")
    }
  }

  test("streaming product stats ≈ batch (HLL distinct users, exact sums)") {
    val d = "/root/testdata/sf0.001"
    val src = Files.createTempDirectory("a2_src").toString
    val ev = Tables.events(spark, d)
      // watermarks require TIMESTAMP (LTZ); testdata parquet reads as NTZ
      .select(col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("user_id"), col("value"))
    ev.write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    val q = StreamOps.a2ProductStats(stream)
      .writeStream.format("memory").queryName("a2_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("a2_out").collect()
      .map(r => (r.getString(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    val exact = graft.operators.LogPipeline.a2ProductStats(spark, d).collect()
      .map(r => (r.getString(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4), r.getLong(5))).toMap

    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, (cnt, amt, tot)) =>
      val (gCnt, gAmt, gTot) = got(k)
      assert(gAmt == amt && gTot == tot, s"sums/counts must be exact for $k")
      assert(math.abs(gCnt - cnt) <= math.max(2L, (cnt * 0.15).toLong),
        s"HLL distinct out of tolerance for $k: $gCnt vs $cnt")
    }
  }
}
