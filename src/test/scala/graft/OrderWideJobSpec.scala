package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.OrderWideJob

/** DWM streaming parity: the stream-stream interval join + broadcast dim
  * enrichment must land the same wide rows the batch transform produces.
  */
class OrderWideJobSpec extends SparkSpecBase {

  test("streaming order-wide == batch join+enrich on the same inputs") {
    val d = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("ow_out").toString
    val ckpt = Files.createTempDirectory("ow_ckpt").toString
    val oSrc = Files.createTempDirectory("ow_orders").toString
    val lSrc = Files.createTempDirectory("ow_lines").toString
    Tables.orders(spark, d).write.mode("overwrite").parquet(oSrc)
    Tables.lineitem(spark, d).write.mode("overwrite").parquet(lSrc)

    val job = new OrderWideJob(spark, out)
    val q = job.start(oSrc, lSrc, d, ckpt)
    q.processAllAvailable()
    q.stop()

    val batch = job.transform(
      Tables.orders(spark, d), Tables.lineitem(spark, d),
      Tables.customer(spark, d), Tables.nation(spark, d))

    val got = spark.read.parquet(s"$out/order_wide")
    // stream side may retain trailing rows in state at end-of-stream (no
    // watermark past the max event time); everything emitted must be a
    // subset of batch, and coverage must be near-complete
    // the original testdata parquet reads as TIMESTAMP_NTZ, the re-staged
    // stream source as TIMESTAMP — normalize event-time cols to strings
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("l_shipdate", date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss"))
    val batchRows = norm(batch).collect().map(_.toSeq).toSet
    val gotRows = norm(got).collect().map(_.toSeq).toSet
    val extra = gotRows -- batchRows
    assert(gotRows.subsetOf(batchRows),
      s"streaming emitted ${extra.size} rows batch does not have, e.g.\n" +
        extra.take(3).mkString("\n") + "\nbatch sample:\n" +
        batchRows.take(3).mkString("\n"))
    assert(gotRows.size >= (batchRows.size * 9) / 10,
      s"stream coverage too low: ${gotRows.size}/${batchRows.size}")
    // enrichment reached the stream: joined dim columns are populated
    assert(got.filter(col("c_name").isNotNull).count() > 0)
    assert(got.filter(col("n_name").isNotNull).count() > 0)
  }
}
