package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{OrderWideJob, PaymentWideJob}

/** The reference's chained DWM topology end to end: orders ⋈ lineitem →
  * order_wide sink (stage 1, `OrderWideApp`), then payments ⋈ order_wide
  * → payment_wide sink (stage 2, `PaymentWideApp`) — two stream-stream
  * interval joins connected by a file topic, exactly the Kafka-mediated
  * chaining of the reference.
  */
class PaymentWideJobSpec extends SparkSpecBase {

  test("chained streaming: payments join the order-wide stream of stage 1") {
    val d = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("pw_out").toString
    val oSrc = Files.createTempDirectory("pw_orders").toString
    val lSrc = Files.createTempDirectory("pw_lines").toString
    val pSrc = Files.createTempDirectory("pw_pays").toString
    Tables.orders(spark, d).write.mode("overwrite").parquet(oSrc)
    Tables.lineitem(spark, d).write.mode("overwrite").parquet(lSrc)
    // payments derived from orders: one payment per 'F' order, 10 days out
    val payments = Tables.orders(spark, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("pay_id"), col("o_orderkey").as("p_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 10 DAYS")).cast("timestamp").as("pay_ts"),
        col("o_totalprice").as("pay_amount"))
    payments.write.mode("overwrite").parquet(pSrc)

    // stage 1: land order_wide
    val j1 = new OrderWideJob(spark, out)
    val q1 = j1.start(oSrc, lSrc, d, Files.createTempDirectory("pw_ck1").toString)
    q1.processAllAvailable(); q1.stop()

    // stage 2: consume the stage-1 sink as a topic
    val j2 = new PaymentWideJob(spark, out)
    val q2 = j2.start(pSrc, s"$out/order_wide", Files.createTempDirectory("pw_ck2").toString)
    q2.processAllAvailable(); q2.stop()

    val batch = j2.transform(
      spark.read.parquet(pSrc),
      spark.read.parquet(s"$out/order_wide"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pay_ts", date_format(col("pay_ts"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
    val batchRows = norm(batch).collect().map(_.toSeq).toSet
    val gotRows = norm(spark.read.parquet(s"$out/payment_wide")).collect().map(_.toSeq).toSet
    assert(gotRows.subsetOf(batchRows),
      s"streaming emitted rows batch does not have: ${(gotRows -- batchRows).take(3)}")
    assert(gotRows.size >= (batchRows.size * 9) / 10,
      s"stream coverage too low: ${gotRows.size}/${batchRows.size}")
    assert(batchRows.nonEmpty, "fixture produced no payment-wide rows")
    // stage-1 enrichment survived the second hop
    assert(spark.read.parquet(s"$out/payment_wide")
      .filter(col("c_name").isNotNull).count() > 0)
  }
}
