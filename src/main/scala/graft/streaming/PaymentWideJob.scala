package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DWM payment-wide pipeline (`app/dwm/PaymentWideApp.java`): the SECOND
  * stage of the reference's chained stream-stream topology — payment
  * events interval-joined against the order-wide stream that
  * `OrderWideJob` lands ("dwm_order_wide" Kafka topic there, the
  * order_wide parquet dir here; parquet-dir-as-topic per SURVEY §7.0).
  *
  * Reference bounds are `[-15 min, +5 s]` relative to payment time
  * (`PaymentWideApp.java:77-85`: a payment joins the order created up to
  * 15 minutes before it); the testdata timeline is day-scaled, so the
  * defaults here are `[-15 days, +5 days]` — the same asymmetric shape at
  * the data's natural granularity, overridable per call.
  */
class PaymentWideJob(spark: SparkSession, outDir: String) {

  /** Topic transport (S3/S4) — kafka when a broker is configured. */
  val topics = new graft.sources.Topics(spark, outDir)

  val paymentSchema: StructType = StructType(Seq(
    StructField("pay_id", LongType), StructField("p_orderkey", LongType),
    StructField("pay_ts", TimestampType), StructField("pay_amount", DoubleType)))

  val orderWideSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("o_orderdate", TimestampType), StructField("l_shipdate", TimestampType),
    StructField("o_totalprice", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("c_name", StringType), StructField("n_name", StringType)))

  /** The join transform, shared verbatim by the batch parity test. */
  def transform(payments: DataFrame, orderWide: DataFrame,
                lower: String = "15 days", upper: String = "5 days"): DataFrame =
    payments.join(orderWide,
      expr(s"""o_orderkey = p_orderkey AND
               o_orderdate >= pay_ts - INTERVAL $lower AND
               o_orderdate <= pay_ts + INTERVAL $upper"""))
      .select(col("pay_id"), col("p_orderkey"), col("pay_ts"), col("pay_amount"),
        col("l_linenumber"), col("o_orderdate"), col("o_totalprice"),
        col("c_name"), col("n_name"))

  def start(paymentsTopic: String, orderWideTopic: String,
            checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val payments = topics.readStream(paymentsTopic, paymentSchema)
      .withWatermark("pay_ts", "0 seconds")
    val orderWide = topics.readStream(orderWideTopic, orderWideSchema)
      .withWatermark("o_orderdate", "0 seconds")

    topics.writeStream(transform(payments, orderWide), "payment_wide", checkpointDir)
      .start()
  }
}
