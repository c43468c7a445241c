package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DWM order-wide pipeline (`app/dwm/OrderWideApp.java`) in streaming mode:
  * two fact streams joined by an event-time interval join (J1), then
  * enriched against static dimension tables via broadcast joins (J3 — the
  * reference's 6 chained async Phoenix/Redis lookups, here hash probes in
  * codegen), landed to the wide-fact sink.
  *
  * Watermarks on both stream sides bound the join state exactly like
  * Flink's interval-join state retention (`OrderWideApp.java:99-107`).
  */
class OrderWideJob(spark: SparkSession, outDir: String) {

  /** Topic transport (S3/S4): kafka code path when a broker is configured,
    * parquet-dir replay otherwise — `utils/MyKafkaUtil.java:46-55`.
    */
  val topics = new graft.sources.Topics(spark, outDir)

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** The join+enrich transform, shared verbatim by batch parity tests. */
  def transform(orders: DataFrame, lineitem: DataFrame,
                customer: DataFrame, nation: DataFrame): DataFrame = {
    val joined = orders.join(lineitem,
      expr("""l_orderkey = o_orderkey AND
              l_shipdate >= o_orderdate AND
              l_shipdate <= o_orderdate + INTERVAL 30 DAYS"""))
    joined
      // customer scales with the corpus: size-gated hint (nation is a
      // fixed-cardinality dim, its unconditional hint is safe)
      .join(graft.operators.Scale.maybeBroadcast(
          customer.select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("o_orderkey"), col("l_linenumber"), col("o_orderdate"),
        col("l_shipdate"), col("o_totalprice"), col("l_extendedprice"),
        col("c_name"), col("n_name"))
  }

  def start(ordersTopic: String, lineitemTopic: String, dimDir: String,
            checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val orders = topics.readStream(ordersTopic, ordersSchema)
      .withWatermark("o_orderdate", "0 seconds")
    val lineitem = topics.readStream(lineitemTopic, lineitemSchema)
      .withWatermark("l_shipdate", "0 seconds")
    val customer = graft.Tables.customer(spark, dimDir) // static side, re-read per batch
    val nation = graft.Tables.nation(spark, dimDir)

    topics.writeStream(transform(orders, lineitem, customer, nation),
        "order_wide", checkpointDir)
      .start()
  }
}
