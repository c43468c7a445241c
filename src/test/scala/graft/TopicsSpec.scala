package graft

import org.apache.spark.sql.types._
import graft.sources.Topics

/** S3/S4/S5 kafka wiring: no broker exists in the container, so the specs
  * assert the RESOLUTION — the format + options a topic maps to in each
  * mode — which is exactly the part that differs between the parquet-dir
  * replay contract and a real deployment. The dir-mode data path is
  * exercised end-to-end by WarehouseJobSpec/OrderWideJobSpec.
  */
class TopicsSpec extends SparkSpecBase {

  private val schema = StructType(Seq(StructField("x", LongType)))

  test("dir mode (no broker): topics resolve to parquet dirs; absolute paths pass through") {
    val t = new Topics(spark, "/base")
    assert(t.resolvedBroker.isEmpty)
    val s = t.source("ods_log")
    assert(s.format == "parquet" && s.path.contains("/base/ods_log"))
    assert(t.source("/abs/dir").path.contains("/abs/dir"))
    val k = t.sink("dwd_page_log")
    assert(k.format == "parquet" && k.path.contains("/base/dwd_page_log"))
    val d = t.dynamicSink("sink_table", "/base/facts")
    assert(d.format == "parquet" && d.partitionCols == Seq("sink_table"))
  }

  test("kafka mode: source subscribes, sink targets the topic, dynamic sink routes per row") {
    val t = new Topics(spark, "/base", broker = Some("broker:9092"))
    val s = t.source("ods_log")
    assert(s.format == "kafka")
    assert(s.options("kafka.bootstrap.servers") == "broker:9092")
    assert(s.options("subscribe") == "ods_log")
    assert(s.options("failOnDataLoss") == "true", "missing offsets must fail loud")
    assert(s.path.isEmpty)

    val k = t.sink("dwd_page_log")
    assert(k.format == "kafka" && k.options("topic") == "dwd_page_log")

    // S5: dynamic sink has NO fixed topic option — destination is the
    // per-row `topic` column (MyKafkaUtil.java:29-38's record serializer)
    val d = t.dynamicSink("sink_table", "/unused")
    assert(d.format == "kafka" && !d.options.contains("topic"))
  }

  test("broker can come from spark.graft.kafka.bootstrap conf") {
    spark.conf.set("spark.graft.kafka.bootstrap", "conf-broker:9092")
    try {
      val t = new Topics(spark, "/base")
      assert(t.resolvedBroker.contains("conf-broker:9092"))
      assert(t.source("x").format == "kafka")
    } finally spark.conf.set("spark.graft.kafka.bootstrap", "")
  }

  test("jobs construct their sources through Topics: kafka mode flips the code path") {
    spark.conf.set("spark.graft.kafka.bootstrap", "broker:9092")
    try {
      val wh = new graft.streaming.WarehouseJob(spark, "/tmp/unused_wh")
      assert(wh.topics.source("ods").format == "kafka")
      val ow = new graft.streaming.OrderWideJob(spark, "/tmp/unused_ow")
      assert(ow.topics.source("orders").format == "kafka")
      assert(ow.topics.sink("order_wide").options("topic") == "order_wide")
      val pw = new graft.streaming.PaymentWideJob(spark, "/tmp/unused_pw")
      assert(pw.topics.source("payments").format == "kafka")
    } finally spark.conf.set("spark.graft.kafka.bootstrap", "")
  }

  test("jdbc-mode batch sink goes through DataFrameWriter.jdbc (fails only at driver lookup)") {
    import spark.implicits._
    spark.conf.set("spark.graft.jdbc.url", "jdbc:nosuchdb://nowhere/stats")
    try {
      val t = new Topics(spark, "/base")
      assert(t.resolvedJdbcUrl.contains("jdbc:nosuchdb://nowhere/stats"))
      // no JDBC driver for the scheme exists in the container: the write
      // must get as far as java.sql.DriverManager — proving .jdbc is
      // genuinely wired, not just described
      val e = intercept[Exception] {
        t.writeBatchJdbc(Seq((1L, "a")).toDF("k", "v"), "stats", "/unused")
      }
      def messages(x: Throwable): Seq[String] =
        if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ messages(x.getCause)
      assert(messages(e).exists(m =>
        m.toLowerCase.contains("driver") || m.toLowerCase.contains("jdbc")),
        s"expected JDBC driver lookup failure, got: ${messages(e).mkString(" | ")}")
    } finally spark.conf.set("spark.graft.jdbc.url", "")
  }

  test("kafka-mode readStream builds a kafka DataStreamReader (fails only at broker lookup)") {
    // no kafka connector jar in the container: constructing the reader via
    // the kafka code path must get as far as the DataSource lookup —
    // proving .format("kafka") is genuinely wired, not just described
    val t = new Topics(spark, "/base", broker = Some("broker:9092"))
    val e = intercept[Exception] { t.readStream("ods_log", schema) }
    def messages(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ messages(x.getCause)
    assert(messages(e).exists(m => m.toLowerCase.contains("kafka")),
      s"expected kafka data-source lookup failure, got: ${messages(e).mkString(" | ")}")
  }
}
