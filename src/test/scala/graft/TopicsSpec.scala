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

  test("transactional producer plumbing: sinks pass kafka.transactional.id when configured") {
    val t = new Topics(spark, "/base", broker = Some("broker:9092"))
    // default posture: at-least-once + idempotent consumers (the documented
    // divergence from MyKafkaUtil.java:37's EXACTLY_ONCE) — no txn options
    assert(!t.sink("x").options.contains("kafka.transactional.id"))
    assert(!t.dynamicSink("sink_table", "/unused").options.contains("kafka.transactional.id"))
    spark.conf.set("spark.graft.kafka.transactional.id", "graft-producer-1")
    try {
      val k = t.sink("dwd_page_log")
      assert(k.options("kafka.transactional.id") == "graft-producer-1")
      assert(k.options("kafka.enable.idempotence") == "true")
      val d = t.dynamicSink("sink_table", "/unused")
      assert(d.options("kafka.transactional.id") == "graft-producer-1")
      assert(d.options("kafka.enable.idempotence") == "true")
    } finally spark.conf.set("spark.graft.kafka.transactional.id", "")
  }

  private def failureChain(x: Throwable): Seq[Throwable] =
    if (x == null) Seq.empty
    else x +: (x.getSuppressed.toSeq.flatMap(failureChain) ++ failureChain(x.getCause))

  test("jdbc delete-swallow: unrecognized SQLState on an existing table propagates") {
    import spark.implicits._
    MockJdbc.register
    MockJdbc.deleteState = "XX000" // not a recognized missing-table state
    MockJdbc.probeThrows = false
    MockJdbc.metaTables = Seq("STATS") // probe sees the table: DELETE really failed
    spark.conf.set("spark.graft.jdbc.url", MockJdbc.url)
    try {
      val t = new Topics(spark, "/base")
      val e = intercept[Exception] {
        t.writeBatchJdbc(Seq((1L, "a")).toDF("k", "v"), "stats", "/unused", batchId = 3L)
      }
      assert(failureChain(e).exists(_.getMessage == "mock DELETE rejected"),
        s"original DELETE failure must propagate, got: ${failureChain(e).map(_.getMessage)}")
    } finally spark.conf.set("spark.graft.jdbc.url", "")
  }

  test("jdbc delete-swallow: a failing metadata probe is fatal (original error rethrown)") {
    import spark.implicits._
    MockJdbc.register
    MockJdbc.deleteState = "XX000"
    MockJdbc.probeThrows = true // probe ambiguity: cannot classify the failure
    MockJdbc.metaTables = Seq.empty
    spark.conf.set("spark.graft.jdbc.url", MockJdbc.url)
    try {
      val t = new Topics(spark, "/base")
      val e = intercept[Exception] {
        t.writeBatchJdbc(Seq((1L, "a")).toDF("k", "v"), "stats", "/unused", batchId = 3L)
      }
      val chain = failureChain(e)
      assert(chain.exists(_.getMessage == "mock DELETE rejected"),
        s"ORIGINAL delete failure must surface, got: ${chain.map(_.getMessage)}")
      assert(chain.exists(_.getMessage == "mock metadata unavailable"),
        "probe failure must ride along as suppressed, not vanish")
    } finally spark.conf.set("spark.graft.jdbc.url", "")
  }

  test("jdbc delete-swallow: recognized missing-table SQLState is the one benign case") {
    import spark.implicits._
    MockJdbc.register
    MockJdbc.deleteState = "42S02" // MySQL-family missing table
    MockJdbc.probeThrows = true // must NOT be consulted for a recognized state
    MockJdbc.metaTables = Seq.empty
    MockJdbc.deleteAttempted = false
    spark.conf.set("spark.graft.jdbc.url", MockJdbc.url)
    try {
      val t = new Topics(spark, "/base")
      // the mock can't service Spark's append machinery, so SOME failure
      // follows — the contract under test is that the DELETE failure itself
      // was classified benign and did not propagate
      val e = intercept[Exception] {
        t.writeBatchJdbc(Seq((1L, "a")).toDF("k", "v"), "stats", "/unused", batchId = 3L)
      }
      assert(MockJdbc.deleteAttempted, "DELETE must have been attempted")
      assert(!failureChain(e).exists(_.getMessage == "mock DELETE rejected"),
        "recognized missing-table DELETE failure must be swallowed")
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

/** Minimal scriptable JDBC driver (reflective proxies for everything below
  * the `java.sql.Driver` entry point) so the delete-swallow contract in
  * `Topics.writeBatchJdbc` is spec-testable without a database: the DELETE
  * always fails with `deleteState`, the metadata probe either throws
  * (`probeThrows`) or reports `metaTables`.
  */
object MockJdbc {
  @volatile var deleteState: String = "XX000"
  @volatile var probeThrows: Boolean = false
  @volatile var metaTables: Seq[String] = Seq.empty
  @volatile var deleteAttempted: Boolean = false

  val url = "jdbc:graftmock:db"

  private def proxy[T](cls: Class[T])(pf: PartialFunction[(String, Seq[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader, Array[Class[_]](cls),
      new java.lang.reflect.InvocationHandler {
        def invoke(p: AnyRef, m: java.lang.reflect.Method, a: Array[AnyRef]): AnyRef = {
          val args: Seq[AnyRef] = if (a == null) Seq.empty else a.toSeq
          val key = (m.getName, args)
          if (pf.isDefinedAt(key)) pf(key)
          else m.getReturnType match {
            case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
            case java.lang.Integer.TYPE => Integer.valueOf(0)
            case java.lang.Long.TYPE    => java.lang.Long.valueOf(0L)
            case _                      => null
          }
        }
      }).asInstanceOf[T]

  private def tablesResultSet(): java.sql.ResultSet = {
    val it = metaTables.iterator
    var current: String = null
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        if (it.hasNext) { current = it.next(); java.lang.Boolean.TRUE }
        else java.lang.Boolean.FALSE
      case ("getString", Seq(i: Integer)) if i.intValue == 3 => current
    }
  }

  private[graft] def connection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("createStatement", Seq()) =>
        proxy(classOf[java.sql.Statement]) {
          case ("executeUpdate", Seq(_: String)) =>
            deleteAttempted = true
            throw new java.sql.SQLException("mock DELETE rejected", deleteState)
        }
      case ("getMetaData", _) =>
        proxy(classOf[java.sql.DatabaseMetaData]) {
          case ("getTables", _) =>
            if (probeThrows)
              throw new java.sql.SQLException("mock metadata unavailable", "08000")
            else tablesResultSet()
        }
    }

  /** Idempotent DriverManager registration (lazy val body runs once). The
    * driver itself is a real class, not a proxy — `DriverManager`'s
    * caller-classloader check must be able to resolve it by name.
    */
  lazy val register: Unit = java.sql.DriverManager.registerDriver(new MockJdbcDriver)
}

class MockJdbcDriver extends java.sql.Driver {
  override def acceptsURL(u: String): Boolean =
    u != null && u.startsWith("jdbc:graftmock:")
  override def connect(u: String, p: java.util.Properties): java.sql.Connection =
    if (acceptsURL(u)) MockJdbc.connection() else null
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(u: String, p: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
