package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Where a topic's data physically lives: the resolved reader/writer
  * configuration as DATA, so specs can assert the kafka wiring without a
  * broker (none exists in the test container) and jobs can apply it
  * mechanically.
  */
case class TopicSource(format: String, options: Map[String, String],
                       path: Option[String])
case class TopicSink(format: String, options: Map[String, String],
                     path: Option[String], partitionCols: Seq[String])

/** Topic-addressed transport — the Spark rendering of the reference's
  * `MyKafkaUtil` (`utils/MyKafkaUtil.java:46-55` consumer, `:25-38` fixed
  * and dynamic producers): every layer hop (ODS→DWD→DWM→DWS) is a named
  * topic. With a broker configured (`spark.graft.kafka.bootstrap`, or the
  * `broker` constructor arg) a topic resolves to the real
  * `.format("kafka")` code path — `subscribe` on the read side, `topic`
  * option (or per-row `topic` COLUMN for the dynamic S5 sink) on the
  * write side, values as JSON-encoded rows. Without a broker it resolves
  * to the parquet-dir replay contract the tests run (dir ≈ topic; a topic
  * named by absolute path maps to that directory).
  *
  * Delivery semantics in kafka mode: at-least-once producers +
  * idempotent/keyed consumers downstream. This is a deliberate DIVERGENCE
  * from the reference, whose dynamic producer is transactional —
  * `FlinkKafkaProducer.Semantic.EXACTLY_ONCE` at `utils/MyKafkaUtil.java:37`
  * (its fixed-topic producer at `:25` is the at-least-once default).
  * Rationale: Spark's Kafka sink has no two-phase-commit hook tied to the
  * checkpoint, so producer-side transactions cannot span a micro-batch
  * retry; the engine instead makes every downstream consumer keyed and
  * idempotent (dim upserts, batch-dir publishes) — the end-to-end result
  * the reference's transactions buy, by the means Spark supports. For
  * brokers that enforce transactional producers, set
  * `spark.graft.kafka.transactional.id`: the sinks then pass
  * `kafka.transactional.id` (+ `kafka.enable.idempotence`) through to the
  * producer config — per-connection transactions, not checkpoint-spanning.
  */
class Topics(spark: SparkSession, baseDir: String, broker: Option[String] = None) {

  def resolvedBroker: Option[String] =
    broker.orElse(Option(spark.conf.get("spark.graft.kafka.bootstrap", "")).filter(_.nonEmpty))

  private def dirOf(topic: String): String =
    if (topic.startsWith("/")) topic else s"$baseDir/$topic"

  /** Producer-side transactional options (see class doc): empty unless
    * `spark.graft.kafka.transactional.id` is configured.
    */
  private def txnOptions: Map[String, String] =
    Option(spark.conf.get("spark.graft.kafka.transactional.id", ""))
      .filter(_.nonEmpty)
      .map(id => Map("kafka.transactional.id" -> id,
        "kafka.enable.idempotence" -> "true"))
      .getOrElse(Map.empty)

  def source(topic: String): TopicSource = resolvedBroker match {
    case Some(b) => TopicSource("kafka", Map(
      "kafka.bootstrap.servers" -> b,
      "subscribe" -> topic,
      "startingOffsets" -> "earliest",
      // a compacted/expired offset must fail the query loud, not skip data
      "failOnDataLoss" -> "true"), None)
    case None => TopicSource("parquet", Map.empty, Some(dirOf(topic)))
  }

  def sink(topic: String): TopicSink = resolvedBroker match {
    case Some(b) => TopicSink("kafka",
      Map("kafka.bootstrap.servers" -> b, "topic" -> topic) ++ txnOptions,
      None, Seq.empty)
    case None => TopicSink("parquet", Map.empty, Some(dirOf(topic)), Seq.empty)
  }

  /** S5 dynamic sink: destination per ROW. Kafka routes on a `topic`
    * column (no fixed `topic` option — `MyKafkaUtil.java:29-38`'s
    * per-record topic serializer); the dir rendering is `partitionBy`.
    */
  def dynamicSink(topicCol: String, dir: String): TopicSink = resolvedBroker match {
    case Some(b) => TopicSink("kafka",
      Map("kafka.bootstrap.servers" -> b) ++ txnOptions, None, Seq(topicCol))
    case None => TopicSink("parquet", Map.empty, Some(dir), Seq(topicCol))
  }

  /** Streaming read of a topic, rows restored to `schema`. Kafka mode
    * parses the JSON `value` payload; dir mode reads the parquet "topic".
    */
  def readStream(topic: String, schema: StructType): DataFrame = {
    val s = source(topic)
    s.format match {
      case "kafka" =>
        val reader: DataStreamReader =
          s.options.foldLeft(spark.readStream.format("kafka")) {
            case (r, (k, v)) => r.option(k, v)
          }
        reader.load()
          .select(from_json(col("value").cast("string"), schema).as("v"))
          .select(col("v.*"))
      case _ => spark.readStream.schema(schema).parquet(s.path.get)
    }
  }

  /** Configure (not start) a streaming write to a fixed topic. Kafka mode
    * JSON-encodes the row into `value`.
    */
  def writeStream(df: DataFrame, topic: String, checkpointDir: String): DataStreamWriter[Row] = {
    val s = sink(topic)
    val w = s.format match {
      case "kafka" =>
        val encoded = df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
        s.options.foldLeft(encoded.writeStream.format("kafka")) {
          case (wr, (k, v)) => wr.option(k, v)
        }
      case _ => df.writeStream.format("parquet").option("path", s.path.get)
    }
    w.option("checkpointLocation", checkpointDir).outputMode("append")
  }

  /** S7 JDBC batch sink resolution — the reference's ClickHouse
    * `foreachBatch` JDBC writes (`utils/ClickHouseUtil.java`): with
    * `spark.graft.jdbc.url` configured the batch goes through
    * `DataFrameWriter.jdbc` (append; driver class from
    * `spark.graft.jdbc.driver` if set); otherwise to the parquet dir the
    * tests read. Same shape as the kafka flag: the wiring exists and is
    * spec-assertable without a database in the container.
    *
    * Replay idempotence: `foreachBatch` is at-least-once, and a plain
    * append replayed after a crash double-counts — so when the caller
    * passes its `batchId`, every row is stamped with a `graft_batch_id`
    * provenance column and the write is delete-then-insert per batch id
    * (the DELETE is a no-op on the first attempt and removes a crashed
    * attempt's partial rows on replay). The reference leans on
    * ClickHouse's ReplacingMergeTree for the same property; stamping the
    * batch id makes the contract engine-side and portable to any JDBC
    * target. Callers without a batch id (ad-hoc exports) get the plain
    * append, documented at-least-once.
    */
  def resolvedJdbcUrl: Option[String] =
    Option(spark.conf.get("spark.graft.jdbc.url", "")).filter(_.nonEmpty)

  /** Case-insensitive existence probe via connection metadata — decides
    * whether a failed pre-append DELETE is the benign missing-table case
    * (no-op) or a real error that must fail the batch. Case-insensitive
    * because unquoted identifiers fold differently per database (H2/Oracle
    * upper-case, Postgres lower-cases), so an exact-pattern `getTables`
    * probe could miss a table that exists.
    */
  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    val simple = table.split("\\.").last
    val rs = conn.getMetaData.getTables(null, null, "%", null)
    try {
      var found = false
      while (!found && rs.next()) found = simple.equalsIgnoreCase(rs.getString(3))
      found
    } finally rs.close()
  }

  def writeBatchJdbc(df: DataFrame, table: String, dir: String,
                     batchId: Long = -1L): Unit =
    resolvedJdbcUrl match {
      case Some(url) =>
        val props = new java.util.Properties()
        val driverClass =
          Option(spark.conf.get("spark.graft.jdbc.driver", "")).filter(_.nonEmpty)
        driverClass.foreach(props.setProperty("driver", _))
        val out =
          if (batchId >= 0) df.withColumn("graft_batch_id", lit(batchId))
          else df
        if (batchId >= 0) {
          // the 'driver' property is only meaningful to DataFrameWriter.jdbc;
          // DriverManager needs the class loaded (and thereby registered) —
          // it is configured precisely when the driver does NOT
          // self-register via ServiceLoader
          driverClass.foreach(Class.forName)
          // driver-side single-statement cleanup; the table may not exist
          // yet (first-ever batch against a fresh target)
          val conn = java.sql.DriverManager.getConnection(url, props)
          try {
            val st = conn.createStatement()
            // DELETE failures on an EXISTING table must propagate: a
            // swallowed failure (permissions, lock timeout, a target that
            // rejects DELETE) followed by the append would silently
            // double-count the replayed batch — the exact corruption the
            // delete-then-insert contract exists to prevent. Only the
            // missing-table case (first-ever batch against a fresh target)
            // is a legitimate no-op: recognized by SQLState (42S02
            // MySQL-family / 42P01 Postgres) or, for drivers with other
            // codes, a case-insensitive metadata probe showing the table
            // absent.
            try st.executeUpdate(s"DELETE FROM $table WHERE graft_batch_id = $batchId")
            catch {
              case e: java.sql.SQLException =>
                val missingState = Set("42S02", "42P01").contains(e.getSQLState)
                if (!missingState) {
                  // probe ambiguity is fatal: if the metadata probe itself
                  // fails, the DELETE failure cannot be classified as the
                  // benign missing-table case — rethrow the ORIGINAL error
                  // (probe failure attached as suppressed) rather than
                  // risk a silently double-counted replay
                  val absent =
                    try !tableExists(conn, table)
                    catch { case probe: Throwable => e.addSuppressed(probe); throw e }
                  if (!absent) throw e
                }
            } finally st.close()
          } finally conn.close()
        }
        out.write.mode(org.apache.spark.sql.SaveMode.Append).jdbc(url, table, props)
      case None =>
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/$table")
    }

  /** Batch (foreachBatch) write through a dynamic sink: rows carry their
    * destination in `topicCol`. Kafka mode keys messages by the topic
    * column and JSON-encodes the rest; dir mode partitions by it.
    */
  def writeBatchDynamic(df: DataFrame, topicCol: String, dir: String): Unit = {
    val s = dynamicSink(topicCol, dir)
    s.format match {
      case "kafka" =>
        val payload = df.columns.filterNot(_ == topicCol).map(col).toIndexedSeq
        val encoded = df.select(col(topicCol).as("topic"), to_json(struct(payload: _*)).as("value"))
        s.options.foldLeft(encoded.write.format("kafka")) {
          case (wr, (k, v)) => wr.option(k, v)
        }.save()
      case _ =>
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy(s.partitionCols: _*).parquet(s.path.get)
    }
  }
}
