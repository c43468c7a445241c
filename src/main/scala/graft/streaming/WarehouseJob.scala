package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.LogPipeline
import graft.sources.DimStore

/** End-to-end streaming warehouse: the reference's ODS→DWD→DWS topology as
  * ONE Structured Streaming query over a file-source "topic" (parquet dir ≈
  * Kafka topic, per SURVEY §7.0), with a `foreachBatch` fan-out that plays
  * the role of the reference's per-layer jobs:
  *
  *  - SP1 log split (`BaseLogApp.java:100-138`): one parent frame persisted,
  *    three filtered children to three sinks;
  *  - SP2/ST3 config routing (`TableProcessFunction.java:126-153` +
  *    broadcast state): the routing config is re-read every micro-batch —
  *    the Spark rendering of Flink broadcast-state refresh — and rows go to
  *    "kafka" (fact dirs) or "hbase" (DimStore upsert) accordingly;
  *  - A1 windowed stats (`VisitorStatsApp.java:127-168`) appended to the
  *    stats sink (S7's ClickHouse `foreachBatch` JDBC write, parquet here).
  *
  * Checkpointing (ST8): the query restarts from `checkpointDir`;
  * `foreachBatch` is at-least-once, so each batch writes to a batch-scoped
  * STAGING dir and is then published by renaming into a `batch=<id>`
  * partition dir under each sink (dirty/facts/stats). Publishing replaces
  * the target batch dir wholesale (delete-then-atomic-rename), so a replay
  * after a mid-batch crash rewrites the same batch dir instead of
  * appending duplicates; the `_committed_<id>` marker is just the fast-path
  * skip for the already-fully-committed case. Dim upserts are keyed and
  * idempotent, so replaying them is safe. Readers of the sinks see an
  * extra `batch` partition column recording provenance.
  *
  * Stats-sink contract: rows in `stats/` are PER-BATCH PARTIALS keyed by
  * (stt, edt, event_type) — the reference's incremental ClickHouse appends
  * behave the same way — so downstream consumers must re-aggregate
  * (sum the measures grouping by the key) when a window spans batches.
  */
class WarehouseJob(spark: SparkSession, outDir: String) {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Routing config — in the reference a MySQL `table_process` CDC feed; a
    * small table re-loadable per batch here (swap for a JDBC/Delta read in
    * production; the per-batch refresh IS the broadcast-state semantics).
    */
  def loadConfig(): DataFrame = {
    import spark.implicits._
    Seq(
      ("view", "kafka", "dwd_page_log"),
      ("click", "kafka", "dwd_click_log"),
      ("purchase", "hbase", "dim_order"),
      ("signup", "hbase", "dim_user"))
      .toDF("source_type", "sink_type", "sink_table")
  }

  /** Delete `dir` recursively if present. */
  private def rmTree(dir: java.io.File): Unit = {
    if (dir.isDirectory) dir.listFiles().foreach(rmTree)
    dir.delete(); ()
  }

  /** Publish one staged sink dir: replace the target batch dir wholesale
    * with an atomic rename (same filesystem), so replays are idempotent.
    */
  private def publish(src: java.io.File, dstBatchDir: java.io.File): Unit = {
    if (src.exists()) {
      rmTree(dstBatchDir)
      dstBatchDir.getParentFile.mkdirs()
      java.nio.file.Files.move(src.toPath, dstBatchDir.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
  }

  def start(sourceDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val dims = new DimStore(spark, s"$outDir/dim")
    val raw = spark.readStream.schema(eventSchema).parquet(sourceDir)

    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new java.io.File(s"$outDir/_committed_$batchId")
        if (marker.exists()) ()
        else {
        val staging = new java.io.File(s"$outDir/_staging/$batchId")
        rmTree(staging) // stale staging from a crashed prior attempt
        val ev = batch.persist() // SP1: one materialization, many children
        try {
          // DWD: parse + dirty split (P1)
          // try_cast: malformed $.k routes to dirty (null) instead of
          // throwing under ANSI — this branch exists to absorb dirty input.
          val parsed = ev.withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
          parsed.filter(col("k").isNull).write.mode(SaveMode.Overwrite)
            .parquet(s"$staging/dirty")
          val clean = parsed.filter(col("k").isNotNull)

          // SP2/ST3: config re-read + route (broadcast join, inner = drop unknown)
          val routed = clean.join(broadcast(loadConfig()),
            col("event_type") === col("source_type"))
          routed.filter(col("sink_type") === "kafka")
            .select("event_id", "ts", "user_id", "event_type", "value", "sink_table")
            .write.mode(SaveMode.Overwrite).partitionBy("sink_table")
            .parquet(s"$staging/facts") // S5: dynamic per-row topic
          routed.filter(col("sink_type") === "hbase")
            .groupBy(col("user_id"), col("sink_table"))
            .agg(max(col("ts")).as("ts"), count(lit(1)).as("cnt"))
            .collect() // tiny dim batches
            .groupBy(_.getString(1))
            .foreach { case (table, rows) =>
              import spark.implicits._
              val df = rows.toSeq
                .map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(3)))
                .toDF("user_id", "ts", "cnt")
              dims.upsert(table, df, "user_id", "ts") // S8: keyed upsert (idempotent)
            }

          // DWS: A1 visitor stats over the clean stream (per-batch PARTIAL
          // rows keyed by (stt,edt,event_type) — see class doc contract)
          LogPipeline.a1Transform(clean)
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/stats") // S7

          // Publish: batch-scoped dirs replaced wholesale → replay-safe.
          publish(new java.io.File(staging, "dirty"), new java.io.File(s"$outDir/dirty/batch=$batchId"))
          publish(new java.io.File(staging, "facts"), new java.io.File(s"$outDir/facts/batch=$batchId"))
          publish(new java.io.File(staging, "stats"), new java.io.File(s"$outDir/stats/batch=$batchId"))
          marker.getParentFile.mkdirs()
          marker.createNewFile()
          rmTree(staging)
        } finally ev.unpersist()
        }
        ()
      }
      .start()
  }
}
