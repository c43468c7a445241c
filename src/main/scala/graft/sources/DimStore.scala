package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed dimension store — the Spark rendering of the reference's
  * Phoenix/HBase dim tables + Redis cache (S8/S9:
  * `app/function/DimSinkFunction.java:21-77`,
  * `TableProcessFunction.java:66-122`, `utils/DimUtil.java:13-45`).
  *
  * Upserts land via `foreachBatch`; the read side is a plain scan that a
  * fact-stream join broadcasts — Catalyst's broadcast hash join replaces
  * the whole async/Redis/thread-pool point-lookup machinery, and "cache
  * invalidation" disappears because each micro-batch re-reads the store.
  *
  * Storage is last-write-wins keyed parquet (a Delta/Iceberg MERGE in a
  * real deployment; the upsert contract is identical).
  */
class DimStore(spark: SparkSession, basePath: String) {

  private def path(table: String) = s"$basePath/$table"

  /** Upsert a batch of rows keyed by `keyCol`, versioned by `versionCol`
    * (highest version wins; version ties broken deterministically by a
    * whole-row hash so repeated runs of the same input converge).
    */
  def upsert(table: String, batch: DataFrame, keyCol: String, versionCol: String): Unit = {
    val existing = read(table)
    val merged = existing match {
      case Some(cur) => cur.unionByName(batch, allowMissingColumns = true)
      case None      => batch
    }
    val rowHash = xxhash64(merged.columns.map(col).toIndexedSeq: _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc, rowHash.asc)
    val deduped = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // two-phase write: parquet can't overwrite its own input in place
    val tmp = path(table) + "__tmp"
    deduped.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path(table))
    val tmpDir = new java.io.File(tmp)
    java.nio.file.Files.walk(tmpDir.toPath)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }

  def read(table: String): Option[DataFrame] =
    if (new java.io.File(path(table)).exists) Some(spark.read.parquet(path(table)))
    else None

  /** Point lookup — test/debug convenience mirroring `DimUtil.getDimInfo`;
    * production joins the whole store via broadcast instead.
    */
  def lookup(table: String, keyCol: String, key: Any): Array[org.apache.spark.sql.Row] =
    read(table).map(_.filter(col(keyCol) === lit(key)).collect()).getOrElse(Array.empty)
}

/** S5 analog: dynamic per-row topic routing
  * (`utils/MyKafkaUtil.java:29-38`, used `BaseDBApp.java:93-99`): rows
  * carry their destination in a column; the sink writes each group to its
  * own path/topic. With a real Kafka sink this is just the `topic` column;
  * the file rendering is `partitionBy` — one directory per sink table.
  */
object DynamicTopicSink {
  def write(df: DataFrame, outDir: String, topicCol: String = "sink_table"): Unit =
    df.write.mode(SaveMode.Append).partitionBy(topicCol).parquet(outDir)
}
