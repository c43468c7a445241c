package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Every load is a plain parquet scan so Catalyst's predicate pushdown and
  * column pruning reach the file source — downstream operators must NOT
  * cache/materialize these eagerly, or pushdown is lost. At 100 TB these
  * become partitioned-table scans; the API is the same.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses natively;
    * with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long,
    * converted here to a µs timestamp by integer division (truncation —
    * identical to DuckDB's CAST(ns AS TIMESTAMP)).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Round-robin repartition to the session's default parallelism — the
    * standard move before a CPU-heavy narrow stage when the input has fewer
    * splits than cores (the test corpus is a single small parquet row
    * group, which would serialize the whole tokenize/hash pipeline onto one
    * task). At 100 TB the scan yields plenty of splits and the exchange is
    * dwarfed by the compute stage it feeds; it exists for the compute, not
    * the scan — filters still push down below it.
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)
}
