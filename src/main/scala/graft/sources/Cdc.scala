package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC-envelope handling (reference S1/S2:
  * `app/ods/FlinkCDC.java:33-43` + `app/function/CustomerDeserialization
  * .java:34-90`). The Debezium SourceRecord → JSON deserializer becomes a
  * pure `from_json` column expression over the envelope schema — no
  * per-record code, fully codegen'd, and the "create"→"insert" op mapping
  * is a `when` chain.
  */
object Cdc {

  /** `{database, tableName, before, after, type}` — before/after kept as
    * raw JSON strings (schema varies per table; downstream parses with the
    * table's own schema, mirroring the reference's dynamic JSONObject use).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("tableName", StringType),
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("type", StringType)))

  /** Normalize Debezium op codes the way `CustomerDeserialization.java:72-74`
    * does: create/read → insert.
    */
  def normalizeOp(op: Column): Column =
    when(op.isin("create", "read", "c", "r"), "insert")
      .when(op.isin("u"), "update")
      .when(op.isin("d"), "delete")
      .otherwise(op)

  /** Parse a raw-JSON CDC feed (one envelope per row in `col(jsonCol)`). */
  def parseEnvelope(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol), envelopeSchema).as("env"))
      .select(
        col("env.database").as("database"),
        col("env.tableName").as("tableName"),
        col("env.before").as("before"),
        col("env.after").as("after"),
        normalizeOp(col("env.type")).as("type"))

  /** P2: drop deletes (`app/dwd/BaseDBApp.java:55-62`). */
  def dropDeletes(env: DataFrame): DataFrame = env.filter(col("type") =!= "delete")
}
