package graft.model

import org.apache.spark.sql.types._

/** The reference's behavior-log event shape (FIXTURES.md §A1, reconstructed
  * from field accesses in `app/dwd/BaseLogApp.java:71-124`,
  * `app/dws/VisitorStatsApp.java:62-107`, `KeywordStatsApp.java:37-52`):
  * nested `common`/`page` objects, a `displays` array, an optional `start`
  * object whose presence marks launch events, and epoch-millis `ts`.
  */
object LogEvent {

  val schema: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("mid", StringType),
      StructField("is_new", StringType),
      StructField("vc", StringType),
      StructField("ch", StringType),
      StructField("ar", StringType)))),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType),
      StructField("last_page_id", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("during_time", LongType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("item", StringType),
      StructField("item_type", StringType))))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType),
      StructField("loading_time", LongType)))),
    StructField("ts", LongType)))
}
