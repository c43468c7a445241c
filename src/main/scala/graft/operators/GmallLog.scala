package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.LogEvent

/** The reference log pipeline on its REAL wire shape (raw JSON lines of
  * FIXTURES §A1), complementing the `events`-table renderings that back the
  * DuckDB oracles: parse + dirty split (P1), is_new correction oracle (ST1),
  * and the start/page/display three-way split with page_id stamping onto
  * exploded display rows (SP1, `BaseLogApp.java:100-138`; stamping at
  * `:118-121`).
  */
object GmallLog {

  /** P1: parse raw JSON lines; corrupt rows keep raw text with a null
    * parse — callers filter on `parsed IS [NOT] NULL` for the two sides.
    */
  def parse(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(col(jsonCol).as("raw"),
      from_json(col(jsonCol), LogEvent.schema).as("e"))

  /** PERMISSIVE from_json yields an all-null struct (not a null) for
    * corrupt input — `ts` is required in every valid event, so its
    * nullness is the dirty marker (`BaseLogApp.java:53-68`'s try/catch).
    */
  def clean(parsed: DataFrame): DataFrame =
    parsed.filter(col("e").isNotNull && col("e.ts").isNotNull)
  def dirty(parsed: DataFrame): DataFrame =
    parsed.filter(col("e").isNull || col("e.ts").isNull).select(col("raw"))

  private def evTime: Column = timestamp_millis(col("e.ts"))

  /** ST1 batch oracle on the real shape: only a mid's FIRST is_new='1'
    * event keeps the flag (`BaseLogApp.java:83-93` writes keyed state only
    * on is_new=='1' events — an earlier '0'-event does not claim the
    * first-visit slot, and '0' events are never flipped up). The running
    * count therefore ranks only '1'-events; `xxhash64(raw)` breaks
    * equal-ts ties deterministically.
    */
  def fixIsNew(cleanDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("e.common.mid"))
      .orderBy(col("e.ts"), xxhash64(col("raw")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newSeen = sum(when(col("e.common.is_new") === "1", 1L).otherwise(0L)).over(w)
    cleanDf.withColumn("is_new_fixed",
      when(col("e.common.is_new") === "1" && newSeen === 1L, "1").otherwise("0"))
  }

  /** SP1: three-way split.
    *  - start stream: rows where `start` is present;
    *  - page stream: the rest;
    *  - display stream: page rows exploded on `displays`, each display
    *    stamped with the owning page_id (`BaseLogApp.java:118-121`).
    */
  def split(cleanDf: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val start = cleanDf.filter(col("e.start").isNotNull)
      .select(col("e.common.mid").as("mid"), col("e.start.entry").as("entry"),
        col("e.start.loading_time").as("loading_time"), evTime.as("ts"))
    val page = cleanDf.filter(col("e.start").isNull)
      .select(col("e.common.mid").as("mid"), col("e.page.page_id").as("page_id"),
        col("e.page.last_page_id").as("last_page_id"),
        col("e.page.during_time").as("during_time"), evTime.as("ts"))
    val display = cleanDf.filter(col("e.start").isNull && col("e.displays").isNotNull)
      .select(col("e.common.mid").as("mid"), col("e.page.page_id").as("page_id"),
        evTime.as("ts"), explode(col("e.displays")).as("d"))
      .select(col("mid"), col("page_id"), col("ts"),
        col("d.item").as("item"), col("d.item_type").as("item_type"))
    (start, page, display)
  }
}
