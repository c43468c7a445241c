package graft

import org.apache.spark.sql.functions._
import graft.operators.GmallLog

/** The reference log pipeline on its real JSON wire shape (FIXTURES §A1). */
class GmallLogSpec extends SparkSpecBase {
  import spark.implicits._

  private val lines = Seq(
    // launch event (start present)
    """{"common":{"mid":"m1","is_new":"1","vc":"v1","ch":"web","ar":"110"},"start":{"entry":"icon","loading_time":1200},"ts":1704067200000}""",
    // page event with two displays
    """{"common":{"mid":"m1","is_new":"1","vc":"v1","ch":"web","ar":"110"},"page":{"page_id":"home","last_page_id":null,"item":null,"item_type":null,"during_time":8000},"displays":[{"item":"sku1","item_type":"sku_id"},{"item":"act2","item_type":"activity"}],"ts":1704067210000}""",
    // page event, no displays, different mid
    """{"common":{"mid":"m2","is_new":"0","vc":"v1","ch":"app","ar":"310"},"page":{"page_id":"search","last_page_id":"home","item":"kw","item_type":"keyword","during_time":300},"ts":1704067220000}""",
    // corrupt line
    """this is not json""")

  test("P1: parse splits clean and dirty exactly") {
    val parsed = GmallLog.parse(lines.toDF("value"))
    assert(GmallLog.clean(parsed).count() == 3)
    assert(GmallLog.dirty(parsed).as[String].collect().toSeq == Seq("this is not json"))
  }

  test("ST1 on wire shape: only first event of a genuinely-new mid keeps is_new") {
    val fixed = GmallLog.fixIsNew(GmallLog.clean(GmallLog.parse(lines.toDF("value"))))
      .select(col("e.common.mid"), col("e.ts"), col("is_new_fixed"))
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(fixed == Seq(
      ("m1", 1704067200000L, "1"), // first m1 event: keeps 1
      ("m1", 1704067210000L, "0"), // later m1 event: corrected
      ("m2", 1704067220000L, "0"))) // is_new was already 0
  }

  test("ST1: a '0'-event before the first '1'-event does not claim the slot") {
    // BaseLogApp.java:83-93 only writes state on is_new=='1', so m3's later
    // '1'-event must keep the flag despite the earlier '0'-event; the second
    // '1'-event is corrected.
    val m3 = Seq(
      """{"common":{"mid":"m3","is_new":"0","vc":"v1","ch":"web","ar":"110"},"page":{"page_id":"home","last_page_id":null,"item":null,"item_type":null,"during_time":1},"ts":1704067200000}""",
      """{"common":{"mid":"m3","is_new":"1","vc":"v1","ch":"web","ar":"110"},"page":{"page_id":"cart","last_page_id":"home","item":null,"item_type":null,"during_time":2},"ts":1704067210000}""",
      """{"common":{"mid":"m3","is_new":"1","vc":"v1","ch":"web","ar":"110"},"page":{"page_id":"pay","last_page_id":"cart","item":null,"item_type":null,"during_time":3},"ts":1704067220000}""")
    val fixed = GmallLog.fixIsNew(GmallLog.clean(GmallLog.parse(m3.toDF("value"))))
      .select(col("e.ts"), col("is_new_fixed"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(fixed == Seq(
      (1704067200000L, "0"),
      (1704067210000L, "1"),
      (1704067220000L, "0")))
  }

  test("SP1: start/page/display split with page_id stamped onto displays") {
    val (start, page, display) =
      GmallLog.split(GmallLog.clean(GmallLog.parse(lines.toDF("value"))))
    assert(start.select("mid", "entry").as[(String, String)].collect().toSeq ==
      Seq(("m1", "icon")))
    assert(page.select("mid", "page_id").as[(String, String)].collect().sorted.toSeq ==
      Seq(("m1", "home"), ("m2", "search")))
    // both displays exploded, each stamped with the owning page's page_id
    val disp = display.select("page_id", "item", "item_type")
      .as[(String, String, String)].collect().sorted.toSeq
    assert(disp == Seq(("home", "act2", "activity"), ("home", "sku1", "sku_id")))
  }
}
