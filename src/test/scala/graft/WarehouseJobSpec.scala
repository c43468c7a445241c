package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.WarehouseJob

/** End-to-end streaming warehouse over a file-source replay of the real
  * sf0.001 events table: ODS(file topic) → DWD(parse/split/route) →
  * dims upsert + fact dirs → DWS windowed stats, all through one
  * checkpointed foreachBatch query.
  */
class WarehouseJobSpec extends SparkSpecBase {

  test("warehouse job lands dirty/facts/dims/stats layers from a file topic") {
    val out = Files.createTempDirectory("wh_out").toString
    val ckpt = Files.createTempDirectory("wh_ckpt").toString
    // file-stream sources read directories ("topics"); stage the table there
    val src = Files.createTempDirectory("wh_src").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(src)

    val job = new WarehouseJob(spark, out)
    val q = job.start(src, ckpt)
    q.processAllAvailable()
    q.stop()

    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val total = events.count()

    // facts: view/click routed to kafka-style dirs, partitioned by table
    val facts = spark.read.parquet(s"$out/facts")
    assert(facts.select("sink_table").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("dwd_click_log", "dwd_page_log"))
    val expectedFacts = events.filter(col("event_type").isin("view", "click")).count()
    assert(facts.count() == expectedFacts)

    // dims: purchase/signup upserted keyed by user
    val store = new graft.sources.DimStore(spark, s"$out/dim")
    val dimOrder = store.read("dim_order").get
    assert(dimOrder.count() ==
      events.filter(col("event_type") === "purchase").select("user_id").distinct().count())
    assert(dimOrder.groupBy("user_id").count().filter(col("count") > 1).count() == 0,
      "dim store must be unique per key")

    // stats: A1 windowed rows exist and measure sums reconcile
    val stats = spark.read.parquet(s"$out/stats")
    assert(stats.agg(sum("total_ct")).first().getLong(0) == total)

    // no dirty rows in this dataset (all props parse)
    assert(!new java.io.File(s"$out/dirty").exists() ||
      spark.read.parquet(s"$out/dirty").count() == 0)

    // ---- at-least-once replay idempotence (the ST8 commit contract) ----
    // 1. committed-marker fast path: replaying the whole topic from a
    //    FRESH checkpoint (= the worst-case redelivery) must not append
    val factsBefore = facts.count()
    val statsSumBefore = stats.agg(sum("total_ct")).first().getLong(0)
    val q2 = job.start(src, Files.createTempDirectory("wh_ckpt2").toString)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$out/facts").count() == factsBefore,
      "marker skip must prevent duplicate facts on replay")

    // 2. crashed-before-marker path: markers gone, batch dirs still there
    //    (crash between publish and marker) — republish must REPLACE the
    //    batch-scoped dirs wholesale, not append to them
    new java.io.File(out).listFiles().filter(_.getName.startsWith("_committed_"))
      .foreach(_.delete())
    val q3 = job.start(src, Files.createTempDirectory("wh_ckpt3").toString)
    q3.processAllAvailable(); q3.stop()
    assert(spark.read.parquet(s"$out/facts").count() == factsBefore,
      "wholesale batch-dir replace must prevent duplicates after a marker-less replay")
    assert(spark.read.parquet(s"$out/stats").agg(sum("total_ct")).first().getLong(0)
      == statsSumBefore,
      "stats partials must be replaced, not appended, on replay")
    assert(new java.io.File(s"$out/_committed_0").exists(), "marker rewritten after republish")
  }

  test("ST3 mutable config: rows inserted between batches route the NEXT batch; dims honor per-table pks") {
    import spark.implicits._
    val out = Files.createTempDirectory("whc_out").toString
    val cfg = Files.createTempDirectory("whc_cfg").toString
    val src = Files.createTempDirectory("whc_src").toString
    // initial config: clicks are NOT routed; two dim tables with DIFFERENT
    // configured pks and column lists
    Seq(
      ("view", "kafka", "dwd_page_log", null: String, null: String),
      ("purchase", "hbase", "dim_order", "user_id", "user_id,ts,value"),
      ("signup", "hbase", "dim_user", "event_id", "event_id,user_id,ts"))
      .toDF("source_type", "sink_type", "sink_table", "sink_pk", "sink_columns")
      .write.mode("overwrite").parquet(cfg)

    val events = Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").parquet(src)

    val job = new WarehouseJob(spark, out, Some(cfg))
    val q = job.start(src, Files.createTempDirectory("whc_ckpt").toString)
    q.processAllAvailable()

    // batch 0: click events dropped (no config row for them)
    val facts0 = spark.read.parquet(s"$out/facts")
    assert(facts0.select("sink_table").distinct().collect().map(_.getString(0)).toSeq
      == Seq("dwd_page_log"), "unrouted click events must be dropped in batch 0")

    // table_process insert observed by the NEXT micro-batch
    // (TableProcessFunction.java:45-63 broadcast-state refresh)
    Seq(("click", "kafka", "dwd_click_log", null: String, null: String))
      .toDF("source_type", "sink_type", "sink_table", "sink_pk", "sink_columns")
      .write.mode("append").parquet(cfg)
    events.write.mode("append").parquet(src) // second delivery = batch 1
    q.processAllAvailable()
    q.stop()

    val facts = spark.read.parquet(s"$out/facts")
    assert(facts.filter(col("batch") === 1)
      .select("sink_table").distinct().collect().map(_.getString(0)).sorted.toSeq
      == Seq("dwd_click_log", "dwd_page_log"),
      "config row inserted between batches must route batch 1")

    // dims: each table keyed by ITS configured pk with ITS column list
    val store = new graft.sources.DimStore(spark, s"$out/dim")
    val dimOrder = store.read("dim_order").get
    assert(dimOrder.columns.sorted.toSeq == Seq("ts", "user_id", "value"))
    assert(dimOrder.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    val dimUser = store.read("dim_user").get
    assert(dimUser.columns.sorted.toSeq == Seq("event_id", "ts", "user_id"))
    assert(dimUser.count() ==
      events.filter(col("event_type") === "signup").select("event_id").distinct().count(),
      "event_id pk keeps one row per event, not per user")
  }

  test("dim-batch guard: a fact-sized stream misrouted to the dim side fails loud") {
    import spark.implicits._
    val out = Files.createTempDirectory("whg_out").toString
    val cfg = Files.createTempDirectory("whg_cfg").toString
    val src = Files.createTempDirectory("whg_src").toString
    // misroute: the high-volume view stream declared as a dim sink
    Seq(("view", "hbase", "dim_broken", "user_id", "user_id,ts"))
      .toDF("source_type", "sink_type", "sink_table", "sink_pk", "sink_columns")
      .write.mode("overwrite").parquet(cfg)
    Tables.events(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(src)

    spark.conf.set("spark.graft.maxDimBatchRows", "50")
    try {
      val job = new WarehouseJob(spark, out, Some(cfg))
      val q = job.start(src, Files.createTempDirectory("whg_ckpt").toString)
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("fact-sized stream routed to a dim sink")),
        s"expected the loud misroute guard, got: ${messages(e).mkString(" | ")}")
      q.stop()
    } finally spark.conf.unset("spark.graft.maxDimBatchRows")
  }
}
