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
}
