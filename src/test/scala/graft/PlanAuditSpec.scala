package graft

import org.apache.spark.sql.functions._

/** Unit gates for the PlanAudit counters — in particular the pushdown
  * detector: it must see the predicates a healthy scan-bound plan pushes,
  * and it must report ZERO for a deliberately-broken probe (a cast on the
  * filter column silently defeats parquet pushdown without changing the
  * result — exactly the regression the registry-wide gate exists to trip).
  */
class PlanAuditSpec extends SparkSpecBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count() // finalize AQE like the audit does
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("pushed-filter counter: q6-style scan-bound filters reach the scan") {
    val dir = "/root/testdata/sf0.001"
    for (name <- PlanAudit.MustPushFilters) {
      val plan = planOf(SparkEntry.queries(name)(spark, dir))
      assert(PlanAudit.pushedFilterCount(plan) >= 1,
        s"$name plan pushed no filters into the scan:\n$plan")
    }
  }

  test("corpus Han gate: clean corpora pass, a planted URO/ExtA doc trips it") {
    Verify.assertHanFree(spark, "/root/testdata/sf0.001") // the real corpus is clean
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("han_gate").toString
    Seq((1L, "plain ascii text"), (2L, "mixed 你好 han run"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] { Verify.assertHanFree(spark, dir) }
    assert(e.getMessage.contains("Han characters"))
  }

  test("pushed-filter counter: a cast on the filter column trips the gate (0 pushed)") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    // healthy probe: a plain comparison pushes
    val healthy = planOf(li.filter(col("l_quantity") < 10).select(col("l_orderkey")))
    assert(PlanAudit.pushedFilterCount(healthy) >= 1, s"healthy probe pushed nothing:\n$healthy")
    // broken probe: casting the DECIMAL column to string before comparing
    // defeats parquet pushdown — the detector must report 0 so the
    // registry gate fails loud instead of silently scanning everything
    val broken = planOf(li.filter(col("l_quantity").cast("string") === "7.00")
      .select(col("l_orderkey")))
    assert(PlanAudit.pushedFilterCount(broken) == 0,
      s"broken probe still counted pushed filters:\n$broken")
  }

  test("pushed-filter counter: truncation fragments never count (ADVICE r10)") {
    // Spark truncates scan metadata around ~100 chars, which can leave a
    // trailing fragment like "IsNotN..." — the tail of an IsNotNull entry.
    // Counting it would let an all-IsNotNull-but-truncated list pass the
    // >=1 gate; the counter must treat any "..."-terminated token as
    // unknowable and keep the count a true lower bound.
    val allTruncated = "PushedFilters: [IsNotNull(a), IsNotNull(b), IsNotN..."
    assert(PlanAudit.pushedFilterCount(allTruncated) == 0,
      "a truncated all-IsNotNull list must count zero substantive filters")
    // (the comma-split sees multi-arg predicates as several tokens — fine
    // for a >=1 gate, so assert presence, not an exact count)
    val substantive = "PushedFilters: [IsNotNull(a), GreaterThan(b,7), IsNotN..."
    assert(PlanAudit.pushedFilterCount(substantive) >= 1)
    val bareEllipsis = "PushedFilters: [IsNotNull(a), ..."
    assert(PlanAudit.pushedFilterCount(bareEllipsis) == 0)
  }
}
