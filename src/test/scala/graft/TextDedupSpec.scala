package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.pipeline.Dedup

class TextDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenizer never throws and drops empties (U1 contract)") {
    val df = Seq("", "  ", "a  b\tc", "ONE two").toDF("text")
    val got = df.select(tokens($"text").as("t")).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq(), Seq(), Seq("a", "b", "c"), Seq("one", "two")))
  }

  test("quality ratios are bounded and safe on empty text") {
    val df = Seq("", "aa bb aa", "!!!").toDF("text")
    val rows = df.select(
      punctRatio($"text"), stopwordRatio($"text"), uniqueTokenRatio($"text"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (p, s, u) =>
      assert(p >= 0 && p <= 1 && s >= 0 && s <= 1 && u >= 0 && u <= 1)
    }
    assert(rows(1)._3 == 0.666667) // 2 distinct / 3 tokens, rounded 6dp
  }

  test("exact dedup groups identical normalized texts") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = df.groupBy(fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("canonical"), count(lit(1)).as("ct"))
      .orderBy("canonical")
      .as[(String, Long, Long)].collect().toSeq
    assert(out.map(r => (r._2, r._3)) == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val sigs = docs.select($"doc_id", Dedup.minhashSignature($"text").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(est(sigs(1L), sigs(2L)) > 0.5, "near-dup pair should share most slots")
    assert(est(sigs(1L), sigs(3L)) < 0.2, "unrelated pair should share few slots")
  }

  test("simhash: identical texts collide, disjoint texts differ") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val m = df.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("cosine: orthogonal=0, identical=1, on float arrays") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.cosineR($"a", $"b")).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("CDC envelope parse normalizes ops and drops deletes") {
    val raw = Seq(
      """{"database":"d","tableName":"t","before":null,"after":"{\"id\":1}","type":"create"}""",
      """{"database":"d","tableName":"t","before":"{\"id\":1}","after":null,"type":"delete"}""",
      "not json at all")
      .toDF("value")
    val env = graft.sources.Cdc.parseEnvelope(raw)
    val ops = env.select("type").as[String].collect().toSeq
    assert(ops.contains("insert") && ops.contains("delete"))
    val kept = graft.sources.Cdc.dropDeletes(env)
    assert(kept.filter($"type" === "insert").count() == 1)
    assert(kept.filter($"type" === "delete").count() == 0)
  }

  test("DimStore upsert is last-write-wins by version") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore").toString
    val store = new graft.sources.DimStore(spark, dir)
    store.upsert("dim_user", Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "name", "v"),
      "id", "v")
    store.upsert("dim_user", Seq((1L, "a2", 2L)).toDF("id", "name", "v"), "id", "v")
    val rows = store.read("dim_user").get.orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows == Seq((1L, "a2", 2L), (2L, "b", 1L)))
    assert(store.lookup("dim_user", "id", 1L).head.getString(1) == "a2")
  }

  test("DimStore bucketed upsert rewrites only the touched buckets") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore_bucketed").toString
    val store = new graft.sources.DimStore(spark, dir)
    // 64 keys across the default 16 buckets
    store.upsert("dim_user",
      (1L to 64L).map(i => (i, s"n$i", 1L)).toDF("id", "name", "v"), "id", "v")
    def snapshot(): Map[String, String] = {
      val root = java.nio.file.Paths.get(dir, "dim_user")
      val md = java.security.MessageDigest.getInstance("MD5")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => root.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString)
        .toMap
    }
    val before = snapshot()
    assert(before.keys.exists(_.startsWith("graft_bucket=")), s"bucket layout missing: ${before.keys}")
    // single-key upsert: only key 7's bucket may change
    store.upsert("dim_user", Seq((7L, "updated", 2L)).toDF("id", "name", "v"), "id", "v")
    val after = snapshot()
    val touched = spark.range(1)
      .select(pmod(xxhash64(lit("7")), lit(16L)).cast("int")).head.getInt(0)
    val untouchedBefore = before.filter(!_._1.startsWith(s"graft_bucket=$touched"))
    val untouchedAfter = after.filter(!_._1.startsWith(s"graft_bucket=$touched"))
    assert(untouchedAfter == untouchedBefore,
      "untouched bucket files changed: " +
        (untouchedBefore.toSet diff untouchedAfter.toSet))
    assert(after.keys.count(_.startsWith(s"graft_bucket=$touched")) > 0)
    // semantics unchanged: updated row visible, row count stable
    assert(store.lookup("dim_user", "id", 7L).head.getString(1) == "updated")
    assert(store.read("dim_user").get.count() == 64)
  }

  test("DimStore mixed-layout retry (crashed migration) converges without data loss") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore_retry").toString
    val store = new graft.sources.DimStore(spark, dir)
    // bucketed store with rows 1..10 (normal migration)
    (1L to 10L).map(i => (i, s"n$i", 1L)).toDF("id", "name", "v")
      .write.parquet(s"$dir/dim_user")
    store.upsert("dim_user", Seq((1L, "m", 2L)).toDF("id", "name", "v"), "id", "v")
    // simulate a crashed second migration: a leftover FLAT file lands next
    // to the bucket dirs, holding an overlap (id 3, OLDER version) and a
    // row not yet in any bucket (id 11)
    val stage = java.nio.file.Files.createTempDirectory("stage").toString + "/out"
    // coalesce(1): the planted leftover must be ONE part file holding BOTH
    // rows — an uncoalesced 2-row write splits across two part files and
    // copying `head` would plant only id 3, making the assertions below
    // claim data loss that never happened
    Seq((3L, "stale", 0L), (11L, "extra", 1L)).toDF("id", "name", "v")
      .coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/dim_user/leftover.parquet"))
    // retry upsert: must read the flat leftovers by explicit path (mixed
    // layout), merge them WITH existing bucket contents, and converge
    store.upsert("dim_user", Seq((2L, "upd", 3L)).toDF("id", "name", "v"), "id", "v")
    val rows = store.read("dim_user").get.as[(Long, String, Long)].collect()
      .map { case (id, name, v) => id -> (name, v) }.toMap
    assert(rows.size == 11, s"expected 11 keys, got ${rows.keySet.toSeq.sorted}")
    assert(rows(3L) == ("n3", 1L), "older leftover version must lose to the bucket row")
    assert(rows(11L) == ("extra", 1L), "leftover-only row must be folded in")
    assert(rows(2L) == ("upd", 3L) && rows(1L) == ("m", 2L))
    assert(!new java.io.File(s"$dir/dim_user/leftover.parquet").exists,
      "flat leftovers must be removed after the retry")
  }

  test("DimStore.read collapses a mixed (crashed-migration) layout without an upsert") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore_mixedread").toString
    val store = new graft.sources.DimStore(spark, dir)
    store.upsert("dim_user",
      (1L to 10L).map(i => (i, s"n$i", 1L)).toDF("id", "name", "v"), "id", "v")
    // plant a flat leftover (single part file!) next to the bucket dirs:
    // id 3 at an OLDER version than its bucket row, id 11 new
    val stage = java.nio.file.Files.createTempDirectory("stage").toString + "/out"
    Seq((3L, "stale", 0L), (11L, "extra", 1L)).toDF("id", "name", "v")
      .coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/dim_user/leftover.parquet"))
    // read() — NOT a retry upsert — must return the merged, version-deduped
    // table: the store is readable in the exact window upsert's retry handles
    val rows = store.read("dim_user").get.as[(Long, String, Long)].collect()
      .map { case (id, name, v) => id -> (name, v) }.toMap
    assert(rows.size == 11, s"expected 11 keys, got ${rows.keySet.toSeq.sorted}")
    assert(rows(3L) == ("n3", 1L), "older leftover version must lose to the bucket row")
    assert(rows(11L) == ("extra", 1L), "leftover-only row must be visible")
    // lookup() rides the same path
    assert(store.lookup("dim_user", "id", 11L).head.getString(1) == "extra")
  }

  test("DimStore.read of a meta-only dir (crash before first bucket write) is an empty store") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore_metaonly").toString
    val store = new graft.sources.DimStore(spark, dir)
    new java.io.File(s"$dir/dim_user").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/dim_user/_graft_meta"),
      "keyCol=id\nversionCol=v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(store.read("dim_user").isEmpty, "meta-only dir must read as empty, not throw")
    assert(store.lookup("dim_user", "id", 1L).isEmpty)
    // and the next upsert proceeds normally from the empty state
    store.upsert("dim_user", Seq((1L, "a", 1L)).toDF("id", "name", "v"), "id", "v")
    assert(store.read("dim_user").get.count() == 1)
  }

  test("DimStore buckets the same logical key identically across numeric types") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore_keytypes").toString
    val store = new graft.sources.DimStore(spark, dir)
    store.upsert("dim_user", Seq((7L, "as_long", 1L)).toDF("id", "name", "v"), "id", "v")
    // same logical key arrives as Double in the next batch: it must land in
    // the SAME bucket so the versioned dedup can collapse it — a raw string
    // cast ("7.0" vs "7") would leave duplicate key 7 in two buckets
    store.upsert("dim_user", Seq((7.0d, "as_double", 2L)).toDF("id", "name", "v"), "id", "v")
    val rows = store.read("dim_user").get.collect()
    assert(rows.length == 1, s"duplicate key across buckets: ${rows.mkString(", ")}")
    assert(rows.head.getString(1) == "as_double", "highest version must win")
    // fractional keys stay distinct from their floor
    store.upsert("dim_user", Seq((7.5d, "frac", 1L)).toDF("id", "name", "v"), "id", "v")
    assert(store.read("dim_user").get.count() == 2)
    // zero is the decimal-rendering trap (BigDecimal's "0E-9"): Long 0 and
    // Double 0.0 must still collide
    store.upsert("dim_user", Seq((0L, "zero_long", 1L)).toDF("id", "name", "v"), "id", "v")
    store.upsert("dim_user", Seq((0.0d, "zero_double", 2L)).toDF("id", "name", "v"), "id", "v")
    val zero = store.read("dim_user").get.filter("id = 0").collect()
    assert(zero.length == 1 && zero.head.getString(1) == "zero_double",
      s"zero key split across buckets: ${zero.mkString(", ")}")
  }

  test("DimStore migrates a legacy flat store to buckets in one upsert") {
    val dir = java.nio.file.Files.createTempDirectory("dimstore_legacy").toString
    // legacy layout: parquet files directly under the table dir
    (1L to 10L).map(i => (i, s"n$i", 1L)).toDF("id", "name", "v")
      .write.parquet(s"$dir/dim_user")
    val store = new graft.sources.DimStore(spark, dir)
    store.upsert("dim_user", Seq((3L, "migrated", 2L)).toDF("id", "name", "v"), "id", "v")
    val tableDir = new java.io.File(s"$dir/dim_user")
    assert(!tableDir.listFiles().exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "legacy flat files not removed")
    assert(store.read("dim_user").get.count() == 10)
    assert(store.lookup("dim_user", "id", 3L).head.getString(1) == "migrated")
    assert(store.lookup("dim_user", "id", 5L).head.getString(1) == "n5")
  }
}
