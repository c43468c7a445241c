package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CorpusJob
import graft.streaming.CorpusJob.CorpusDoc

/** The e2e streaming-composition proof (round-9 stretch): stream ingest →
  * incremental MinHash dedup → IVF index refresh → retrieval, run once as
  * a single batch (the oracle) and once chopped into micro-batches
  * through the real `foreachBatch` query — identical survivors, identical
  * index, identical retrieval top-k. Plus a planted bite: injected
  * near-duplicates (same text + one token, across AND within batches)
  * must be dropped.
  */
class CorpusJobSpec extends SparkSpecBase {
  import spark.implicits._

  private def loadDocs(n: Int): Seq[CorpusDoc] = {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val embs = Tables.embeddings(spark, dir).select(col("vec_id").as("doc_id"), col("embedding"))
    docs.join(embs, "doc_id").orderBy("doc_id").limit(n)
      .as[(Long, String, Seq[Float])].collect().toSeq
      .map { case (id, t, e) => CorpusDoc(id, t, e) }
  }

  private def survivors(stateDir: String): Set[Long] =
    spark.read.parquet(s"$stateDir/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet

  private def queriesDf = {
    val dir = "/root/testdata/sf0.001"
    Tables.embeddings(spark, dir).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("q_emb"))
  }

  test("streaming corpus pipeline == one-batch run (dedup + IVF + retrieval)") {
    val base = loadDocs(100)
    val maxId = base.map(_.doc_id).max
    // planted near-dups: one duplicating a doc from an EARLIER chunk
    // (cross-batch, must hit the corpus store) and one duplicating a doc
    // of its OWN chunk (in-batch, must hit the greedy prefix rule)
    val crossDup = CorpusDoc(maxId + 1, base(10).text + " extratok",
      base(10).embedding.map(_ + 0.001f))
    val inBatchDup = CorpusDoc(maxId + 2, base(95).text + " othertok",
      base(95).embedding.map(_ + 0.001f))
    val all = base ++ Seq(crossDup, inBatchDup)

    val oneDir = java.nio.file.Files.createTempDirectory("corpus_one").toString
    CorpusJob.processBatch(spark, all.toDF(), oneDir)
    val oneSurv = survivors(oneDir)
    val oneTop = CorpusJob.retrieve(spark, oneDir, queriesDf)
      .collect().map(_.toSeq).toSet

    val streamDir = java.nio.file.Files.createTempDirectory("corpus_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("corpus_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CorpusDoc]
    val q = CorpusJob.start(in.toDF(), streamDir, ckpt)
    try {
      // 4 chunks in id order; the last carries both planted dups
      all.grouped(30).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val streamSurv = survivors(streamDir)
    val streamTop = CorpusJob.retrieve(spark, streamDir, queriesDf)
      .collect().map(_.toSeq).toSet

    assert(streamSurv == oneSurv,
      s"survivor drift: stream-only=${streamSurv -- oneSurv} one-only=${oneSurv -- streamSurv}")
    assert(oneSurv.nonEmpty && oneSurv.size < all.size)
    // planted bites: both injected near-duplicates dropped, originals kept
    assert(!streamSurv.contains(crossDup.doc_id) && !streamSurv.contains(inBatchDup.doc_id))
    assert(streamSurv.contains(base(10).doc_id) && streamSurv.contains(base(95).doc_id))
    // identical live index → identical retrieval
    assert(streamTop == oneTop)
    assert(streamTop.map(_.head).map(_.asInstanceOf[Long]).toSet == Set(0L, 1L, 2L),
      "every query returned rows")
    assert(streamTop.size == 9, s"expected 3 queries x k=3, got ${streamTop.size}")
  }

  test("ST8 crash-restart: survivor store recovers from checkpoint and equals the uninterrupted run") {
    // Recovery evidence for the composition job: crash (stop) after ≥1
    // committed batch, restart from the SAME checkpoint over a file
    // source, then force a replay of the last batch by deleting its
    // checkpoint commit marker — the recovered store must equal the
    // uninterrupted one-batch run ROW-FOR-ROW (doc_id, sig, emb, nrm,
    // cell), and retrieval over it must match.
    val docs = loadDocs(80)
    def storeRows(dir: String): Set[Seq[Any]] =
      spark.read.parquet(s"$dir/corpus").collect().map(_.toSeq).toSet

    val oneDir = java.nio.file.Files.createTempDirectory("corpus_cr_one").toString
    CorpusJob.processBatch(spark, docs.toDF(), oneDir)

    val inDir = java.nio.file.Files.createTempDirectory("corpus_cr_in").toString
    val stateDir = java.nio.file.Files.createTempDirectory("corpus_cr_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("corpus_cr_ckpt").toString
    val chunks = docs.grouped(20).toSeq
    val schema = docs.toDF().schema
    def start() = CorpusJob.start(
      spark.readStream.schema(schema).parquet(inDir), stateDir, ckpt)

    chunks(0).toDF().write.mode("append").parquet(inDir)
    val qa = start()
    qa.processAllAvailable()
    chunks(1).toDF().write.mode("append").parquet(inDir)
    qa.processAllAvailable()
    qa.stop() // the crash, after ≥1 committed batch
    val commitsDir = new java.io.File(s"$ckpt/commits")
    assert(commitsDir.listFiles().exists(_.getName.forall(_.isDigit)))

    // two more chunks land while the job is down; restart resumes mid-stream
    chunks(2).toDF().write.mode("append").parquet(inDir)
    chunks(3).toDF().write.mode("append").parquet(inDir)
    val qb = start()
    qb.processAllAvailable(); qb.stop()
    assert(storeRows(stateDir) == storeRows(oneDir), "store diverges after recovery")

    // forced replay: delete the newest commit marker — the restart
    // re-executes that batch; every replayed doc must re-drop as a
    // corpus self-duplicate, leaving the store (and sidecar) unchanged
    val lastBatch = commitsDir.listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
    assert(new java.io.File(s"$ckpt/commits/$lastBatch").delete())
    // the local checksum FS keeps a hidden .N.crc sidecar; left behind it
    // makes the replayed commit's rename fail as a phantom concurrent query
    new java.io.File(s"$ckpt/commits/.$lastBatch.crc").delete()
    val qc = start()
    qc.processAllAvailable(); qc.stop()
    assert(storeRows(stateDir) == storeRows(oneDir), "store diverges after forced replay")

    val oneTop = CorpusJob.retrieve(spark, oneDir, queriesDf).collect().map(_.toSeq).toSet
    val recTop = CorpusJob.retrieve(spark, stateDir, queriesDf).collect().map(_.toSeq).toSet
    assert(recTop == oneTop && recTop.nonEmpty, "retrieval diverges after recovery")
  }

  test("retrieve over a missing store returns zero rows with the contract schema") {
    val emptyDir = java.nio.file.Files.createTempDirectory("corpus_cr_empty").toString
    val res = CorpusJob.retrieve(spark, emptyDir, queriesDf)
      .select("query_id", "neighbor_id", "cos", "rnk") // must not throw
    assert(res.count() == 0)
  }

  test("replayed micro-batch leaves the corpus unchanged (idempotent ingest)") {
    val docs = loadDocs(40)
    val dir = java.nio.file.Files.createTempDirectory("corpus_idem").toString
    CorpusJob.processBatch(spark, docs.toDF(), dir)
    val first = survivors(dir)
    CorpusJob.processBatch(spark, docs.toDF(), dir) // at-least-once replay
    assert(survivors(dir) == first,
      "replaying the same batch must re-drop every document as a corpus duplicate")
  }

  test("bands crash-window replay keeps the persisted index in lockstep (no duplicate rows)") {
    // The one ordering window of the fast path: band rows land BEFORE the
    // survivor append, so a crash between the two leaves phantom band rows
    // for docs the corpus never received. The replay re-keeps the same
    // docs (the phantoms drop out of the candidate join at the corpus-sig
    // inner join) and must OVERWRITE its own deterministic `append_<id>`
    // subdir — the round-12 root-append rendering appended a second copy,
    // and with full rebuilds gated to the seed bootstrap nothing ever
    // purged it, permanently failing the survivors × Bands lockstep gate.
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
        ()
      }
    }
    def rmTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })

    val docs = loadDocs(60)
    val dir = java.nio.file.Files.createTempDirectory("corpus_bandwin").toString
    CorpusJob.processBatch(spark, docs.take(30).toDF(), dir)
    // snapshot the survivor store + sidecar as of batch 1
    val corpusP = java.nio.file.Paths.get(s"$dir/corpus")
    val backup = java.nio.file.Files.createTempDirectory("corpus_bandwin_bak")
    copyTree(corpusP, backup)
    val sidecarP = java.nio.file.Paths.get(s"$dir/corpus_rows")
    val sidecarV = java.nio.file.Files.readAllBytes(sidecarP)

    CorpusJob.processBatch(spark, docs.drop(30).toDF(), dir)
    val survAfter = survivors(dir)
    // manufacture the window: batch 2's bands landed, its corpus append
    // (and sidecar bump) lost
    rmTree(corpusP)
    copyTree(backup, corpusP)
    java.nio.file.Files.write(sidecarP, sidecarV)
    assert(survivors(dir).size < survAfter.size, "window setup: corpus rolled back")

    CorpusJob.processBatch(spark, docs.drop(30).toDF(), dir) // the replay
    assert(survivors(dir) == survAfter, "replay must converge to the same survivor set")
    val bandRows = CorpusJob.readBands(spark, dir).count()
    assert(bandRows == survAfter.size.toLong * graft.pipeline.Dedup.Bands,
      s"band index must stay in lockstep after a crash-window replay: " +
        s"$bandRows rows for ${survAfter.size} survivors")
    // and the index content itself is duplicate-free per (doc_id, band)
    assert(CorpusJob.readBands(spark, dir)
      .groupBy("doc_id", "band").count().filter(col("count") > 1).count() == 0)
  }

  test("seeds sidecar: frozen centroids served without a corpus scan; lost sidecar backfilled") {
    val docs = loadDocs(60)
    val dir = java.nio.file.Files.createTempDirectory("corpus_seeds").toString
    val seeds = java.nio.file.Paths.get(s"$dir/seeds")
    CorpusJob.processBatch(spark, docs.take(30).toDF(), dir)
    assert(java.nio.file.Files.exists(seeds), "bootstrap rebuild must write the seeds sidecar")
    val seedRows = spark.read.parquet(seeds.toString)
      .orderBy("cell_seed").collect().map(_.toSeq)
    assert(seedRows.length == 4)
    // frozen contract: the sidecar IS the first-4-survivors derivation
    val derived = spark.read.parquet(s"$dir/corpus").orderBy(col("doc_id")).limit(4)
      .select(col("doc_id"), col("emb"), col("nrm")).collect().map(_.toSeq)
    assert(seedRows.map(_.head) sameElements derived.map(_.head))
    // a lost sidecar (legacy store) is re-derived and backfilled by the
    // next fast-path batch, and the assignment is unchanged
    def cells(d: String) = spark.read.parquet(s"$d/corpus")
      .select("doc_id", "cell").collect().map(_.toSeq).toSet
    def rmTree(p: java.nio.file.Path): Unit =
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
    rmTree(seeds)
    CorpusJob.processBatch(spark, docs.drop(30).toDF(), dir)
    assert(java.nio.file.Files.exists(seeds), "fast path must backfill a missing sidecar")
    // oracle: the one-shot run over the same 60 docs assigns identically
    val oneDir = java.nio.file.Files.createTempDirectory("corpus_seeds_one").toString
    CorpusJob.processBatch(spark, docs.toDF(), oneDir)
    assert(cells(dir) == cells(oneDir), "sidecar-served seeds must not change the assignment")
  }

  test("survivor-count sidecar: kept in lockstep; a legacy store without one is backfilled") {
    val docs = loadDocs(60)
    val dir = java.nio.file.Files.createTempDirectory("corpus_sidecar").toString
    val sidecar = java.nio.file.Paths.get(s"$dir/corpus_rows")
    def sidecarCount: Long =
      new String(java.nio.file.Files.readAllBytes(sidecar), "UTF-8").trim.toLong

    CorpusJob.processBatch(spark, docs.take(30).toDF(), dir)
    assert(java.nio.file.Files.exists(sidecar), "first batch must write the sidecar")
    assert(sidecarCount == survivors(dir).size.toLong)

    // legacy / lost-sidecar store: the next batch must count once,
    // backfill, and land on the correct total afterwards
    java.nio.file.Files.delete(sidecar)
    CorpusJob.processBatch(spark, docs.drop(30).toDF(), dir)
    assert(sidecarCount == survivors(dir).size.toLong,
      "sidecar must be backfilled from the store and updated by the append")
  }
}
