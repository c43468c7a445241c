package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter
import graft.pipeline.Dedup
import graft.functions.VectorFunctions._

/** The end-to-end streaming corpus pipeline: stream ingest → incremental
  * MinHash dedup → IVF index refresh → retrieval over the live index, as
  * ONE `foreachBatch` job — the proof that the training-data operators
  * COMPOSE under streaming, not just individually.
  *
  * Reference anchor: this is the streaming twin of the batch curation
  * chain (`Dedup.incrementalDedup` → `Similarity.ivfTopK`), wired the way
  * the reference wires its warehouse layers (`app/dwd → dwm → dws`,
  * micro-batch materialization between layers).
  *
  * Semantics (batch-size INVARIANT, the property the parity spec gates):
  * documents are processed in doc_id order within each micro-batch; a
  * document survives iff it does not near-duplicate (signature-estimated
  * Jaccard ≥ threshold) any earlier SURVIVOR — the greedy prefix rule.
  * Because the state store holds survivors only, the surviving set after
  * N micro-batches equals the one-batch run over the concatenated input,
  * regardless of how the stream was chopped.
  *
  * Index refresh: the coarse quantizer's cells are seeded by the first
  * `nCells` survivors (the `vec_id < nCells` convention of
  * `Similarity.ivfTopK`). New survivors are assigned to their nearest
  * cell INCREMENTALLY against the frozen centroids — served from a 4-row
  * `seeds` sidecar, never re-derived by a per-batch corpus scan; only
  * when the seed set itself changes (bootstrap batches, while fewer than
  * `nCells` survivors exist) is the whole assignment rebuilt and the
  * sidecar rewritten — the rare-coarse-rebuild / frequent-append shape
  * of production IVF serving.
  *
  * Ingest contract: doc_ids arrive in NONDECREASING order across
  * micro-batches (a streaming ingest's monotone id assignment) — both the
  * greedy prefix rule and the frozen-seed refresh depend on it.
  *
  * == Scale posture: SUBLINEAR per-batch probes (the round-13 weak item) ==
  *
  * The previous rendering scanned the ENTIRE persisted band index every
  * micro-batch to find dedup candidates, and the full survivor store to
  * fetch candidate signatures — both O(corpus) per batch, the one term
  * that would grow without bound at a 100 TB store. This rendering is an
  * LSM-shaped keyed store plus a membership sketch, so per-batch I/O is
  * driven by the batch's MATCHES, not the store's size:
  *
  *  - '''bloom sidecar''' (`bands/_bloom`): a Bloom filter over every
  *    indexed `band|band_key`. A batch's band keys are prefiltered
  *    driver-side; keys the bloom rules out (no false negatives) never
  *    touch the index. A batch of NOVEL documents — the common case of a
  *    production ingest — pays ~ZERO probe I/O however large the store
  *    (only fpp × batchKeys false-positive keys, default fpp 1e-4).
  *  - '''L1 base''' (`bands/kb=<b>/`): the compacted index, hash-bucketed
  *    by `pmod(xxhash64(band_key), N)` (`spark.graft.corpus.bandBuckets`,
  *    the `DimStore` bucket discipline) and SORTED by `band_key` within
  *    each bucket file with small row groups. The probe reads only the
  *    buckets the surviving keys hash into, with the key list pushed to
  *    parquet as an In filter — row-group stats prune inside each bucket,
  *    so base I/O is O(presentKeys × rowGroup), independent of store rows
  *    once the store outgrows presentKeys granules. At 100 TB you raise
  *    `bandBuckets` (and the parquet block size stays small for the band
  *    files), exactly the dim-store knob story.
  *  - '''L0 appends''' (`bands/append_<firstKeptId>/`): each micro-batch
  *    lands ONE small sorted file; probes read all of L0, but L0 is
  *    bounded by `spark.graft.corpus.compactEvery` batches — a FLAT term.
  *  - '''compaction''': every `compactEvery` appends, L0 is folded into
  *    the bucketed L1 base in one job. Compaction also PURGES phantom
  *    band rows (appends from a crashed attempt whose corpus append never
  *    landed and whose batching changed on replay — they are semi-joined
  *    against the survivor store) and rebuilds the bloom fresh, so
  *    neither crash debris nor bloom saturation accumulates. Staged under
  *    `_compact_tmp` with a completion sentinel and recovered on the next
  *    batch, the `DimStore.recoverStaged` discipline.
  *  - '''candidate verification stays against the CORPUS''': band-index
  *    hits are confirmed by fetching the candidate survivors' signatures
  *    from the survivor store, pruned by a pushed `doc_id IN` filter
  *    (survivor files carry monotone id ranges, so row-group stats skip
  *    everything else). A phantom index row can therefore never dedup a
  *    live arrival — the index is a cache of the corpus, never an
  *    authority over it.
  *  - '''survivor store partitioned by cell''' (`corpus/cell=<seed>/`):
  *    `retrieve` collects the probed cells (bounded by nCells) and reads
  *    ONLY those partitions — nProbe/nCells of the store instead of all
  *    of it — and the signature fetch's id pruning rides the same files.
  *
  * The driver-side sequential resolution touches ONLY the micro-batch's
  * band keys and its candidate pairs — bounded by the ingest-batch
  * contract (same bounded-collect discipline as the config table and BPE
  * merges), never corpus-sized.
  */
object CorpusJob {

  case class CorpusDoc(doc_id: Long, text: String, embedding: Seq[Float])

  /** L1 bucket count of the band index; fixed per store at creation (the
    * `_v2` marker records it), raised via conf for bigger deployments.
    */
  val BandBucketsConf = "spark.graft.corpus.bandBuckets"
  val BandBucketsDefault = 64

  /** L0 bound: compaction folds the append files into the bucketed base
    * once this many have accumulated since the last rebuild/compaction.
    * 16 balances the probe's bounded L0 scan (16 batch-sized files)
    * against compaction frequency (each is an O(store) re-layout job —
    * amortized O(store/16) per batch, the LSM tradeoff).
    */
  val CompactEveryConf = "spark.graft.corpus.compactEvery"
  val CompactEveryDefault = 16

  /** Row threshold above which a fast-path append goes WIDE (r15,
    * bucketed band subdirs / cell-keyed corpus write) instead of the
    * single-task `repartition(1)` layout: the serial sort-and-write is
    * bounded by batch size, fine for micro-batches, but a grown batch
    * serializes its whole band/corpus append on one core. Below the
    * threshold the one-file layout is kept (fewer files for the probe to
    * open). The bench batches stay below it; `CorpusJobSpec` forces it to
    * 1 to gate the wide layout's equivalence.
    */
  val AppendWideRowsConf = "spark.graft.corpus.appendWideRows"
  val AppendWideRowsDefault = 65536

  private val BloomFpp = 1e-4
  private val BloomMinCapacity = 1L << 17

  /** Small parquet row groups for the band index so the pushed In-filter's
    * row-group stats pruning has fine granules (the index rows are ~45 B;
    * the default 128 MB block would put the whole bench-scale store in one
    * granule and prune nothing).
    */
  private val BandBlockBytes = 64L * 1024
  private val CorpusBlockBytes = 1L * 1024 * 1024

  private def corpusPath(stateDir: String) = s"$stateDir/corpus"
  private def countPath(stateDir: String) = s"$stateDir/corpus_rows"
  private def rebuildsPath(stateDir: String) = s"$stateDir/rebuilds"
  private def bandsPath(stateDir: String) = s"$stateDir/bands"
  private def seedsPath(stateDir: String) = s"$stateDir/seeds"
  private def bloomPath(stateDir: String) = s"${bandsPath(stateDir)}/_bloom"
  private def markerPath(stateDir: String) = s"${bandsPath(stateDir)}/_v2"

  private val bandFileSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("band_key", StringType)))

  /** Survivor-store schema, passed explicitly on every read so the `cell`
    * PARTITION column keeps a stable LongType (directory-value inference
    * would flip int→long as seed ids grow past 2³¹) and no read pays a
    * footer-inference pass. Legacy unpartitioned stores carry `cell` as a
    * data column of the same type — the one schema reads both layouts.
    */
  private val corpusSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("emb", ArrayType(DoubleType)),
    StructField("nrm", DoubleType),
    StructField("cell", LongType)))

  /** Number of full IVF-assignment rebuilds this store has performed —
    * observability for the rare-coarse-rebuild contract: rebuilds happen
    * ONLY while the seed set is forming (fewer than `nCells` survivors),
    * so a replay's count must stop growing once the store passes `nCells`
    * rows. `BenchStream` records and gates this per batch.
    */
  def rebuildCount(stateDir: String): Long = {
    val p = java.nio.file.Paths.get(rebuildsPath(stateDir))
    if (java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  private def bumpRebuilds(stateDir: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(rebuildsPath(stateDir)),
      (rebuildCount(stateDir) + 1).toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Survivor store if it exists: (doc_id, sig, emb, nrm, cell). */
  private def loadCorpus(spark: SparkSession, stateDir: String): Option[DataFrame] =
    if (new java.io.File(corpusPath(stateDir)).exists())
      Some(spark.read.schema(corpusSchema).parquet(corpusPath(stateDir)))
    else None

  private def writeCount(stateDir: String, n: Long): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(countPath(stateDir)),
      n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Survivor count from the sidecar, so no micro-batch runs a corpus-wide
    * action just to pick the append-vs-rebuild branch. The count only
    * DECIDES anything while the seed set is forming (`< nCells`), and every
    * rebuild rewrites the sidecar from the materialized store, so a stale
    * value (crash between parquet write and sidecar write) costs at most
    * one extra rebuild, never a wrong survivor set. A legacy store with no
    * sidecar is counted once and the sidecar backfilled.
    */
  private def loadCount(existing: Option[DataFrame], stateDir: String): Long =
    existing match {
      case None => 0L
      case Some(c) =>
        val p = java.nio.file.Paths.get(countPath(stateDir))
        if (java.nio.file.Files.exists(p))
          new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        else { val n = c.count(); writeCount(stateDir, n); n }
    }

  private def bandRows(df: DataFrame): DataFrame = df
    .select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(Dedup.Bands - 1)),
        b => concat_ws("_", transform(
          slice(col("sig"), b * Dedup.RowsPerBand + 1, lit(Dedup.RowsPerBand)),
          x => x.cast("string"))))))
    .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")

  /** Read the WHOLE band index (gates, compaction, bloom backfill — never
    * the per-batch probe): recursive lookup over the base `kb=` buckets
    * and the `append_*` L0 files; `_`-prefixed sidecars are invisible.
    */
  def readBands(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.schema(bandFileSchema)
      .option("recursiveFileLookup", "true").parquet(bandsPath(stateDir))

  // ---------------------------------------------------------------- bloom

  private def bloomKeyStr(band: Int, key: String) = s"$band|$key"

  private def readBloom(stateDir: String): Option[(Long, Long, BloomFilter)] = {
    val p = java.nio.file.Paths.get(bloomPath(stateDir))
    if (!java.nio.file.Files.exists(p)) None
    else {
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(p)))
      try Some((in.readLong(), in.readLong(), BloomFilter.readFrom(in)))
      finally in.close()
    }
  }

  private def writeBloom(stateDir: String, capacity: Long, keys: Long,
                         bf: BloomFilter): Unit = {
    val tmp = java.nio.file.Paths.get(s"${bandsPath(stateDir)}/_bloom_tmp")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(tmp)))
    try { out.writeLong(capacity); out.writeLong(keys); bf.writeTo(out) }
    finally out.close()
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(bloomPath(stateDir)),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Build the bloom from the index's actual rows (one distributed agg) —
    * used at rebuild/compaction and to backfill a store missing the
    * sidecar. `keysEstimate` sizes capacity with 4× headroom (amortized
    * doubling: the fast path regrows the same way when the counter nears
    * capacity, so per-batch cost stays O(batch) between rare regrows).
    */
  private def rebuildBloom(stateDir: String, bands: DataFrame,
                           keysEstimate: Long): Unit = {
    val capacity = math.max(BloomMinCapacity, 4 * math.max(1L, keysEstimate))
    val bf = bands
      .select(concat_ws("|", col("band"), col("band_key")).as("bk"))
      .stat.bloomFilter("bk", capacity, BloomFpp)
    writeBloom(stateDir, capacity, keysEstimate, bf)
  }

  // ------------------------------------------------------- layout helpers

  private def withKb(df: DataFrame, nb: Int): DataFrame =
    df.withColumn("kb", pmod(xxhash64(col("band_key")), lit(nb.toLong)).cast("int"))

  private def confInt(spark: SparkSession, key: String, dflt: Int): Int =
    spark.conf.get(key, dflt.toString).toInt

  private def bandBucketsOf(stateDir: String): Option[Int] = {
    val p = java.nio.file.Paths.get(markerPath(stateDir))
    if (!java.nio.file.Files.exists(p)) None
    else new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.stripPrefix("kb=").toIntOption
  }

  private def writeMarker(stateDir: String, nb: Int): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(markerPath(stateDir)),
      s"kb=$nb\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def listDirs(path: String, prefix: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(prefix)).toSeq

  private def rmTree(dir: java.io.File): Unit =
    if (dir.exists)
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })

  /** Write band rows as the bucketed+sorted L1 base INTO `dest` (which the
    * caller swaps or owns): one file per bucket, sorted by `band_key`, so
    * the probe's pushed In filter prunes row groups by key-range stats.
    */
  private def writeBandsBase(bands: DataFrame, nb: Int, dest: String): Unit =
    withKb(bands, nb)
      .repartition(nb, col("kb")).sortWithinPartitions(col("band_key"))
      .write.mode("overwrite")
      .option("parquet.block.size", BandBlockBytes)
      .partitionBy("kb").parquet(dest)

  /** Band index rebuilt wholesale from the survivor store (the authority):
    * used by the seed-bootstrap rebuild, the v1→v2 layout migration, and
    * the missing-index self-heal. Wipes the bands dir (phantoms included),
    * then marker and bloom — a crash between the steps re-heals on the
    * next batch (marker/bloom absent → rebuilt again from the corpus).
    */
  private def rebuildBandsFromCorpus(spark: SparkSession, stateDir: String,
                                     corpus: DataFrame, keysEstimate: Long): Int = {
    val nb = confInt(spark, BandBucketsConf, BandBucketsDefault)
    val bands = bandRows(corpus.select(col("doc_id"), col("sig")))
    writeBandsBase(bands, nb, bandsPath(stateDir))
    writeMarker(stateDir, nb)
    rebuildBloom(stateDir, readBands(spark, stateDir), keysEstimate)
    nb
  }

  /** Fast-path layout guard: marker present → v2 store, return its bucket
    * count; absent → one-shot migration/self-heal from the corpus.
    */
  private def ensureBandsV2(spark: SparkSession, stateDir: String,
                            corpus: DataFrame, priorCount: Long): Int =
    bandBucketsOf(stateDir).getOrElse {
      rebuildBandsFromCorpus(spark, stateDir, corpus, priorCount * Dedup.Bands)
    }

  // --------------------------------------------------------- compaction

  private def compactTmp(stateDir: String) = s"${bandsPath(stateDir)}/_compact_tmp"
  private def compactOk(stateDir: String) =
    new java.io.File(s"${compactTmp(stateDir)}/_graft_staged_ok")

  /** Complete or discard a crashed compaction before anything reads the
    * index (the `DimStore.recoverStaged` discipline): a staging WITH the
    * sentinel is the authoritative compacted base — finish the swap; one
    * without it is a partial write — drop it, the L0/L1 state is intact.
    */
  private def recoverCompact(stateDir: String): Unit = {
    val tmp = new java.io.File(compactTmp(stateDir))
    if (!tmp.exists) return
    if (compactOk(stateDir).exists) finishCompactSwap(stateDir)
    else rmTree(tmp)
  }

  /** The swap, idempotent under a crash at ANY point: the sentinel records
    * the compacted base's bucket list, so a retry can tell an
    * already-moved new bucket (in the list, absent from staging — keep)
    * from a stale old bucket (not in the list — delete). A blind
    * delete-all-then-move would destroy an already-moved bucket whose
    * staged copy is gone — the lost-bucket window `DimStore.recoverStaged`
    * exists to close, recreated one level up.
    */
  private def finishCompactSwap(stateDir: String): Unit = {
    val root = bandsPath(stateDir)
    val keep = new String(
      java.nio.file.Files.readAllBytes(compactOk(stateDir).toPath),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSet
    listDirs(root, "kb=").filterNot(d => keep.contains(d.getName)).foreach(rmTree)
    listDirs(compactTmp(stateDir), "kb=").foreach { src =>
      val dst = new java.io.File(s"$root/${src.getName}")
      rmTree(dst) // the pre-compaction copy this staged bucket supersedes
      java.nio.file.Files.move(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
    // L0 is folded into the new base; appends go only after every staged
    // bucket is in place (a crash before this line replays to here)
    listDirs(root, "append_").foreach(rmTree)
    rmTree(new java.io.File(compactTmp(stateDir)))
  }

  /** Fold L0 appends into the bucketed L1 base once `compactEvery` have
    * accumulated. Also the store's garbage collection: rows whose doc_id
    * is not a survivor (phantom appends from a crashed attempt replayed
    * under a DIFFERENT batching — the one debris the deterministic
    * `append_<id>` overwrite cannot collapse) are semi-joined out, row
    * duplicates from overlapping phantom/live appends collapse under
    * `distinct`, and the bloom is rebuilt fresh (dropping phantom keys and
    * any fast-path counter overcount). Runs AFTER the batch's own commit
    * point; a crash mid-compaction recovers via the staging sentinel.
    */
  private def maybeCompact(spark: SparkSession, stateDir: String,
                           corpus: DataFrame, nb: Int, survivorCount: Long): Unit = {
    val every = confInt(spark, CompactEveryConf, CompactEveryDefault)
    if (listDirs(bandsPath(stateDir), "append_").size < every) return
    val clean = readBands(spark, stateDir).distinct()
      .join(corpus.select(col("doc_id")), Seq("doc_id"), "left_semi")
    writeBandsBase(clean, nb, compactTmp(stateDir))
    // sentinel carries the new base's bucket list — the swap's idempotence
    // depends on it (see finishCompactSwap)
    java.nio.file.Files.write(compactOk(stateDir).toPath,
      listDirs(compactTmp(stateDir), "kb=").map(_.getName).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finishCompactSwap(stateDir)
    writeMarker(stateDir, nb) // marker lives in the bands dir the swap rewrote
    // the incremental bloom stays valid across the fold (it is a SUPERSET:
    // purged phantom keys linger only as extra false positives), so the
    // distributed rebuild is paid only when capacity pressure calls for a
    // regrow anyway — compaction stays a single re-layout job
    readBloom(stateDir) match {
      case Some((capacity, keys, _)) if keys <= (capacity * 7) / 10 => ()
      case _ =>
        rebuildBloom(stateDir, readBands(spark, stateDir), survivorCount * Dedup.Bands)
    }
  }

  // ------------------------------------------------- corpus migration

  private def corpusMigrateTmp(stateDir: String) = s"$stateDir/_corpus_migrate"

  private def corpusFlatFiles(stateDir: String): Seq[java.io.File] =
    Option(new java.io.File(corpusPath(stateDir)).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .toSeq

  /** One-shot migration of a legacy UNPARTITIONED survivor store to the
    * cell-partitioned layout (staged + sentinel + swap; recovery completes
    * or discards exactly like the compaction staging). Without it, an
    * append under `cell=` dirs next to legacy root files would leave a
    * layout partition discovery rejects.
    */
  private def migrateCorpusIfFlat(spark: SparkSession, stateDir: String): Unit = {
    recoverCorpusMigrate(stateDir)
    if (corpusFlatFiles(stateDir).isEmpty) return
    val tmp = corpusMigrateTmp(stateDir)
    spark.read.schema(corpusSchema).parquet(corpusPath(stateDir))
      .repartition(col("cell")).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .option("parquet.block.size", CorpusBlockBytes)
      .partitionBy("cell").parquet(tmp)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/_graft_staged_ok"), Array.empty[Byte])
    finishCorpusMigrate(stateDir)
  }

  private def recoverCorpusMigrate(stateDir: String): Unit = {
    val tmp = new java.io.File(corpusMigrateTmp(stateDir))
    if (!tmp.exists) return
    if (new java.io.File(tmp, "_graft_staged_ok").exists) finishCorpusMigrate(stateDir)
    else rmTree(tmp)
  }

  /** Idempotent under a crash at any point: only the legacy FLAT files are
    * deleted (a `cell=` dir at the destination can only be this
    * migration's own already-moved output — the legacy layout had none —
    * so a retry keeps it; blindly clearing the destination would destroy
    * moved cells whose staged copy is gone).
    */
  private def finishCorpusMigrate(stateDir: String): Unit = {
    val dst = new java.io.File(corpusPath(stateDir))
    java.nio.file.Files.createDirectories(dst.toPath)
    Option(dst.listFiles()).getOrElse(Array.empty).filter(_.isFile)
      .foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
    listDirs(corpusMigrateTmp(stateDir), "cell=").foreach { src =>
      val d = new java.io.File(s"${dst.getPath}/${src.getName}")
      rmTree(d) // half-moved retry: the staged copy supersedes it
      java.nio.file.Files.move(src.toPath, d.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
    rmTree(new java.io.File(corpusMigrateTmp(stateDir)))
  }

  // ----------------------------------------------------------- seeds

  /** The nCells seed centroids as (cell_seed, c_emb, c_nrm) — FROZEN once
    * the bootstrap completes, so the fast path must not pay a corpus-wide
    * TakeOrdered per micro-batch to re-derive them (O(store) per batch —
    * exactly the growth the class doc forbids). They live in a 4-row
    * `seeds` sidecar, rewritten by every rebuild BEFORE the count sidecar
    * (the count is the fast-path commit point, so a crash between the two
    * forces one more rebuild, never a fast path against stale seeds). A
    * legacy store without the sidecar derives once from the survivor
    * store and backfills — the count-sidecar discipline.
    */
  private def deriveSeeds(corpus: DataFrame, nCells: Int): DataFrame =
    corpus.orderBy(col("doc_id")).limit(nCells)
      .select(col("doc_id").as("cell_seed"), col("emb").as("c_emb"), col("nrm").as("c_nrm"))

  private def loadSeeds(spark: SparkSession, stateDir: String,
                        corpus: DataFrame, nCells: Int): DataFrame = {
    val p = seedsPath(stateDir)
    if (!new java.io.File(p).exists())
      deriveSeeds(corpus, nCells).write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def estJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    round(call_function("graft_eq_count", a, b).cast("double") /
      lit(Dedup.NumHashes.toDouble), 6)

  /** Run `body` with the parquet In-filter pushdown threshold raised to
    * cover `n` values (default 10 — above it Spark degrades the pushed
    * predicate to a min/max range, useless for hash-shaped keys), restoring
    * the session conf afterwards. The In list stays bounded by the
    * ingest-batch contract, and on the read side the vectorized reader
    * only uses it for row-group/page pruning — per-record filtering is
    * Spark's own codegen'd InSet hash probe, not a linear scan.
    */
  private def withInPushdown[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, math.max(1000, n + 1).toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private case class PresentBand(batch_id: Long, band: Int, band_key: String)
  private case class CandPair(batch_id: Long, corpus_id: Long)

  /** One micro-batch: dedup the arrivals against the survivor store and
    * each other (greedy prefix rule), append survivors, refresh the IVF
    * assignment. Idempotent per unique doc_id set; call from
    * `foreachBatch` or directly (the one-batch call IS the batch oracle).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   threshold: Double = 0.5, nCells: Int = 4): Unit = {
    if (batch.isEmpty) return
    recoverCompact(stateDir)
    migrateCorpusIfFlat(spark, stateDir)
    val sigs = batch
      .select(col("doc_id"), col("text"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .select(col("doc_id"),
        Dedup.minhashSignatureFrom(Dedup.shingleHashesFrom(Dedup.tokenHashes(col("text")))).as("sig"),
        col("emb"), norm(col("emb")).as("nrm"))
      .localCheckpoint()
    val existing = loadCorpus(spark, stateDir)
    val priorCount = loadCount(existing, stateDir)

    // The driver-side inputs of the greedy resolution come back in ONE
    // tagged collect off the checkpointed `sigs`: the batch's own band
    // rows (which also carry the id list) and the within-batch near-dup
    // pairs. Bounded by batch × Bands — the ingest-batch contract.
    val bandBranch = bandRows(sigs)
      .select(lit(0).as("tag"), col("doc_id").as("a"),
        col("band").cast("long").as("b"), col("band_key").as("key"))
    val pairBranch = Dedup.lshPairsFromSigs(
        sigs.select(col("doc_id"), col("sig")), threshold)
      .select(lit(1).as("tag"), col("doc_a").as("a"), col("doc_b").as("b"),
        lit(null).cast("string").as("key"))
    val tagged = bandBranch.unionByName(pairBranch).collect()
    val batchBands = tagged.iterator.filter(_.getInt(0) == 0)
      .map(r => PresentBand(r.getLong(1), r.getLong(2).toInt, r.getString(3))).toArray
    val inBatchPairs = tagged.iterator.filter(_.getInt(0) == 1)
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val batchIds = batchBands.iterator.map(_.batch_id).toSet.toArray.sorted

    // arrivals that near-duplicate an already-ingested survivor: bloom
    // prefilter (keys the sidecar rules out never touch disk) → pruned
    // L1/L0 candidate scan → corpus-confirmed signature verification.
    val dupOfCorpus: Set[Long] = existing match {
      case None => Set.empty
      case Some(corpus) =>
        val nb = ensureBandsV2(spark, stateDir, corpus, priorCount)
        val bloom = readBloom(stateDir).getOrElse {
          // lost/legacy sidecar: backfill once from the index (the
          // count-sidecar discipline), then read it back
          rebuildBloom(stateDir, readBands(spark, stateDir),
            priorCount * Dedup.Bands)
          readBloom(stateDir).get
        }._3
        val present = batchBands.filter(p =>
          bloom.mightContainString(bloomKeyStr(p.band, p.band_key)))
        if (present.isEmpty) Set.empty
        else {
          val presentKeys = present.map(_.band_key).distinct
          val root = bandsPath(stateDir)
          // distinct buckets of the present keys: computed with the SAME
          // Spark expression that bucketed the writes (a driver-side
          // xxhash64 reimplementation could drift); a local-relation agg,
          // bounded by batch × Bands rows
          val presentDf = spark.createDataFrame(present.toIndexedSeq)
          val touchedBuckets = withKb(presentDf, nb)
            .select(col("kb")).distinct().collect().map(_.getInt(0))
          // an append written WIDE (kb= subdirs, r15) prunes to the touched
          // buckets exactly like the base; a flat single-file append is
          // read whole as before
          val touchedSet = touchedBuckets.toSet
          val appendDirs = listDirs(root, "append_").flatMap { d =>
            val kbDirs = Option(d.listFiles()).getOrElse(Array.empty)
              .filter(x => x.isDirectory && x.getName.startsWith("kb="))
            if (kbDirs.isEmpty) Seq(d.getPath)
            else kbDirs.toSeq
              .filter(x => x.getName.stripPrefix("kb=").toIntOption.exists(touchedSet))
              .map(_.getPath)
          }
          val basePaths = touchedBuckets.toIndexedSeq
            .map(b => s"$root/kb=$b").filter(p => new java.io.File(p).exists)
          val paths = basePaths ++ appendDirs
          val candidates: Array[CandPair] =
            if (paths.isEmpty) Array.empty
            else withInPushdown(spark, presentKeys.length) {
              spark.read.schema(bandFileSchema).parquet(paths: _*)
                .filter(col("band_key").isin(presentKeys.toIndexedSeq: _*))
                .select(col("doc_id").as("corpus_id"), col("band"), col("band_key"))
                .join(broadcast(presentDf
                  .select(col("batch_id"), col("band"), col("band_key"))),
                  Seq("band", "band_key"))
                .select(col("batch_id"), col("corpus_id"))
                // dedup driver-side: rows are bounded by the batch's
                // matching band rows, and skipping `distinct` keeps the
                // probe a single shuffle-free stage
                .collect().map(r => CandPair(r.getLong(0), r.getLong(1))).distinct
            }
          if (candidates.isEmpty) Set.empty
          else {
            // confirm against the SURVIVOR STORE (the authority): fetch
            // candidate sigs via a pushed doc_id In filter — survivor
            // files carry monotone id ranges, so row-group stats skip
            // everything but the candidates' granules. Phantom index rows
            // (no corpus row) drop out of this inner join, so they can
            // never dedup a live arrival.
            val candIds = candidates.map(_.corpus_id).distinct
            withInPushdown(spark, candIds.length) {
              spark.createDataFrame(candidates.toIndexedSeq)
                .join(corpus
                  .filter(col("doc_id").isin(candIds.toIndexedSeq: _*))
                  .select(col("doc_id").as("corpus_id"), col("sig").as("sig_b")),
                  "corpus_id")
                .join(sigs.select(col("doc_id").as("batch_id"), col("sig").as("sig_a")),
                  "batch_id")
                .filter(estJaccard(col("sig_a"), col("sig_b")) >= threshold)
                .select(col("batch_id"))
                .collect().map(_.getLong(0)).toSet // the Set dedups
            }
          }
        }
    }

    val kept = scala.collection.mutable.LinkedHashSet[Long]()
    batchIds.foreach { id =>
      val dupsEarlierKept = inBatchPairs.getOrElse(id, Set.empty).exists(kept.contains)
      if (!dupOfCorpus.contains(id) && !dupsEarlierKept) kept += id
    }
    if (kept.isEmpty) return
    val keptDf = sigs.filter(col("doc_id").isInCollection(kept))

    // IVF refresh: seeds = first nCells survivors globally; rebuild the
    // whole assignment only while the seed set is still forming
    val seedsChanged = priorCount < nCells
    existing match {
      case Some(c) if !seedsChanged =>
        // fast path: frozen seeds from the 4-row sidecar, L0 band append,
        // bloom merge, partitioned corpus append — no store-sized reads
        val nb = bandBucketsOf(stateDir).get // ensured above
        val cents = loadSeeds(spark, stateDir, c, nCells)
        val assigned = assignCells(keptDf, cents, nCells)
        // band index BEFORE the survivor append: a crash between the two
        // leaves only phantom band rows (they fail the corpus-confirmed
        // verification, and compaction purges them), never a survivor the
        // index can't see — and the replay OVERWRITES this batch's own
        // subdir (kept sets are disjoint across batches, so
        // `append_<firstKeptId>` names this batch uniquely), so the
        // window cannot duplicate index rows under the same batching
        val bandAppend = bandRows(keptDf.select(col("doc_id"), col("sig")))
        val appendDest = s"${bandsPath(stateDir)}/append_${kept.head}"
        val wide = kept.size.toLong * Dedup.Bands >=
          confInt(spark, AppendWideRowsConf, AppendWideRowsDefault)
        if (wide)
          // grown batches: per-bucket subdirs (same kb layout as the L1
          // base) so the sort-and-write runs on every core and the probe
          // prunes append buckets like base buckets; the deterministic
          // append_<id> OVERWRITE replaces the whole dir, so replay
          // idempotence is unchanged
          withKb(bandAppend, nb)
            .repartition(col("kb")).sortWithinPartitions(col("band_key"))
            .write.mode("overwrite")
            .option("parquet.block.size", BandBlockBytes)
            .partitionBy("kb").parquet(appendDest)
        else
          bandAppend
            .repartition(1).sortWithinPartitions(col("band_key"))
            .write.mode("overwrite")
            .option("parquet.block.size", BandBlockBytes)
            .parquet(appendDest)
        // bloom AFTER the band rows, BEFORE the corpus append: a key in
        // the index but not the bloom could silently skip a real dup, so
        // the bloom must never lag the corpus; phantom keys from the
        // crash window are false-positive-safe (re-merging the same keys
        // is idempotent bit-setting). Regrow by rebuild once the counter
        // nears capacity — amortized, never per-batch.
        val keptKeys = batchBands.filter(p => kept.contains(p.batch_id))
        readBloom(stateDir) match {
          case Some((capacity, keys, bf)) if keys + keptKeys.length <= (capacity * 7) / 10 =>
            keptKeys.foreach(p => bf.putString(bloomKeyStr(p.band, p.band_key)))
            writeBloom(stateDir, capacity, keys + keptKeys.length, bf)
          case _ =>
            rebuildBloom(stateDir, readBands(spark, stateDir),
              (priorCount + kept.size) * Dedup.Bands)
        }
        // same adaptive width for the survivor append: cell-keyed when the
        // batch is big (each task holds whole cells, per-file doc_id order
        // and the monotone-id row-group pruning property are preserved),
        // the single sorted task below the threshold
        (if (wide)
          assigned.repartition(col("cell"))
            .sortWithinPartitions(col("cell"), col("doc_id"))
        else
          assigned.repartition(1).sortWithinPartitions(col("cell"), col("doc_id")))
          .write.mode("append")
          .option("parquet.block.size", CorpusBlockBytes)
          .partitionBy("cell").parquet(corpusPath(stateDir))
        writeCount(stateDir, priorCount + kept.size)
        maybeCompact(spark, stateDir,
          loadCorpus(spark, stateDir).get, nb, priorCount + kept.size)
      case other =>
        // seed-bootstrap rebuild: whole assignment re-derived; every
        // structure rewritten wholesale (bands → marker/bloom → corpus →
        // seeds → count; the count sidecar is the fast-path commit point,
        // so a crash anywhere inside forces one more rebuild, never a
        // fast path against half-written state)
        val allSurvivors = other match {
          case Some(c) => c.select(col("doc_id"), col("sig"), col("emb"), col("nrm"))
            .unionByName(keptDf)
          case None => keptDf
        }
        val allChk = allSurvivors.localCheckpoint()
        val cents = deriveSeeds(allChk, nCells)
        val rebuilt = assignCells(allChk, cents, nCells).localCheckpoint()
        val nb = confInt(spark, BandBucketsConf, BandBucketsDefault)
        writeBandsBase(bandRows(rebuilt.select(col("doc_id"), col("sig"))),
          nb, bandsPath(stateDir))
        writeMarker(stateDir, nb)
        val total = rebuilt.count() // checkpointed: cheap, self-heals drift
        rebuildBloom(stateDir, readBands(spark, stateDir), total * Dedup.Bands)
        rebuilt
          .repartition(col("cell")).sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite")
          .option("parquet.block.size", CorpusBlockBytes)
          .partitionBy("cell").parquet(corpusPath(stateDir))
        cents.write.mode("overwrite").parquet(seedsPath(stateDir))
        writeCount(stateDir, total)
        bumpRebuilds(stateDir)
    }
  }

  /** Nearest-centroid assignment (cosine, ties to low seed id) — the
    * `ivfTopK` coarse-quantizer contract, in the r14 map-side packed
    * rendering (`Similarity.packedCents` machinery): the winner is a
    * row-local argmax over a one-row broadcast of the seed table instead
    * of an nCells-way fan-out + a rank window — the window was one full
    * exchange + sort of the batch's vectors PER MICRO-BATCH on the fast
    * path (and corpus-sized on rebuilds). array_max/array_position share
    * the sort's NaN/-0.0 double semantics and first-match over
    * seed-ascending slots IS the `cell_seed asc` tie-break, so the
    * assignment is bit-identical (survivors/band gates unchanged).
    */
  private def assignCells(docs: DataFrame, cents: DataFrame, nCells: Int): DataFrame = {
    val packed = cents.agg(array_sort(collect_list(struct(
        col("cell_seed").as("cid"), col("c_emb"), col("c_nrm")))).as("cb"))
      .filter(size(col("cb")) > 0)
      // loud guard (ADVICE r14): the score array below covers slots
      // 0..nCells-1 only — a reused state dir whose persisted seeds parquet
      // holds MORE rows than this run's nCells conf would silently ignore
      // the extras (the old fan-out join scored every persisted seed) and
      // drift assignments against the stored corpus/band index. Zero-job:
      // one comparison on the one packed row.
      .filter(assert_true(size(col("cb")) <= nCells,
        concat(lit("corpus seeds: persisted seed count "),
          size(col("cb")).cast("string"),
          lit(s" exceeds nCells=$nCells — state dir/conf mismatch"))).isNull)
    val scored = docs.join(broadcast(packed))
      .withColumn("__scores", array((0 until nCells).map { i =>
        val slot = get(col("cb"), lit(i))
        cosineRFromNorms(col("emb"), slot.getField("c_emb"),
          col("nrm"), slot.getField("c_nrm"))
      }: _*))
    val idx = (array_position(col("__scores"), array_max(col("__scores"))) - 1).cast("int")
    scored.select(col("doc_id"), col("sig"), col("emb"), col("nrm"),
      get(col("cb"), idx).getField("cid").as("cell"))
  }

  /** Retrieval over the live index: probe the `nProbe` nearest cells per
    * query, exact cosine inside the probed cells, deterministic top-k.
    * `queries` = (query_id, q_emb double array).
    *
    * The survivor store is PARTITIONED by cell, and the probed cells are
    * collected first (bounded by nCells — the coarse-quantizer contract),
    * so the scan partition-prunes to nProbe/nCells of the store instead
    * of reading all of it.
    */
  def retrieve(spark: SparkSession, stateDir: String, queries: DataFrame,
               k: Int = 3, nProbe: Int = 2, nCells: Int = 4): DataFrame = {
    val corpus = loadCorpus(spark, stateDir).getOrElse {
      // no survivor store yet: zero rows, but with the contract schema so
      // callers selecting (query_id, neighbor_id, cos, rnk) get an empty
      // result instead of an AnalysisException
      val schema = StructType(Seq(
        queries.schema("query_id"),
        StructField("neighbor_id", LongType),
        StructField("cos", DoubleType),
        StructField("rnk", IntegerType)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val q = queries.select(col("query_id"), col("q_emb"), norm(col("q_emb")).as("q_nrm"))
    // serve the frozen seeds from the 4-row sidecar (no corpus scan per
    // retrieval); stores from before the sidecar existed derive inline —
    // retrieval stays non-mutating, the next processBatch backfills
    val cents = (if (new java.io.File(seedsPath(stateDir)).exists())
        spark.read.parquet(seedsPath(stateDir))
      else deriveSeeds(corpus, nCells))
      .select(col("cell_seed").as("cell"), col("c_emb"), col("c_nrm"))
    val probes = q.join(broadcast(cents))
      .select(col("query_id"), col("cell"),
        cosineRFromNorms(col("q_emb"), col("c_emb"), col("q_nrm"), col("c_nrm")).as("c_cos"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("c_cos").desc, col("cell").asc)))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("cell"))
      .localCheckpoint()
    // probed cells as literals → partition pruning on the cell-partitioned
    // store; bounded driver collect (≤ nCells distinct cells exist)
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0))
    corpus
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        cosineRFromNorms(col("q_emb"), col("emb"), col("q_nrm"), col("nrm")).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
  }

  /** The streaming wrapper: one `foreachBatch` query running the full
    * ingest → dedup → index-refresh chain per micro-batch. Checkpointed;
    * sinks are idempotent per unique doc_id set (replayed batches re-drop
    * the same duplicates and re-append nothing new only if ids repeat —
    * exactly-once corpus contents under Spark's at-least-once replay,
    * the `WarehouseJob` discipline).
    */
  def start(stream: DataFrame, stateDir: String, checkpointDir: String,
            threshold: Double = 0.5, nCells: Int = 4): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        processBatch(df.sparkSession, df, stateDir, threshold, nCells)
      }
      .start()
}
