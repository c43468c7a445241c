package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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
  * Scale posture: the corpus side of the dedup join shuffles band keys
  * only (at 100 TB it is served by a persisted band index, here the
  * survivor store's `sig` column); per-batch cost is O(batch × bucket),
  * independent of corpus size. The driver-side sequential resolution
  * touches ONLY the micro-batch's ids and its candidate pairs — bounded
  * by the ingest-batch contract (same bounded-collect discipline as the
  * config table and BPE merges), never corpus-sized.
  */
object CorpusJob {

  case class CorpusDoc(doc_id: Long, text: String, embedding: Seq[Float])

  private def corpusPath(stateDir: String) = s"$stateDir/corpus"
  private def countPath(stateDir: String) = s"$stateDir/corpus_rows"
  private def rebuildsPath(stateDir: String) = s"$stateDir/rebuilds"
  private def bandsPath(stateDir: String) = s"$stateDir/bands"
  private def seedsPath(stateDir: String) = s"$stateDir/seeds"

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
      Some(spark.read.parquet(corpusPath(stateDir)))
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

  /** The PERSISTED band index — the structure the class doc promises the
    * 100 TB deployment ("the corpus side is served by a persisted band
    * index"): (doc_id, band, band_key) rows for every survivor, landed in
    * lockstep with the survivor store on the fast path and rewritten on
    * the rare seed-bootstrap rebuild. The per-batch candidate join then
    * reads precomputed band rows instead of re-deriving Bands keys from
    * every survivor's signature each micro-batch — per-batch corpus-side
    * cost becomes a narrow columnar scan, not a recompute that grows with
    * the store. A store written before this index existed is self-healed:
    * the index is rebuilt once from the survivor store, exactly the
    * sidecar backfill discipline.
    *
    * Replays are idempotent BY CONSTRUCTION, not by purging: each batch's
    * band rows land in a deterministic subdir keyed by the batch's first
    * kept doc_id (`append_<id>`, mode Overwrite). Kept sets are disjoint
    * across batches (monotone ingest ids; a re-ingested id near-dups its
    * stored self), so distinct batches never collide — and the one crash
    * window (bands landed, corpus append lost) replays to the SAME kept
    * set (same batch data, same corpus state; the phantom band rows drop
    * out of the candidate join at the corpus-sig inner join), so the
    * replay overwrites the same subdir instead of appending a second copy.
    * The index therefore never drifts from survivors × Bands rows, the
    * invariant BenchStream gates. (The previous rendering appended to the
    * dir root; a crash-replay duplicated rows, and with full rebuilds
    * gated to the seed bootstrap nothing ever purged them.)
    */
  private def loadBands(spark: SparkSession, stateDir: String,
                        corpus: DataFrame): DataFrame = {
    val p = bandsPath(stateDir)
    if (!new java.io.File(p).exists()) {
      bandRows(corpus.select(col("doc_id"), col("sig")))
        .write.mode("overwrite").parquet(p)
    }
    readBands(spark, stateDir)
  }

  /** Read the whole band index: recursive lookup, because fast-path batches
    * land under `append_<firstKeptId>` subdirs next to the rebuild's root
    * files (see `loadBands`).
    */
  def readBands(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(bandsPath(stateDir))

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

  /** One micro-batch: dedup the arrivals against the survivor store and
    * each other (greedy prefix rule), append survivors, refresh the IVF
    * assignment. Idempotent per unique doc_id set; call from
    * `foreachBatch` or directly (the one-batch call IS the batch oracle).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   threshold: Double = 0.5, nCells: Int = 4): Unit = {
    if (batch.isEmpty) return
    val sigs = batch
      .select(col("doc_id"), col("text"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .select(col("doc_id"),
        Dedup.minhashSignatureFrom(Dedup.shingleHashesFrom(Dedup.tokenHashes(col("text")))).as("sig"),
        col("emb"), norm(col("emb")).as("nrm"))
      .localCheckpoint()
    val existing = loadCorpus(spark, stateDir)

    // arrivals that near-duplicate an already-ingested survivor: the
    // corpus side comes from the PERSISTED band index (loadBands doc) —
    // a narrow (doc_id, band, band_key) scan, no per-batch recompute of
    // Bands keys from every survivor signature
    // The three driver-side inputs of the greedy resolution — dup-of-corpus
    // ids, within-batch near-dup pairs (doc_a < doc_b), and the batch's id
    // list — come back in ONE collect: each branch is tagged and unioned,
    // so a micro-batch pays one Spark action for all of them (three
    // sequential actions was ~⅔ of the corpus leg's per-batch fixed cost).
    // All branches hang off the localCheckpoint'd `sigs`, so nothing is
    // recomputed across branches; the collect stays bounded by the
    // ingest-batch contract (batch ids + candidate pairs, never corpus-sized).
    val dupBranch: Option[DataFrame] = existing.map { corpus =>
      loadBands(spark, stateDir, corpus)
        .select(col("doc_id").as("corpus_id"), col("band"), col("band_key"))
        .join(broadcast(bandRows(sigs).select(col("doc_id").as("batch_id"),
          col("band"), col("band_key"))), Seq("band", "band_key"))
        .select(col("batch_id"), col("corpus_id")).distinct()
        .join(sigs.select(col("doc_id").as("batch_id"), col("sig").as("sig_a")), "batch_id")
        .join(corpus.select(col("doc_id").as("corpus_id"), col("sig").as("sig_b")), "corpus_id")
        .filter(estJaccard(col("sig_a"), col("sig_b")) >= threshold)
        .select(col("batch_id")).distinct()
        .select(lit(0).as("tag"), col("batch_id").as("a"), lit(0L).as("b"))
    }
    val pairBranch = Dedup.lshPairsFromSigs(
        sigs.select(col("doc_id"), col("sig")), threshold)
      .select(lit(1).as("tag"), col("doc_a").as("a"), col("doc_b").as("b"))
    val idBranch = sigs.select(lit(2).as("tag"), col("doc_id").as("a"), lit(0L).as("b"))
    val tagged = (dupBranch.toSeq :+ pairBranch :+ idBranch)
      .reduce(_.unionByName(_)).collect()
    val dupOfCorpus: Set[Long] =
      tagged.iterator.filter(_.getInt(0) == 0).map(_.getLong(1)).toSet
    val inBatchPairs = tagged.iterator.filter(_.getInt(0) == 1)
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val batchIds = tagged.iterator.filter(_.getInt(0) == 2).map(_.getLong(1)).toArray.sorted
    val kept = scala.collection.mutable.LinkedHashSet[Long]()
    batchIds.foreach { id =>
      val dupsEarlierKept = inBatchPairs.getOrElse(id, Set.empty).exists(kept.contains)
      if (!dupOfCorpus.contains(id) && !dupsEarlierKept) kept += id
    }
    if (kept.isEmpty) return
    val keptDf = sigs.filter(col("doc_id").isInCollection(kept))

    // IVF refresh: seeds = first nCells survivors globally; rebuild the
    // whole assignment only while the seed set is still forming
    val priorCount = loadCount(existing, stateDir)
    val seedsChanged = priorCount < nCells
    val allSurvivors = existing match {
      case Some(c) if !seedsChanged =>
        // frozen seeds from the 4-row sidecar — no per-batch corpus scan
        val cents = loadSeeds(spark, stateDir, c, nCells)
        val assigned = assignCells(keptDf, cents)
        // band index BEFORE the survivor append: a crash between the two
        // leaves only phantom band rows (dropped by the candidate join's
        // corpus-sig inner join), never a survivor the index can't see —
        // and the replay OVERWRITES this batch's own subdir (kept sets are
        // disjoint across batches, so `append_<firstKeptId>` names this
        // batch uniquely), so the window cannot duplicate index rows
        bandRows(keptDf.select(col("doc_id"), col("sig")))
          .write.mode("overwrite")
          .parquet(s"${bandsPath(stateDir)}/append_${kept.head}")
        assigned.write.mode("append").parquet(corpusPath(stateDir))
        writeCount(stateDir, priorCount + kept.size)
        return
      case Some(c) => c.select(col("doc_id"), col("sig"), col("emb"), col("nrm"))
        .unionByName(keptDf)
      case None => keptDf
    }
    val allChk = allSurvivors.localCheckpoint()
    val cents = deriveSeeds(allChk, nCells)
    val rebuilt = assignCells(allChk, cents).localCheckpoint()
    // rebuild rewrites the band index wholesale too (same order: bands
    // before corpus), collapsing any crash-window duplicate band rows
    bandRows(rebuilt.select(col("doc_id"), col("sig")))
      .write.mode("overwrite").parquet(bandsPath(stateDir))
    rebuilt.write.mode("overwrite").parquet(corpusPath(stateDir))
    // seeds BEFORE the count (see loadSeeds): the count sidecar is the
    // fast-path commit point, so a crash here costs one more rebuild,
    // never a fast path against seeds the rebuild didn't finish writing
    cents.write.mode("overwrite").parquet(seedsPath(stateDir))
    // rebuilds are rare (seed bootstrap) and the frame is checkpointed, so
    // the exact recount is cheap here — and it self-heals any sidecar drift
    writeCount(stateDir, rebuilt.count())
    bumpRebuilds(stateDir)
  }

  /** Nearest-centroid assignment (cosine, ties to low seed id) — the
    * `ivfTopK` coarse-quantizer contract.
    */
  private def assignCells(docs: DataFrame, cents: DataFrame): DataFrame =
    docs.join(broadcast(cents))
      .select(col("doc_id"), col("sig"), col("emb"), col("nrm"), col("cell_seed"),
        cosineRFromNorms(col("emb"), col("c_emb"), col("nrm"), col("c_nrm")).as("c_cos"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c_cos").desc, col("cell_seed").asc)))
      .filter(col("crk") === 1)
      .select(col("doc_id"), col("sig"), col("emb"), col("nrm"),
        col("cell_seed").as("cell"))

  /** Retrieval over the live index: probe the `nProbe` nearest cells per
    * query, exact cosine inside the probed cells, deterministic top-k.
    * `queries` = (query_id, q_emb double array).
    */
  def retrieve(spark: SparkSession, stateDir: String, queries: DataFrame,
               k: Int = 3, nProbe: Int = 2, nCells: Int = 4): DataFrame = {
    val corpus = loadCorpus(spark, stateDir).getOrElse {
      // no survivor store yet: zero rows, but with the contract schema so
      // callers selecting (query_id, neighbor_id, cos, rnk) get an empty
      // result instead of an AnalysisException
      val schema = org.apache.spark.sql.types.StructType(Seq(
        queries.schema("query_id"),
        org.apache.spark.sql.types.StructField("neighbor_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cos",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("rnk",
          org.apache.spark.sql.types.IntegerType)))
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
    corpus
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
