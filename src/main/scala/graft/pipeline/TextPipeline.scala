package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Text-analysis queries over `documents` — the keyword pipeline from the
  * reference plus the pre-training text filters (language-ID, quality
  * scoring, token counting, fingerprinting).
  */
object TextPipeline {

  /** U1: tokenizer UDTF surface (`app/function/SplitFunction.java:12-29`,
    * used via LATERAL TABLE at `KeywordStatsApp.java:55-61`): one doc → N
    * word rows. explode(tokens) is the Spark rendering; restricted to
    * doc_id < 20 to keep the dump bounded.
    */
  def u1SplitWords(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .localCheckpoint() // Generate re-evals its input per output row
      .select(col("doc_id"), explode(col("toks")).as("word"))

  /** The planted CJK fixture for `u1_split_words_cjk`: 30 deterministic
    * mixed Latin/Han strings built from an integer code-point formula
    * (`0x4E00 + (i·31 + k·17 + j·7) mod 256` — always inside the URO
    * block), covering every tokenizer branch: a cased ASCII word, a
    * standalone Han run (bigrams), a token with ASCII→Han→ASCII run
    * transitions, and a lone Han character (emitted verbatim). DuckDB
    * rebuilds the identical strings with `chr()` over the same formula —
    * the closed-form-fixture discipline of the media codecs (FIXTURES.md).
    */
  def cjkFixture(spark: SparkSession): DataFrame = {
    def hanRun(i: Long, k: Int, n: Int): String =
      (0 until n).map(j => (0x4E00 + ((i * 31 + k * 17 + j * 7) % 256)).toChar).mkString
    val rows = (0L until 30L).map { i =>
      (i, s"Alpha$i ${hanRun(i, 0, 4)} beta${hanRun(i, 1, 5)}x ${hanRun(i, 2, 1)} mix${hanRun(i, 3, 3)}end")
    }
    spark.createDataFrame(rows).toDF("fid", "text")
  }

  /** U1 (CJK leg): the IK-analyzer-parity behavior of `graft_tokenize` on
    * Chinese text (`app/function/SplitFunction.java:12-29`) — Han runs
    * inside a whitespace token become overlapping character bigrams, Latin
    * runs stay whole words. Runs over the planted fixture (the corpus is
    * ASCII, which would leave this branch oracle-invisible).
    */
  def u1SplitWordsCjk(spark: SparkSession, dir: String): DataFrame =
    cjkFixture(spark)
      .select(col("fid"), tokens(col("text")).as("toks"))
      .localCheckpoint() // Generate re-evals its input per output row
      .select(col("fid"), explode(col("toks")).as("word"))

  /** A4: keyword stats (`app/dws/KeywordStatsApp.java:64-75`): tokenize →
    * count per (word, lang-window). The reference groups per 10s tumble; the
    * batch grain here is `lang` (documents are not a time series), with the
    * constant `source` column preserved.
    */
  def a4KeywordStats(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("lang"), tokens(col("text")).as("toks"))
      .localCheckpoint() // Generate re-evals its input per output row
      .select(col("lang"), explode(col("toks")).as("keyword"))
      .groupBy(col("lang"), col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("source", lit("search"))

  /** Corpus n-gram frequency table (bigrams) — the standard pre-training
    * corpus statistic. Adjacent-token pairs via a materialized token array
    * (zip of the array with its own tail), exploded and counted; top-200
    * with deterministic tie-break so the output is bounded at any corpus
    * size.
    */
  def ngramFrequency(spark: SparkSession, dir: String, topK: Int = 200): DataFrame =
    spread(spark, documents(spark, dir))
      .select(tokens(col("text")).as("toks"))
      .localCheckpoint()
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("bigram").asc)
      .limit(topK)

  /** Per-document n-gram novelty against everything that came before it
    * in ingest order: the fraction of a doc's DISTINCT n-grams whose
    * corpus-wide first appearance (min doc_id) is this doc — the
    * growth-value diagnostic behind "is the new crawl adding anything"
    * (a per-doc refinement of the Heaps'-law curve: low-novelty tails are
    * what incremental dedup will drop anyway).
    *
    * Scale: one gram explode + distinct, one gram-keyed min aggregate
    * (map-side combinable), one join back on the gram key, one doc
    * rollup — every shuffle is keyed by gram or doc id; nothing is
    * ordered globally (ingest order is the doc_id itself).
    */
  def ngramNovelty(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val dg = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .localCheckpoint() // Generate re-evals its input per output row
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
        .as("gram"))
      .distinct()
      .localCheckpoint() // feeds the first-appearance agg AND the join back
    val first = dg.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    dg.join(graft.operators.Scale.maybeBroadcast(first), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  /** Population-stability-index drift between two corpus cohorts — the
    * production data-quality check for "did today's snapshot shift under
    * me": PSI = Σ_cells (p_a − p_b)·ln(p_a/p_b) per feature, the standard
    * monitoring statistic (PSI < 0.1 stable, > 0.25 investigate). Cohorts
    * here are the deterministic doc_id-parity halves (the stand-in for
    * yesterday/today partitions); features are the char-length decile
    * bucket and the lang label. Laplace +1 smoothing over the observed
    * cell union keeps empty cells finite; per-term 6-dp rounds fold in
    * exact decimal so the figure is engine-deterministic.
    *
    * Scale: one map-side cohort/cell projection, a cell-keyed count (cell
    * space is feature-bounded: 10 buckets + the lang catalog), and a
    * per-feature rollup of tens of rows. Corpus size only changes the
    * scan.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val base = documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("doc_id") % 2).as("cohort"))
    val cells = base.select(lit("len_bucket").as("feature"),
        expr("CAST(least(n_chars div 50, 9) AS STRING)").as("cell"), col("cohort"))
      .unionByName(base.select(lit("lang").as("feature"),
        col("lang").as("cell"), col("cohort")))
    val ct = cells.groupBy(col("feature"), col("cell"))
      .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("ct_a"),
        sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("ct_b"))
    val tot = ct.groupBy(col("feature"))
      .agg(sum(col("ct_a")).as("n_a"), sum(col("ct_b")).as("n_b"),
        count(lit(1)).as("n_cells"))
    val pa = (col("ct_a") + lit(1)).cast("double") / (col("n_a") + col("n_cells"))
    val pb = (col("ct_b") + lit(1)).cast("double") / (col("n_b") + col("n_cells"))
    ct.join(broadcast(tot), "feature")
      .select(col("feature"), col("n_cells"),
        round((pa - pb) * log(pa / pb), 6).cast("decimal(28,10)").as("term"))
      .groupBy(col("feature"), col("n_cells"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
  }

  /** Feature hashing (the "hashing trick", Weinberger et al. 2009): each
    * document's tokens land in a FIXED number of hash buckets, giving a
    * bounded-width sparse feature vector no matter how the vocabulary
    * grows — the preprocessing that feeds linear classifiers/regressors
    * at corpus scale without a vocabulary dictionary to build, ship, or
    * keep consistent. Bucket = md5-prefix of the token mod `nBuckets`
    * (engine-portable: any reader recomputes the same bucket with no
    * coordination, the `shardAssign` discipline). Output is the sparse
    * COO form (doc_id, bucket, n) a trainer ingests directly.
    *
    * Scale: tokenize + bucket are map-side; the only shuffle is the
    * (doc_id, bucket)-keyed count with map-side partials — and since
    * bucket count is fixed, row width and key cardinality per doc are
    * both bounded by construction.
    */
  def hashedFeatures(spark: SparkSession, dir: String, nBuckets: Int = 64): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % nBuckets)
          .as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Bigram collocation mining by pointwise mutual information — the
    * classic corpus-linguistics ranking (Church & Hanks 1990) of word
    * pairs that co-occur far more than their unigram frequencies
    * predict. In a training-data pipeline this surfaces templated /
    * boilerplate constructions and multi-word entities worth treating
    * as single tokens. PMI = ln(P(ab) / (P(a)·P(b))) with P(ab) over
    * the bigram stream and P(·) over the token stream, support-floored
    * (`minCount`) so rare-pair noise can't dominate the top of the list.
    *
    * Scale: unigram and bigram count tables are both Heaps'-law-bounded
    * (vocabulary-sized, not corpus-sized) after their one map-side-
    * combinable aggregate each; the two unigram attaches ride the byte
    * gate (broadcast now, SMJ past it), the two totals are 1-row
    * broadcasts, and the top-k plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort). All multiplicands are exact
    * integer-valued doubles far below 2^53 at any tested SF, so the
    * 6-dp-rounded PMI is engine-deterministic.
    */
  def collocations(spark: SparkSession, dir: String, minCount: Long = 5,
                   topK: Int = 100): DataFrame = {
    val toks = spread(spark, documents(spark, dir))
      .select(tokens(col("text")).as("toks"))
      .localCheckpoint()
    // unigram counts feed two joins and the token total: pin once
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      .localCheckpoint()
    val ntRow = uni.agg(sum(col("cu")).as("nt"))
    val bg = toks.filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .localCheckpoint() // feeds the pair counts AND the bigram total
    val nbRow = bg.agg(count(lit(1)).as("nb"))
    bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .join(graft.operators.Scale.maybeBroadcast(
        uni.select(col("tok").as("w1"), col("cu").as("ca"))), "w1")
      .join(graft.operators.Scale.maybeBroadcast(
        uni.select(col("tok").as("w2"), col("cu").as("cb"))), "w2")
      .join(broadcast(ntRow)).join(broadcast(nbRow))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"), col("c_ab"),
        round(log(((col("c_ab").cast("double") * col("nt")) * col("nt")) /
          ((col("nb").cast("double") * col("ca")) * col("cb"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(topK)
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): per doc, the top-k
    * multi-word candidate phrases. Candidates are maximal stopword-free
    * token runs; each word scores degree/frequency within the doc (degree
    * = Σ length of the phrase occurrences containing it — co-occurring
    * words inherit their phrases' weight), and a phrase scores the sum of
    * its words' scores. Everything is doc-local: the shuffles are
    * (doc, word)- and (doc, phrase)-keyed with map-side partials, so the
    * op scales exactly like any per-doc aggregate. Determinism: per-word
    * ratios rounded to 6dp and summed as exact DECIMAL; top-k by
    * (score DESC, phrase ASC).
    */
  def rakeKeyphrases(spark: SparkSession, dir: String, k: Int = 3,
                     stops: Seq[String] = Seq("the", "a", "of", "and", "to")): DataFrame = {
    val joined = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_join(transform(col("toks"),
          w => when(w.isInCollection(stops), lit("|")).otherwise(w)), " ").as("joined"))
    val phr = joined
      .select(col("doc_id"), explode(split(col("joined"), "\\|")).as("seg"))
      .select(col("doc_id"), trim(col("seg")).as("phrase"))
      .filter(col("phrase") =!= "")
      .localCheckpoint() // feeds the word stats AND the phrase rescoring
    val words = phr.select(col("doc_id"), col("phrase"),
      size(split(col("phrase"), " ")).cast("long").as("plen"),
      explode(split(col("phrase"), " ")).as("word"))
    val wstats = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("doc_id"), col("word"),
        round(col("deg").cast("double") / col("freq"), 6)
          .cast("decimal(18,6)").as("wscore"))
    val scored = phr.select(col("doc_id"), col("phrase")).distinct()
      .select(col("doc_id"), col("phrase"), explode(split(col("phrase"), " ")).as("word"))
      .join(wstats, Seq("doc_id", "word"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(round(sum(col("wscore")).cast("double"), 6).as("score"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("phrase").asc)))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("phrase"), col("rnk").cast("long").as("rnk"), col("score"))
  }

  /** Gopher top n-gram coverage: per doc, the fraction of tokens covered
    * by the single MOST FREQUENT 2-/3-/4-gram (`maxct·n / n_tokens`) —
    * the companion to `repetitionScore`'s duplicate-fraction: dup_frac
    * says "many grams repeat", top-coverage says "ONE gram dominates"
    * (chant-style degeneration, templated listings). Docs need ≥2 tokens.
    *
    * Shape at scale (r15): the per-doc max gram count is ROW-LOCAL — the
    * `graft_max_ngram_ct` kernel counts each n's gram multiplicities in
    * one pass over the token array (same `concatWs(" ")` gram strings,
    * same binary equality, same max — kernel scaladoc + KernelSpec), so
    * the whole query is one tokenize projection over the scan: the old
    * three-explode union shuffled a corpus×grams table through TWO
    * aggregations and a pivot just to reduce it back to one row per doc.
    * A doc shorter than n grams scores 0 via the kernel, exactly as its
    * absent pivot cell coalesced to 0. Tie-break-free by construction —
    * only the max COUNT is reported, never which gram achieved it.
    */
  def topNgramCoverage(spark: SparkSession, dir: String): DataFrame = {
    def frac(n: Int) = round(
      (lit(n) * call_function("graft_max_ngram_ct", col("toks"), lit(n)))
        .cast("double") / col("n_tokens"), 6)
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"), col("toks"))
      .select(col("doc_id"), col("n_tokens"),
        frac(2).as("top2_frac"), frac(3).as("top3_frac"), frac(4).as("top4_frac"))
  }

  /** Repetition filter (Gopher-style): per-doc duplicate-bigram fraction —
    * boilerplate and degenerate generations repeat n-grams, clean prose
    * doesn't. `dup_frac = 1 - distinct/total` over adjacent-token bigrams.
    */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame = {
    // graft_ngrams == the old zip_with-of-slices rendering, codegen'd
    // (r15; <2 tokens → empty array either way)
    val bg = call_function("graft_ngrams", col("toks"), lit(2))
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), bg.as("bg"))
      .select(col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        (size(col("bg")) - size(array_distinct(col("bg")))).cast("long").as("n_repeated"),
        when(size(col("bg")) > 0,
          round(lit(1.0) - size(array_distinct(col("bg"))).cast("double") /
            size(col("bg")).cast("double"), 6)).otherwise(0.0).as("dup_frac"))
  }

  /** Deterministic stratified sampling (domain mixing): keep each document
    * iff its md5-derived bucket falls under the per-source rate — the
    * reproducible, cluster-stable alternative to `sample()` (no RNG state,
    * no partition sensitivity; the same doc always makes the same cut).
    * Rates here: 25% for single-digit sources, 75% for the rest — the
    * "downweight common crawl, upweight curated" shape of a mixing config.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("source"),
        pmod(md5Prefix64(col("doc_id").cast("string")), lit(1000L)).as("bucket"),
        when(length(col("source")) === 4, lit(250)).otherwise(lit(750)).as("cut"))
      .filter(col("bucket") < col("cut"))
      .select(col("doc_id"), col("source"), col("bucket"))

  /** Bottom-k quota sample: EXACTLY min(k, n) docs per source, chosen by
    * hash rank — the fixed-quota complement to `stratifiedSample` (whose
    * bucket threshold yields a proportional, variable-size draw). Hash
    * order makes the draw deterministic, uniform, and STABLE under corpus
    * growth: a doc already in the sample only ever leaves when a
    * smaller-hash doc arrives, so incremental pipelines don't resample
    * the world (it is the KMV/bottom-k sketch applied as a sampler).
    * At scale: one shuffle by source; rank+filter prunes to k·|sources|
    * rows — Spark runs the rank-limit window with per-partition
    * early-stop, never a global sort.
    */
  /** Per-epoch deterministic shuffle: every training epoch gets its own
    * reproducible corpus ordering — shard = hash(epoch, doc) mod nShards,
    * order = hash rank WITHIN the shard — with membership identical across
    * epochs and orderings decorrelated between them (the data-ordering
    * contract LLM training needs: no epoch sees the corpus in the same
    * order, every run sees the same orders). At scale this is the honest
    * construction: a 100 TB corpus is never globally sorted — readers
    * consume shards independently, each shard's order is a bounded local
    * sort, and the (epoch, shard) exchange is the only movement. Re-runs
    * and stragglers reproduce the exact same schedule from the hash alone.
    */
  def epochShuffle(spark: SparkSession, dir: String,
                   nEpochs: Int = 3, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perShard = Window.partitionBy("epoch", "shard").orderBy(col("h"), col("doc_id"))
    documents(spark, dir)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(nEpochs - 1))).as("epoch"))
      .withColumn("h", md5Prefix64(
        concat_ws("_", lit("ep"), col("epoch"), col("doc_id"))))
      .withColumn("shard", (col("h") % nShards).cast("long"))
      .withColumn("ord", row_number().over(perShard).cast("long"))
      .select(col("epoch").cast("long").as("epoch"), col("doc_id"),
        col("shard"), col("ord"))
  }

  def bottomKSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySource = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5Prefix64(col("doc_id").cast("string")).as("h"))
      .withColumn("smp_rank", row_number().over(bySource).cast("long"))
      .filter(col("smp_rank") <= k)
      .select(col("doc_id"), col("source"), col("smp_rank"))
  }

  /** Per-document top-k TF-IDF terms (classic IR weighting):
    * score = tf · ln(N/df), rounded to 6dp for cross-engine hashing;
    * deterministic top-k per doc (score desc, term asc). Restricted to
    * doc_id < 100 to bound the dump; the tf/df tables are the full-corpus
    * computation either way.
    */
  def tfidfTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    // N from the raw table: a metadata-only parquet count, not a count
    // through the spread exchange + tokenizer projection
    val n = documents(spark, dir).count()
    val tf = docs
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok").asc)
    // dfreq is vocabulary-sized — it grows with the corpus, so the hint is
    // size-gated, not unconditional (Scale.maybeBroadcast)
    tf.join(graft.operators.Scale.maybeBroadcast(dfreq), "tok")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("tok"),
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("tok"), col("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Per-document unigram surprisal — the cheapest useful LM-quality
    * signal: mean −ln p(tok) over the doc's token occurrences under the
    * corpus unigram model (p = cf/N over OCCURRENCES). Low scores flag
    * boilerplate/templated text (every token common), high scores flag
    * noise/gibberish (rare tokens) — the first-pass filter a pre-training
    * pipeline applies before anything model-based.
    *
    * Cross-engine hash determinism: the per-token term tf·ln(N/cf) is
    * rounded to 6dp (the same proven-stable construct as `tfidfTopK`),
    * summed EXACTLY as DECIMAL(28,10) — double summation is
    * order-dependent, and Spark and DuckDB aggregate in different orders —
    * then divided and re-rounded.
    *
    * Scale: one tf aggregation (shuffle on (doc_id, tok)), one
    * vocabulary-sized cf aggregation, a size-gated broadcast back, and a
    * per-doc agg. N rides along as a 1-row cross join, not a collected
    * literal.
    */
  def surprisalScore(spark: SparkSession, dir: String): DataFrame = {
    val tf = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("total"),
        explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("total"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cf"))
    val nRow = cf.agg(sum(col("cf")).cast("double").as("n"))
    tf.join(graft.operators.Scale.maybeBroadcast(cf), "tok")
      .join(broadcast(nRow))
      .select(col("doc_id"), col("total"),
        round(col("tf") * log(col("n") / col("cf")), 6)
          .cast("decimal(28,10)").as("term"))
      .groupBy(col("doc_id"), col("total"))
      .agg(sum(col("term")).as("s"))
      .select(col("doc_id"),
        round(col("s").cast("double") / col("total"), 6).as("surprisal"))
  }

  /** Bigram-LM cross-entropy score — the classic perplexity quality filter
    * one order up from `surprisalScore`'s unigram model: mean
    * −ln P(w2|w1) over a doc's adjacent-token bigrams under the corpus
    * bigram model with add-one smoothing,
    * P(w2|w1) = (C(w1,w2)+1) / (C(w1)+V). Degenerate/boilerplate text
    * scores low (its bigrams are corpus-frequent), rare-construction text
    * scores high. Bit-deterministic across engines the same way as
    * `surprisalScore`: ln over exact integer ratios, per-term 6dp
    * rounding, decimal fold, final 6dp division. Scale shape: the bigram
    * table is pinned once and feeds both the corpus counts and the
    * per-doc counts; unigram/bigram count tables attach via size-gated
    * broadcasts (SMJ past the gate), the vocab size as a one-row
    * broadcast. Docs with <2 tokens have no bigrams and don't appear.
    */
  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val toks = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .localCheckpoint()
    val cu = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val vRow = cu.agg(count(lit(1)).as("v"))
    // bigrams via the codegen'd graft_ngrams kernel (r15): the zip_with/
    // slice/struct tree was CodegenFallback — interpreted, allocating per
    // element — and profiled as this query's dominant stage (18 s sumTask
    // at sf0.1). w1 is recovered as the bigram's first space-delimited
    // field, exact because tokens cannot contain spaces (the tokenizer
    // splits on \s+; the CJK fallback emits space-free Han bigrams).
    val bg = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), (size(col("toks")) - 1).cast("long").as("total"),
        explode(call_function("graft_ngrams", col("toks"), lit(2))).as("bigram"))
      .select(col("doc_id"), col("total"),
        substring_index(col("bigram"), " ", 1).as("tok"), col("bigram"))
      .localCheckpoint()
    val cb = bg.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
    bg.groupBy(col("doc_id"), col("total"), col("tok"), col("bigram"))
      .agg(count(lit(1)).as("bf"))
      .join(graft.operators.Scale.maybeBroadcast(cu), "tok")
      .join(graft.operators.Scale.maybeBroadcast(cb), "bigram")
      .join(broadcast(vRow))
      .select(col("doc_id"), col("total"),
        round(col("bf") * log((col("cu") + col("v")).cast("double") / (col("cb") + lit(1))), 6)
          .cast("decimal(28,10)").as("term"))
      .groupBy(col("doc_id"), col("total"))
      .agg(sum(col("term")).as("s"))
      .select(col("doc_id"),
        round(col("s").cast("double") / col("total"), 6).as("bigram_surprisal"))
  }

  /** Curriculum/mixture buckets: decile (by default) assignment over the
    * corpus surprisal distribution — the quality-tier partitioning a
    * curriculum schedule or quality-weighted mixture samples from. Global
    * rank comes from `Scale.distributedPrefixSum` (no single-partition
    * window over the corpus); the bucket boundary is pure integer math
    * (`(rank−1)·k DIV n + 1` — NTILE's distribution, engine and oracle
    * agree exactly), with the one-row corpus count broadcast.
    */
  def qualityBuckets(spark: SparkSession, dir: String, nBuckets: Int = 10): DataFrame = {
    // pinned once: both the rank pass and the one-row count read the
    // materialized scores instead of re-running the surprisal shuffles
    val s = surprisalScore(spark, dir).localCheckpoint()
    val n = s.agg(count(lit(1)).as("__n"))
    graft.operators.Scale.distributedPrefixSum(s.withColumn("__one", lit(1L)),
        Seq(col("surprisal").asc, col("doc_id").asc), "__one", "__rnk")
      .join(broadcast(n))
      .select(col("doc_id"), col("surprisal"),
        (expr(s"(__rnk - 1) * $nBuckets DIV __n") + 1).cast("long").as("bucket"))
  }

  /** Language-ID heuristic per doc (marker-stopword score argmax). */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("lang").as("labeled_lang"), langId(col("text")).as("pred_lang"))

  /** Classifier evaluation for the lang-ID heuristic: the (labeled ×
    * predicted) confusion matrix against the corpus's ground-truth lang
    * column — the accuracy audit you run BEFORE trusting any
    * language-quota sampling or per-lang filter built on the predictor
    * (the eval-first discipline of the minhash/KMV/CMS accuracy gates,
    * applied to a classifier). Per-class precision/recall read straight
    * off the matrix rows/columns.
    *
    * Scale: map-side prediction + one |langs|²-bounded aggregate — the
    * matrix never outgrows the label catalog however large the corpus.
    */
  def langIdEval(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("lang").as("labeled"), langId(col("text")).as("predicted"))
      .groupBy(col("labeled"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Quality-score features: the standard C4/Gopher-style ratio filters.
    * Tokens materialized once per row in their own projection — the ratio
    * columns reference the attribute, not five inline tokenizer runs.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        charLen(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        punctRatio(col("text")).as("punct_ratio"),
        stopwordRatioFrom(col("toks")).as("stopword_ratio"),
        uniqueTokenRatioFrom(col("toks")).as("unique_ratio"))

  /** Token counting: whitespace tokens + BPE-ish subword pre-tokens. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir)).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("ws_tokens"),
      subwordCount(col("text")).cast("long").as("subword_tokens"))

  /** Document fingerprinting: md5 of normalized text (exact-dup key) plus a
    * 64-bit rolling-hash-style prefix for sharded storage.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir)).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      md5Prefix64(col("text")).as("fp64"))

  /** PII patterns shared by the redaction op and its oracle: kept to the
    * regex subset where Java regex (Spark) and RE2 (DuckDB) agree —
    * character classes + bounded repetition, no backreferences/lookaround.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val LongNumberPattern = "[0-9]{6,}"

  /** PII scrubbing — the pass a training corpus runs before anything else:
    * redact email addresses and long digit runs (ids, phone numbers),
    * keeping per-doc match counts so the filter rate is observable. One
    * narrow projection; at 100 TB this is pure map-side work.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir)).select(
      col("doc_id"),
      regexp_replace(regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
        LongNumberPattern, "<NUM>").as("clean_text"),
      size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(LongNumberPattern), lit(0)))
        .cast("long").as("n_long_numbers"))

  /** Token-length histogram per language (bucket width 10) — the corpus
    * shape statistic every length-filter threshold is tuned against.
    * One narrow projection + one tiny grouped aggregate.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("lang"),
        (floor(size(tokens(col("text"))) / 10) * 10).cast("long").as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("ct"))

  /** Training-sequence packing (concat-and-chunk): documents are
    * concatenated per source in doc_id order and the token stream split
    * into fixed-budget bins — the standard GPT-style data-prep step that
    * turns a ragged corpus into fixed-length training rows. A document is
    * assigned to the bin its first token lands in (`cum_before / budget`),
    * so the assignment is a pure running sum: one window over
    * (source, doc_id), then a per-bin aggregate.
    *
    * Scale: the window partitions by `source` — in a real corpus that is
    * the shard key (packing is per-shard by construction; cross-shard
    * packing would make the output depend on global file order). No global
    * sort, no driver state.
    */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("source"), tokenCount(col("text")).cast("long").as("n_toks"))
      .withColumn("cum_before", sum(col("n_toks")).over(w) - col("n_toks"))
      .withColumn("bin", floor(col("cum_before") / budget).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Context-window chunking with overlap — the retrieval/embedding prep
    * step `packSequences` doesn't cover: each document's token sequence is
    * split into windows of `chunkSize` tokens starting every `stride`
    * tokens (consecutive chunks overlap by `chunkSize − stride`, so no
    * span is lost at a window boundary). The final chunk may be short;
    * every token appears in at least one chunk. Entirely map-side — one
    * tokenize, one `sequence`-explode, one slice per chunk; no shuffle at
    * any corpus size.
    */
  def chunkDocuments(spark: SparkSession, dir: String,
                     chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && chunkSize >= stride, "need 0 < stride <= chunkSize")
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .localCheckpoint() // Generate re-evals its input per output row
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start"))
      .select(col("doc_id"), (col("start") / stride).cast("long").as("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(chunkSize)).as("ctoks"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk"))
  }

  /** T5-style span corruption — the seq2seq denoising objective's
    * preprocessing: ~10% of token positions start a 3-token mask span
    * (overlaps merge into one run), each contiguous run is replaced by a
    * numbered sentinel in the INPUT and expanded as sentinel + original
    * tokens in the TARGET. Mask choice is a deterministic md5 of
    * (doc_id, position) — reproducible across engines, languages, and
    * reruns, the same no-RNG discipline as every sampler here.
    *
    * Plan: posexplode → per-doc ordered window for the 3 lags + the
    * cumulative run index (LINEAR per doc — a per-position `aggregate`
    * prefix-scan would be O(len²)) → one doc-keyed reassembly aggregate.
    * The doc_id shuffle is the only corpus-scale exchange and it is the
    * same per-doc partitioning every sequence op shares. concat_ws skips
    * the nulls of non-emitting masked positions, so reassembly is one
    * sorted collect per doc.
    */
  def spanCorrupt(spark: SparkSession, dir: String,
                  startMod: Int = 10, spanLen: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val cum = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ex = spread(spark, documents(spark, dir))
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
      .withColumn("start",
        pmod(md5Prefix64(concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"))), lit(startMod.toLong)) === 0)
    val flagged = ex
      .withColumn("masked",
        (0 until spanLen).map(k => coalesce(lag(col("start"), k).over(byDoc), lit(false)))
          .reduce(_ || _))
      .withColumn("runstart",
        col("masked") && !coalesce(lag(col("masked"), 1).over(byDoc), lit(false)))
      .withColumn("runidx", sum(col("runstart").cast("long")).over(cum))
    val pieces = flagged.select(col("doc_id"), col("pos"), col("masked"),
      when(col("runstart"),
        concat(lit("<extra_id_"), (col("runidx") - 1).cast("string"), lit(">")))
        .when(!col("masked"), col("tok")).as("in_piece"),
      when(col("runstart"),
        concat(lit("<extra_id_"), (col("runidx") - 1).cast("string"), lit("> "), col("tok")))
        .when(col("masked"), col("tok")).as("tgt_piece"))
    pieces.groupBy(col("doc_id"))
      .agg(
        sum(col("masked").cast("long")).as("n_masked"),
        count(when(col("in_piece").startsWith("<extra_id_"), 1)).as("n_spans"),
        concat_ws(" ", transform(sort_array(collect_list(
          struct(col("pos"), col("in_piece")))), p => p("in_piece"))).as("input_text"),
        concat_ws(" ", transform(sort_array(collect_list(
          struct(col("pos"), col("tgt_piece")))), p => p("tgt_piece"))).as("target_text"))
  }

  /** Deterministic training-shard assignment — the dataloader contract: a
    * document lands in one of `nShards` shards by a stable cross-engine
    * hash of its id (`md5Prefix64`, reproducible by any worker in any
    * language), with a within-shard position from the same hash — a
    * reshuffle of the corpus that needs no coordination and no stored
    * permutation. The `row_number` window partitions by shard, so the sort
    * parallelizes across shards; within one shard the ordering work equals
    * the file-write order a shard writer produces anyway (corpus/nShards
    * rows per sort task at any corpus size).
    */
  def shardAssign(spark: SparkSession, dir: String, nShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("h64").asc, col("doc_id").asc)
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), md5Prefix64(col("doc_id").cast("string")).as("h64"))
      .withColumn("shard", pmod(col("h64"), lit(nShards.toLong)).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Quality-ranked corpus selection under a global token budget — "take
    * the best documents until N tokens", the curation step behind every
    * fixed-budget training run. The global running sum over the quality
    * ordering goes through `Scale.distributedPrefixSum` (range-partition →
    * per-partition subtotals → broadcast prefix offsets → within-partition
    * cumsum), never a single-partition `Window.orderBy` over the corpus.
    */
  def tokenBudgetSample(spark: SparkSession, dir: String, budget: Long = 20000L): DataFrame = {
    val q = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        uniqueTokenRatioFrom(col("toks")).as("quality"),
        size(col("toks")).cast("long").as("n_tokens"))
    graft.operators.Scale.distributedPrefixSum(q,
        Seq(col("quality").desc, col("doc_id").asc), "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("cum_tokens"))
  }

  /** Character-distribution Shannon entropy per document (nats) — the
    * gibberish/boilerplate signal character-level quality filters
    * threshold on (a natural-text doc sits near the language's typical
    * entropy; mashed keys, base64 blobs and repeated-char padding fall
    * far outside). Entirely map-side via the `graft_char_entropy` codegen
    * kernel: one projection, no per-character explode/groupBy shuffle —
    * at 100 TB this scores the corpus at scan speed.
    */
  def charEntropyScore(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir)).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      round(call_function("graft_char_entropy", col("text")), 6).as("entropy"))

  /** Language rebalancing — downsample over-represented languages to the
    * least-represented language's count, the standard multilingual-corpus
    * mixing step. Per-language acceptance is integer per-mille
    * ((1000·n_min) DIV n_l — integer math, so engine and oracle agree
    * exactly), and acceptance itself is the same deterministic md5 bucket
    * as `stratifiedSample`: no RNG, no partition sensitivity, any worker
    * can recompute membership. Scale shape: the language histogram is a
    * map-side-combined aggregate of ≤ #languages rows, the rate table is
    * broadcast, the filter is map-side — one narrow pass over the corpus.
    */
  def langBalanceSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(spark, documents(spark, dir)).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val mins = counts.agg(min(col("n_l")).as("n_min"))
    val rates = counts.join(broadcast(mins))
      .select(col("lang"), expr("least(1000L, (1000L * n_min) DIV n_l)").as("permille"))
    docs.join(broadcast(rates), "lang")
      .filter(pmod(md5Prefix64(col("doc_id").cast("string")), lit(1000L)) < col("permille"))
      .select(col("doc_id"), col("lang"), col("permille"))
  }

  /** Per-source corpus report — the "dataset card" rollup a curation run
    * publishes: document and token counts, mean document length, the
    * quality-filter pass rate (permille, integer-exact), and the
    * within-source near-duplicate pair count, one row per source. Pure
    * composition of already-audited pipelines (`filterReasons`,
    * `Dedup.minhashLsh`) joined down to a catalog-sized aggregate — the
    * expensive inputs are the pipelines themselves, each with its own
    * oracle; the report adds only source-keyed joins over id-sized rows.
    */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    val src = spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("source"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .localCheckpoint()
    val kept = filterReasons(spark, dir).select(col("doc_id"), col("kept"))
    val agg = src.join(kept, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).cast("long").as("n_tokens"),
        round(sum(col("n_toks")).cast("double") / count(lit(1)), 2).as("mean_tokens"),
        expr("(1000 * sum(kept)) DIV count(1)").as("kept_permille"))
    val ids = src.select(col("doc_id"), col("source"))
    val dups = graft.pipeline.Dedup.minhashLsh(spark, dir)
      .join(ids.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(ids.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .filter(col("sa") === col("sb"))
      .groupBy(col("sa").as("source"))
      .agg(count(lit(1)).as("dup_pairs"))
    agg.join(dups, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("mean_tokens"),
        col("kept_permille"), coalesce(col("dup_pairs"), lit(0L)).as("dup_pairs"))
  }

  /** Temperature-based source mixture sampling — the standard
    * multilingual/multi-source rebalancing knob: target share of source s
    * ∝ n_s^τ (τ < 1 flattens the mixture, upweighting small sources
    * without the min-clamp cliff of `langBalanceSample`). Per-source
    * sampling rate ∝ share/size = n_s^(τ−1), normalized so the smallest
    * source keeps everything (permille 1000); membership is the same
    * engine-portable md5 cut as every sampler here, so any worker
    * recomputes the draw without coordination.
    *
    * Scale: a source-catalog-sized aggregate, two one-row broadcasts,
    * and a map-side filter — nothing scales but the scan.
    */
  def temperatureSample(spark: SparkSession, dir: String, tau: Double = 0.7): DataFrame = {
    val docs = spread(spark, documents(spark, dir)).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val rates0 = counts
      .select(col("source"), (round(pow(col("n_s"), lit(tau)), 6) / col("n_s")).as("q"))
    val mx = rates0.agg(max(col("q")).as("mq"))
    val rates = rates0.crossJoin(broadcast(mx))
      .select(col("source"),
        least(lit(1000L), floor(lit(1000.0) * col("q") / col("mq"))).as("permille"))
    docs.join(broadcast(rates), "source")
      .filter(pmod(md5Prefix64(col("doc_id").cast("string")), lit(1000L)) < col("permille"))
      .select(col("doc_id"), col("source"), col("permille"))
  }

  /** Vocabulary coverage table — the statistic a tokenizer vocabulary is
    * cut from: the top-`topK` tokens by corpus frequency with their global
    * rank and CUMULATIVE coverage fraction ("the top 200 tokens cover X%
    * of all occurrences"). Rank and running sum both come from
    * `Scale.distributedPrefixSum` under one total ordering
    * (freq desc, tok asc) — no single-partition window over the
    * vocabulary, which at web scale reaches hundreds of millions of
    * distinct tokens. One explode→groupBy shuffle builds the frequency
    * table (map-side combined); the one-row total is broadcast.
    */
  def vocabCoverage(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    // pinned: feeds both the one-row total and the rank pass
    val tf = spread(spark, documents(spark, dir))
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val total = tf.agg(sum(col("freq")).cast("double").as("total"))
    graft.operators.Scale.distributedPrefixSum(tf,
        Seq(col("freq").desc, col("tok").asc), "freq", "cum_freq", Some("rnk"))
      .join(broadcast(total))
      .filter(col("rnk") <= topK)
      .select(col("tok"), col("freq"), col("rnk"),
        round(col("cum_freq").cast("double") / col("total"), 6).as("coverage"))
  }

  /** Zipf-law fit over the corpus token frequency table: least-squares
    * slope/intercept of ln(freq) on ln(rank) — the one-row corpus
    * diagnostic (natural text sits near slope −1; a far-off slope flags
    * boilerplate floods or synthetic/degenerate text). Rank comes from
    * `Scale.distributedPrefixSum` (no single-partition window over the
    * vocabulary); the regression reduces to five scalar sums, each a
    * rounded-then-decimal fold so the fit is order-independent and
    * hash-stable. The unrounded slope feeds the intercept, mirrored
    * exactly by the oracle.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val tf = spread(spark, documents(spark, dir))
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val dec = "decimal(28,10)"
    val sums = graft.operators.Scale.distributedPrefixSum(tf,
        Seq(col("freq").desc, col("tok").asc), "freq", "__cum", Some("rnk"))
      .select(log(col("rnk")).as("x"), log(col("freq")).as("y"))
      .select(round(col("x"), 6).cast(dec).as("x"), round(col("y"), 6).cast(dec).as("y"),
        round(col("x") * col("x"), 6).cast(dec).as("xx"),
        round(col("x") * col("y"), 6).cast(dec).as("xy"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("xx")).cast("double").as("sxx"), sum(col("xy")).cast("double").as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    sums.select(col("n").cast("long").as("n_vocab"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every character 5-gram of the lowercased text,
    * slide a window of 4 hashes, keep the minimum per window, emit the
    * distinct selected hashes as the document's fingerprint set. The
    * guarantee: any verbatim match of length ≥ w+k−1 = 8 chars shares a
    * fingerprint, at ~2/(w+1) the index density of all-grams — the
    * cheap-index complement to the exact-substring span machinery (which
    * finds and strips the duplicated ranges; this is the partial-copy
    * DETECTOR you run first at scale).
    *
    * Entirely map-side, one `graft_winnow` kernel call per row (hash +
    * O(m) deque sliding-min + dedup in a single native pass; the kernel
    * returns the distinct selected hashes, so no post-explode distinct
    * shuffle). The first rendering was an interpreted three-HOF tree —
    * lower(text) re-evaluated per gram, a slice per window — which AQE's
    * small-bytes coalescing then funneled into ONE task: ~17 min on a
    * core at sf0.1 for work the kernel does in under a second. Compute-
    * heavy narrow transforms must be codegen'd AND their cost is
    * invisible to size-based partition coalescing — the kernel fixes
    * both. Hashing is engine-portable md5-prefix; docs shorter than k
    * drop out on both engines.
    */
  def winnowFingerprints(spark: SparkSession, dir: String, k: Int = 5,
                         w: Int = 4): DataFrame =
    spread(spark, documents(spark, dir))
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(call_function("graft_winnow", col("text"), lit(k), lit(w))).as("fph"))

  /** Partial-copy pair detection — the consumer of `winnowFingerprints`:
    * document pairs sharing ≥ `minShared` selected fingerprints, after
    * dropping "stop fingerprints" present in more than `maxDf` docs
    * (corpus boilerplate — headers, templates — is repetition, not
    * copying, and without the cut its buckets go quadratic). The same
    * bucket-join discipline as MinHash-LSH: candidates meet only inside
    * a fingerprint bucket whose fan-out the df cut bounds, so the
    * self-join is Σ_fph df² with df ≤ maxDf — never corpus².
    */
  def winnowPairs(spark: SparkSession, dir: String, k: Int = 5, w: Int = 4,
                  minShared: Int = 2, maxDf: Int = 50): DataFrame = {
    val fps = winnowFingerprints(spark, dir, k, w).localCheckpoint()
    val rare = fps.groupBy(col("fph")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("fph"))
    val pruned = fps.join(graft.operators.Scale.maybeBroadcast(rare), "fph")
    pruned.as("x").join(pruned.as("y"),
        col("x.fph") === col("y.fph") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Heaps'-law fit — the companion corpus-health diagnostic to
    * `zipfFit`: vocabulary growth V(N) ≈ K·N^β measured at `points`
    * growing corpus prefixes (docs 0..cp_i), least-squares over
    * (ln N_i, ln V_i). β far from the ~0.4–0.8 natural-text band flags a
    * synthetic or truncated corpus; the fitted curve also predicts vocab
    * (= tokenizer pressure, dedup-structure sizes) at 100 TB from a
    * sample — which is exactly how this engine's own "vocabulary is
    * orders below the corpus" scaling arguments are validated.
    *
    * Scale shape: ONE tokenize pass feeds a per-doc count table
    * (corpus → nDocs rows) and a token-first-appearance table
    * (vocab rows via min(doc_id)); both cross the tiny checkpoint list
    * (broadcast, `points` rows) — prefix totals and prefix vocab sizes
    * come from those compact tables, never a rescan per checkpoint.
    * Same decimal least-squares determinism contract as `zipfFit`.
    */
  def heapsFit(spark: SparkSession, dir: String, points: Int = 10): DataFrame = {
    val occ = spread(spark, documents(spark, dir))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .localCheckpoint()
    val nDocs = documents(spark, dir).count()
    val cps = (1 to points).map(i => (i, (nDocs * i + points - 1) / points))
    import spark.implicits._
    val cpDf = broadcast(cps.toDF("i", "cp"))
    val docCnt = occ.groupBy(col("doc_id")).agg(count(lit(1)).as("cnt"))
    val firstDoc = occ.groupBy(col("tok")).agg(min(col("doc_id")).as("fdoc"))
    val n = docCnt.crossJoin(cpDf).filter(col("doc_id") < col("cp"))
      .groupBy(col("i")).agg(sum(col("cnt")).cast("long").as("n"))
    val v = firstDoc.crossJoin(cpDf).filter(col("fdoc") < col("cp"))
      .groupBy(col("i")).agg(count(lit(1)).as("v"))
    val dec = "decimal(28,10)"
    val sums = n.join(v, Seq("i"))
      .select(log(col("n")).as("lx"), log(col("v")).as("ly"))
      .select(round(col("lx"), 6).cast(dec).as("x"), round(col("ly"), 6).cast(dec).as("y"),
        round(col("lx") * col("lx"), 6).cast(dec).as("xx"),
        round(col("lx") * col("ly"), 6).cast(dec).as("xy"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("xx")).cast("double").as("sxx"), sum(col("xy")).cast("double").as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    sums.select(col("n").cast("long").as("n_points"),
      round(slope, 6).as("beta"),
      round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
  }

  /** First BPE merge step (tokenizer vocabulary induction): adjacent
    * character-pair frequencies over the corpus, weighted by word count —
    * the ranked merge candidates a byte-pair encoder would fuse first.
    * The classic scaling trick applies: aggregate the corpus to its
    * (word, count) vocabulary FIRST — vocabulary grows sub-linearly with
    * corpus size (Heaps' law), so the character-pair explosion runs over
    * the compact distinct-word table, not the raw corpus. One shuffle on
    * word (map-side partial counts), one on the ~|alphabet|² pair space.
    */
  def bpePairFreq(spark: SparkSession, dir: String, topK: Int = 200): DataFrame =
    spread(spark, documents(spark, dir))
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("freq"))
      .orderBy(col("freq").desc, col("pair").asc)
      .limit(topK)

  /** Per-document out-of-vocabulary rate against the top-`topK` corpus
    * vocabulary — the tokenizer-fit statistic (a doc whose occurrences
    * fall mostly outside the vocab cut will fragment into subwords). The
    * vocabulary side is the `vocabCoverage` cut, broadcast (top-K is tiny
    * by construction); the corpus side is one explode→left-join→groupBy
    * pass with map-side partial aggregation. Docs with zero tokens carry
    * no occurrences and so don't appear — same contract as the oracle.
    */
  def oovRate(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val vocab = vocabCoverage(spark, dir, topK)
      .select(col("tok"), lit(1L).as("__in"))
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the average per-occurrence log-likelihood ratio between a TARGET
    * unigram distribution (here: the `targetLang` slice of the corpus —
    * in production, a benchmark or high-quality seed corpus) and the full
    * corpus distribution, with add-one smoothing over the shared
    * vocabulary. Documents that look like the target score high; sampling
    * proportional to exp(weight) is the published resampling step and a
    * trivial consumer of this table.
    *
    * Scale shape: both frequency tables come out of the ONE tf
    * aggregation (map-side combined explode→groupBy — the same shuffle
    * `surprisalScore` pays); the merged token table joins back size-gated
    * (`Scale.maybeBroadcast` — a web-scale vocabulary falls back to a
    * shuffle join), and the three corpus constants are a one-row
    * broadcast. The log-ratio is rounded ONCE per DISTINCT token and the
    * per-doc contribution is `tf × ratio` in exact decimal — so the only
    * floating-point op whose last-ulp behavior must agree across engines
    * is one `ln` per vocabulary entry, not one per (doc, token) product
    * (a per-product rounding sat on a half-boundary at sf0.1 and split
    * Spark from the oracle by 1e-6; per-token rounding shrinks the
    * boundary surface by the corpus/vocabulary ratio and the decimal fold
    * keeps the rest exact under any partitioning).
    */
  def dsirWeight(spark: SparkSession, dir: String, targetLang: String = "en"): DataFrame = {
    // materialized once: the tf table feeds the doc-side join, the
    // frequency tables, and the corpus constants — without the pin the
    // corpus tokenize/explode subtree plans (and runs) three times
    val tf = spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), size(col("toks")).cast("long").as("total"),
        explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("total"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val freq = tf.groupBy(col("tok"))
      .agg(sum(col("tf")).as("cf"),
        sum(when(col("lang") === targetLang, col("tf")).otherwise(0L)).as("tq"))
    val consts = freq.agg(sum(col("cf")).cast("double").as("nc"),
      sum(col("tq")).cast("double").as("nt"), count(lit(1)).cast("double").as("v"))
    val ratios = freq.join(broadcast(consts))
      .select(col("tok"),
        round(log((col("tq") + 1) / (col("nt") + col("v")))
          - log((col("cf") + 1) / (col("nc") + col("v"))), 6)
          .cast("decimal(18,6)").as("lr"))
    tf.join(graft.operators.Scale.maybeBroadcast(ratios), "tok")
      .select(col("doc_id"), col("total"),
        (col("tf").cast("decimal(10,0)") * col("lr")).as("term"))
      .groupBy(col("doc_id"), col("total"))
      .agg(sum(col("term")).as("s"))
      // round(s/total, 6) in pure integer math: s is scale-6 decimal, so
      // s·10⁶ is an exact integer and HALF_UP division is
      // sign·((2|s6|+total) DIV 2·total) — the double rendering sat
      // EXACTLY on half-boundaries (−0.088309/26 = −0.0033965) where
      // Spark's shortest-repr rounding and the oracle's scaled-double
      // rounding legally disagree; integers cannot.
      .select(col("doc_id"), col("total").as("n_tokens"),
        expr("""CAST(CAST(signum(s) AS BIGINT) *
          ((2 * abs(CAST(s * 1000000 AS BIGINT)) + total) DIV (2 * total))
          AS DOUBLE) / 1000000.0""").as("dsir_weight"))
  }

  /** DSIR selection — the sampling step the importance weights exist for
    * (Xie et al. 2023 §3: sample ∝ the estimated importance ratio). Uses
    * the Gumbel-top-k trick, which turns "sample k docs without
    * replacement with probability ∝ exp(weight)" into "take the k largest
    * of weight + Gumbel noise" — a pure ORDERING problem a distributed
    * engine solves without rejection loops, coordination, or an RNG whose
    * partition-order sensitivity would break replay. The noise is
    * deterministic: u = (md5(doc_id)[0,2³²) + ½)/2³² → g = −ln(−ln u), so
    * any worker (or the DuckDB oracle) recomputes the identical draw.
    * k = ⌈permille·N/1000⌉; the global rank over the Gumbel keys comes
    * from `Scale.distributedPrefixSum` — range partition + per-partition
    * ranks + P-row offset window, never a single-partition corpus sort.
    */
  def dsirSample(spark: SparkSession, dir: String, permille: Int = 250): DataFrame = {
    val w = dsirWeight(spark, dir).localCheckpoint()
    val n = w.agg(count(lit(1)).as("__n"))
    val u = (conv(substring(md5(concat(lit("dsir:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyed = w.select(col("doc_id"), col("dsir_weight"),
      round(col("dsir_weight") - log(-log(u)), 6).as("gumbel_key"))
    graft.operators.Scale.distributedPrefixSum(keyed.withColumn("__one", lit(1L)),
        Seq(col("gumbel_key").desc, col("doc_id").asc), "__one", "rnk")
      .join(broadcast(n))
      .filter(col("rnk") <= expr(s"(__n * $permille + 999) DIV 1000"))
      .select(col("doc_id"), col("dsir_weight"), col("gumbel_key"), col("rnk"))
  }

  /** Corpus-wide boilerplate n-gram mining: word `n`-grams appearing in at
    * least `minDocs` DISTINCT documents — the repeated-span inventory a
    * boilerplate-stripping pass is built from (headers, footers, license
    * blocks, templated sentences). Distinct from `Dedup.contamination`,
    * which checks overlap against a fixed benchmark set; this one has no
    * reference corpus — repetition itself is the signal. Per-doc grams are
    * DEDUPLICATED before the explode, so the one shuffle is keyed by gram
    * with map-side partial counts; at 100 TB the standard refinement is a
    * sampled pre-pass cutoff on gram frequency, which drops in front of
    * the same aggregate.
    */
  def boilerplateNgrams(spark: SparkSession, dir: String, n: Int = 5,
                        minDocs: Int = 3): DataFrame = {
    val grams = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= n,
          array_distinct(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(o => element_at(col("toks"), i + o)): _*))))
          .otherwise(array().cast("array<string>")).as("gram_arr"))
      .localCheckpoint() // Generate re-evals its input per output row
      .select(col("doc_id"), explode(col("gram_arr")).as("gram"))
    // rows are (doc, gram)-distinct by construction: count(*) == doc count
    grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Boilerplate stripping — the consumer of `boilerplateNgrams`: every
    * token position covered by an occurrence of a mined corpus-repeated
    * `n`-gram is removed, and the survivors are re-joined into
    * `clean_text` (headers/footers/license blocks vanish, prose stays).
    * Same mining contract as `boilerplateNgrams` (≥ `minDocs` distinct
    * docs). Scale shape: occurrences shuffle as (gram, doc, start)
    * id-rows against the size-gated mined table; the position mask is a
    * per-row higher-order filter (interpreted, but output-shaping, not a
    * join hot path); one left join carries the tiny covered-starts arrays
    * back to the corpus.
    */
  def boilerplateStrip(spark: SparkSession, dir: String, n: Int = 5,
                       minDocs: Int = 3): DataFrame = {
    val mined = boilerplateNgrams(spark, dir, n, minDocs).select(col("gram"))
    val docs = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .localCheckpoint() // feeds the occurrence explode AND the final join
    val covered = docs
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("toks")) - n),
        i => struct(i.as("start"), concat_ws(" ",
          (0 until n).map(o => element_at(col("toks"), i + 1 + o)): _*).as("gram")))).as("g"))
      .select(col("doc_id"), col("g.start").as("start"), col("g.gram").as("gram"))
      .join(graft.operators.Scale.maybeBroadcast(mined), "gram")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("start"))).as("starts"))
    docs.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("doc_id"), col("toks"), when(size(col("toks")) > 0,
          filter(sequence(lit(0), size(col("toks")) - 1),
            p => !exists(col("starts"), s => s <= p && p <= s + (n - 1))))
          .otherwise(array().cast("array<int>")).as("kept"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", transform(col("kept"),
          p => element_at(col("toks"), p + 1))).as("clean_text"))
  }

  /** Quality-filter pipeline with rejection reason codes — production
    * corpus filters must report WHY a document was dropped (filter-rate
    * dashboards, ablation studies), not just emit the survivors. One
    * narrow map-side projection: every rule is a column expression over
    * the materialized token array; `reasons` is the comma-joined list of
    * failed rules, `kept` the 0/1 survival flag.
    *
    * Thresholds are corpus-tuned the way a real pipeline's are (each rule
    * rejects a meaningful, non-degenerate slice — see the length
    * histogram / repetition operators used to pick them).
    */
  def filterReasons(spark: SparkSession, dir: String): DataFrame = {
    val bg = zip_with(
      slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
      slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        when(size(col("toks")) > 1,
          round(lit(1.0) - size(array_distinct(bg)).cast("double") /
            size(bg).cast("double"), 6)).otherwise(0.0).as("dup_frac"),
        round(size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double"), 6).as("uniq_ratio"))
      .select(col("doc_id"), col("n_tokens"),
        filter(array(
          when(col("n_tokens") < 20, "too_short"),
          when(col("n_tokens") > 80, "too_long"),
          when(col("dup_frac") > 0.05, "repetitive"),
          when(col("uniq_ratio") < 0.4, "low_diversity")), _.isNotNull).as("rs"))
      .select(col("doc_id"), col("n_tokens"),
        when(size(col("rs")) === 0, 1L).otherwise(0L).as("kept"),
        concat_ws(",", col("rs")).as("reasons"))
  }

  /** Count-Min sketch heavy hitters: approximate token frequencies under a
    * FIXED d×w cell budget (here 4×1024 longs = 32 KB regardless of corpus
    * size), the streaming/serving answer to "what are the hot tokens"
    * when a vocabulary-sized exact aggregate is too big to keep. Each
    * token increments one bucket per hash row; the estimate is the min of
    * its d cells — always ≥ the true count (collisions only inflate), so
    * thresholding on the estimate has NO false negatives: every true
    * heavy hitter is in the output.
    *
    * Output: tokens whose ESTIMATE clears `permille`/1000 of total
    * occurrences, with both the exact and estimated counts so the
    * overestimate bound is observable (spec-asserted: est ≥ exact, and
    * exact-threshold tokens are all present).
    *
    * Scale shape: the sketch is built from the (token, count) VOCABULARY
    * (Heaps' law — orders smaller than the corpus), not the raw
    * occurrence stream, one d-way explode over it; cells (d·w rows, fixed)
    * broadcast back for the min-estimate; total occurrences is a 1-row
    * broadcast, never a collected literal. The same plan ingesting a
    * stream becomes: partial d×w cell aggregates per micro-batch, merged
    * by key — the classic mergeable-sketch property.
    *
    * Hashing is engine-portable md5 (`md5Prefix64("j_tok") % w`) so the
    * DuckDB oracle reproduces every cell exactly.
    */
  /** Per-source KL divergence from the corpus unigram distribution —
    * the drift diagnostic a multi-source corpus needs: KL(P_source ‖
    * P_corpus) with add-one smoothing over the corpus vocabulary, so a
    * source whose token mix diverges (different language register, spam
    * infiltration, template text) scores high and an on-distribution
    * source scores near 0. The companion to `dsirWeight` (which
    * importance-weights DOCUMENTS against a target; this scores SOURCES
    * against the corpus).
    *
    * Scale shape: one tokenize/explode pass pinned (`localCheckpoint`)
    * feeds the three aggregates; the sum runs over the (vocab × sources)
    * grid — vocabulary is Heaps'-law bounded and sources are a catalog,
    * so the grid is orders below corpus size; source totals and the
    * (N, V) constants ride as broadcasts.
    *
    * Determinism: per-token terms are rounded to 10dp (they range down
    * to ~1e-9; 6dp would zero the tail) and summed as DECIMAL(28,12);
    * the final figure re-rounds to 6dp — the engine-wide cross-engine
    * contract.
    */
  def klPerSource(spark: SparkSession, dir: String): DataFrame = {
    val occ = spread(spark, documents(spark, dir))
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .localCheckpoint()
    val corpusCnt = occ.groupBy(col("tok")).agg(count(lit(1)).as("cc"))
    val srcCnt = occ.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cs"))
    val srcTot = occ.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val totals = corpusCnt.agg(sum(col("cc")).cast("long").as("nc"), count(lit(1)).as("v"))
    val ps = (col("cs") + lit(1.0)) / (col("ns") + col("v"))
    val pc = (col("cc") + lit(1.0)) / (col("nc") + col("v"))
    corpusCnt
      .crossJoin(broadcast(srcTot))
      .join(srcCnt, Seq("source", "tok"), "left")
      .na.fill(0L, Seq("cs"))
      .crossJoin(broadcast(totals))
      .select(col("source"), round(ps * log(ps / pc), 10).as("term"))
      .groupBy(col("source"))
      .agg(round(sum(col("term").cast("decimal(28,12)")).cast("double"), 6).as("kl"))
  }

  /** The d×w CMS cell table as a PURE transform over a (text) frame —
    * identical under batch and `readStream` (groupBy agg in update/
    * complete mode): the mergeable-sketch property, micro-batch partial
    * cells merge by (j, bucket) key. `StreamingParitySpec` asserts the
    * streamed cells equal this batch computation; `cmsHeavyHitters`
    * builds the same cells from the vocabulary instead of raw
    * occurrences (cheaper batch path — cross-checked in its spec).
    */
  def cmsCells(docs: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    docs.select(explode(tokens(col("text"))).as("tok"))
      .select(col("tok"), explode(array((0 until d).map(lit(_)): _*)).as("j"))
      .select(col("j"),
        pmod(md5Prefix64(concat_ws("_", col("j"), col("tok"))), lit(w.toLong)).as("bucket"))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))

  def cmsHeavyHitters(spark: SparkSession, dir: String, d: Int = 4,
                      w: Int = 1024, permille: Int = 2): DataFrame = {
    val vocab = spread(spark, documents(spark, dir))
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      .localCheckpoint()
    val total = vocab.agg(sum(col("exact")).as("n_total"))
    val withBuckets = vocab
      .select(col("tok"), col("exact"),
        explode(array((0 until d).map(lit(_)): _*)).as("j"))
      .select(col("tok"), col("exact"), col("j"),
        pmod(md5Prefix64(concat_ws("_", col("j"), col("tok"))), lit(w.toLong)).as("bucket"))
    val cells = withBuckets
      .groupBy(col("j"), col("bucket")).agg(sum(col("exact")).as("cnt"))
    withBuckets
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("tok"), col("exact")).agg(min(col("cnt")).as("est"))
      .crossJoin(broadcast(total))
      .filter(col("est") * 1000 >= col("n_total") * permille)
      .select(col("tok"), col("exact"), col("est"))
  }

  /** Multimodal plumbing: treat payloads as opaque binary + typed metadata.
    * The decode/feature-extract step is a STUB (no image/audio libs in this
    * container): features here are byte-length and content hash — the
    * Spark-side schema, batch shape and partitioning are the real part; a
    * real deployment swaps the feature exprs for a `mapInPandas`-equivalent
    * `mapPartitions` decoder with the same (id, media BINARY, meta) → (id,
    * features ARRAY<DOUBLE>) contract.
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        col("lang").as("media_type"))
      .select(
        col("doc_id"), col("media_type"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_hash"))

  /** Byte-pair-encoding merge TRAINING (Sennrich et al. 2016): `nMerges`
    * iterations of count-adjacent-pairs → pick the most frequent → fuse
    * it corpus-wide. Extends `bpePairFreq` (which ranks the FIRST merge's
    * candidates) to the full iterative loop.
    *
    * The distributed shape is the industrial one: train on the (word,
    * count) VOCABULARY — sub-linear in corpus size by Heaps' law — never
    * on raw text. Each word is a padded space-separated symbol string
    * (`" h e l l o "`); an iteration is (a) one agg over exploded
    * adjacent symbol pairs, (b) a single-row collect of the winner (the
    * merge table IS driver state, like trained k-means centroids), (c)
    * one literal `replace` of `" a b "` with `" ab "` — left-to-right
    * non-overlapping, exactly BPE's greedy fuse. Only the BASE vocabulary
    * is `localCheckpoint`ed; iteration K's plan replays the K−1 literal
    * replaces over it, which costs string ops on a Heaps'-bounded table —
    * cheaper than a materialization job per round (r14).
    *
    * Returns the learned merge table (step, pair_a, pair_b, freq) —
    * deterministic ties broken by (freq desc, a asc, b asc).
    */
  def bpeTrain(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    var vocab = spread(spark, documents(spark, dir))
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
      .select(concat(lit(" "),
        array_join(regexp_extract_all(col("word"), lit("."), lit(0)), " "),
        lit(" ")).as("sym"), col("wf"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to nMerges) {
      val top = vocab
        .withColumn("toks", split(trim(col("sym")), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("wf"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wf")).as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step.toLong, a, b, f))
        // replace TWICE: back-to-back occurrences (" a b a b ") share the
        // boundary space, so one left-to-right non-overlapping pass skips
        // every other one; after a pass the skipped pairs are isolated
        // (each skip directly follows a merge), so the second pass reaches
        // the fixpoint — which equals BPE's greedy fuse.
        val (pat, rep) = (lit(s" $a $b "), lit(s" $a$b "))
        // NOT re-checkpointed per round (r14): the chained literal
        // replaces are a few string ops over the Heaps'-bounded vocab —
        // re-evaluating rounds 1..K-1 inside round K's aggregate is
        // cheaper than a materialization JOB per round (8 jobs saved;
        // the one base checkpoint above still pins the corpus tokenize)
        vocab = vocab
          .withColumn("sym", replace(replace(col("sym"), pat, rep), pat, rep))
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "pair_a", "pair_b", "freq")
  }

  /** BPE encode — the consumer of `bpeTrain`: tokenize the corpus under the
    * trained merge table and report per-doc piece counts (the statistic
    * token budgets, packing, and cost models run on). The corpus is never
    * re-segmented row by row: the DISTINCT word vocabulary is encoded ONCE
    * (all `nMerges` literal two-pass replaces fuse into a single collapsed
    * projection over the Heaps'-bounded vocab), and docs join the encoded
    * (word → piece count) table by word — the identical
    * encode-the-vocab-then-join shape production tokenizer pipelines use.
    * At 100 TB the vocab table passes the broadcast gate or falls back to
    * one word-keyed SMJ; the corpus side is one explode + one aggregate.
    */
  def bpeEncode(spark: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    import spark.implicits._
    val merges = bpeTrain(spark, dir, nMerges).orderBy("step")
      .as[(Long, String, String, Long)].collect()
    val vocab0 = spread(spark, documents(spark, dir))
      .select(explode(tokens(col("text"))).as("word"))
      .distinct()
      .select(col("word"), concat(lit(" "),
        when(length(col("word")) >= 2,
          array_join(regexp_extract_all(col("word"), lit("."), lit(0)), " "))
          .otherwise(col("word")), lit(" ")).as("sym"))
    val encoded = merges.foldLeft(vocab0) { case (df, (_, a, b, _)) =>
      val (pat, rep) = (lit(s" $a $b "), lit(s" $a$b "))
      df.withColumn("sym", replace(replace(col("sym"), pat, rep), pat, rep))
    }.select(col("word"),
      size(split(trim(col("sym")), " ")).cast("long").as("np"))
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(graft.operators.Scale.maybeBroadcast(encoded), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words").cast("double"), 6)
          .as("pieces_per_word"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis priority sampling): each doc draws priority −ln(u)/w where
    * w is its token count and u is an md5-derived uniform on (0,1); the k
    * smallest priorities are an exact weighted-without-replacement draw.
    * This closes the gap in the sampler family: `stratifiedSample` /
    * `temperatureSample` reweight GROUPS by per-group rates, but nothing
    * sampled individual rows proportionally to a per-row weight. Like
    * every sampler here the "randomness" is an md5 hash, so membership is
    * RNG-free, partition-insensitive, and recomputable by any worker.
    *
    * Scale: one narrow pass computes priorities; top-k plans as
    * TakeOrderedAndProject (per-partition k-heaps merged on the driver,
    * k rows each) — no global sort, no corpus-wide shuffle at any size.
    * Selection orders on the UNROUNDED priority (ties broken by doc_id);
    * the rounded value is emitted for the oracle hash.
    */
  def prioritySample(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    spread(spark, documents(spark, dir))
      .select(col("doc_id"),
        greatest(size(tokens(col("text"))), lit(1)).cast("long").as("n_tokens"),
        ((pmod(md5Prefix64(col("doc_id").cast("string")), lit(1000000L)) + lit(1L))
          .cast("double") / lit(1000001.0)).as("u"))
      .withColumn("prio", -log(col("u")) / col("n_tokens").cast("double"))
      .orderBy(col("prio").asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_tokens"), round(col("prio"), 6).as("priority"))

  /** Curriculum phase assignment: global quality rank (distinct-token
    * ratio, the `dedup_keep_best` metric) → equal-mass phases 0..9,
    * phase 0 = cleanest documents. The data-side half of curriculum
    * learning — train on high-quality text first, anneal toward the
    * noisy tail — and the deterministic ordering contract a resumable
    * multi-epoch loader needs (phase boundaries move only when the
    * corpus does, not with partitioning).
    *
    * Scale: the global rank is `Scale.distributedPrefixSum`'s rank path
    * (range partition + per-partition row numbers + broadcast offsets),
    * NEVER a single-partition `Window.orderBy`; the phase split is one
    * integer division against the broadcast corpus count.
    */
  def curriculumPhase(spark: SparkSession, dir: String, phases: Int = 10): DataFrame = {
    val q = spread(spark, documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        round(size(array_distinct(col("toks"))).cast("double") /
          greatest(size(col("toks")).cast("double"), lit(1.0)), 6).as("quality"))
      .withColumn("one", lit(1L))
    val ranked = graft.operators.Scale.distributedPrefixSum(q,
      Seq(col("quality").desc, col("doc_id").asc), "one", "cum", Some("rnk"))
      .drop("cum", "one")
    ranked.join(broadcast(q.agg(count(lit(1)).as("n"))))
      .select(col("doc_id"), col("quality"),
        expr(s"((rnk - 1) * $phases) div n").as("phase"))
  }

  /** Reshard-cost audit: what fraction of the corpus MOVES when the shard
    * count grows k → k+1, under (a) mod-hashing (≈ k/(k+1) of everything
    * moves — the naive scheme's hidden cost) vs (b) rendezvous/HRW
    * hashing (≈ 1/(k+1) moves — the consistent-hashing guarantee). At
    * 100 TB this difference IS the decision: resharding a mod-hashed
    * store rewrites the whole corpus. Both schemes are pure md5 column
    * math (the rendezvous winner = argmax of per-shard keyed hashes,
    * first-occurrence ties), so the audit is one map-side pass + a 2-row
    * aggregate, and the moved-fraction figures are exact, not modeled.
    */
  def shardRebalance(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val sh = spread(spark, documents(spark, dir)).select(col("doc_id"))
      .withColumn("h", md5Prefix64(col("doc_id").cast("string")))
      .withColumn("scores", transform(sequence(lit(0), lit(k)),
        s => md5Prefix64(concat(col("doc_id").cast("string"), lit("_"), s.cast("string")))))
      .select(
        when(pmod(col("h"), lit(k.toLong)) =!= pmod(col("h"), lit(k.toLong + 1)), 1L)
          .otherwise(0L).as("mv_mod"),
        when(array_position(col("scores"), array_max(col("scores"))) === (k + 1), 1L)
          .otherwise(0L).as("mv_rdv"))
      .localCheckpoint() // one scan feeds both method rows
    def leg(c: String, name: String) = sh.agg(
        count(lit(1)).as("n_docs"), sum(col(c)).as("n_moved"))
      .select(lit(name).as("method"), col("n_docs"), col("n_moved"),
        round(col("n_moved").cast("double") / col("n_docs"), 6).as("moved_frac"))
    leg("mv_mod", "mod").unionAll(leg("mv_rdv", "rendezvous"))
  }

  /** Mixture plan: given per-source token masses and a √n target mixture
    * (the standard multilingual/multi-domain flattening), compute the
    * LARGEST total token budget B such that no source is over-drawn
    * (B = min_s ⌊n_s / w_s⌋ — the binding source caps the epoch), plus
    * each source's sampling rate and take. This is the arithmetic every
    * data-mixing config encodes by hand; as an operator it recomputes
    * from live counts when the corpus changes. √n terms are rounded 6dp
    * and decimal-summed so the normalization is order-free; everything
    * downstream is exact doubles on both engines.
    *
    * Scale: one corpus aggregate onto the source catalog; the plan math
    * runs on catalog-sized rows.
    */
  def mixturePlan(spark: SparkSession, dir: String): DataFrame = {
    val src = spread(spark, documents(spark, dir))
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
    val tot = src.agg(
      sum(round(sqrt(col("n_tokens").cast("double")), 6).cast("decimal(28,10)")).as("sq_sum"))
    val w = src.join(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        round(round(sqrt(col("n_tokens").cast("double")), 6) /
          col("sq_sum").cast("double"), 6).as("weight"))
    val budget = w.agg(
      min(floor(col("n_tokens").cast("double") / col("weight")).cast("long")).as("budget"))
    w.join(broadcast(budget))
      .select(col("source"), col("n_tokens"), col("weight"), col("budget"),
        round(col("weight") * col("budget").cast("double") /
          col("n_tokens").cast("double"), 6).as("rate"),
        floor(col("weight") * col("budget").cast("double")).cast("long").as("take_tokens"))
  }

  /** Text-normalization audit — the cleanup pass every web corpus runs
    * before anything else (strip non-printing control characters, collapse
    * horizontal-whitespace runs, trim), reported as per-doc before/after
    * lengths plus a changed flag so the cleanup's bite is measurable per
    * source. Newlines survive (paragraph structure is signal); only
    * C0 controls minus \n, DEL, and space/tab runs are touched. Pure
    * map-side regexp projection — scores the corpus at scan speed.
    */
  def normalizeStats(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(col("text"),
      "[\\x00-\\x08\\x0B-\\x1F\\x7F]", ""), "[ \\t]+", " "))
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("raw_len"),
        length(norm).cast("long").as("norm_len"),
        (length(col("text")) - length(norm)).cast("long").as("removed"),
        when(norm =!= col("text"), lit(1L)).otherwise(lit(0L)).as("changed"))
  }

  /** Deflate compression ratio per document — the information-density
    * quality heuristic production curation uses alongside entropy
    * (near-duplicate boilerplate and repeated-template pages compress far
    * below natural prose; random/base64 blobs barely compress at all).
    * One reused `java.util.zip.Deflater` (level 6) per PARTITION — the
    * rich-function open/close lifecycle — so the native zlib context is
    * paid once per task, not per row. Map-side only; nothing shuffles.
    * No SQL oracle (DuckDB has no deflate scalar): gated by the spec's
    * independent per-row recomputation + ordering sanity instead, and
    * registered rows-only for the driver.
    */
  def compressionRatio(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    import session.implicits._
    spread(spark, documents(spark, dir))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          d.reset(); d.setInput(raw); d.finish()
          var comp = 0L
          while (!d.finished()) comp += d.deflate(buf)
          val ratio = comp.toDouble / math.max(raw.length, 1).toDouble
          (id, raw.length.toLong, comp,
            math.rint(ratio * 1e6) / 1e6, math.floor(ratio * 10).toLong)
        }
      }
      .toDF("doc_id", "raw_bytes", "comp_bytes", "ratio", "bucket")
  }

  /** Two-sample Kolmogorov–Smirnov test between cohort document-length
    * distributions — the distribution-drift gate a curation pipeline runs
    * when a new crawl snapshot or source lands ("did the length profile
    * shift?"), complementing `psiDrift` (binned, feature-level) with the
    * bin-free exact statistic D = sup|F_a − F_b| plus the α=0.05
    * decision. Cohorts here: the curated short-name sources vs the rest
    * (the `stratifiedSample` split).
    *
    * Scale shape: the corpus collapses to a per-distinct-length histogram
    * (value-bounded, ≪ corpus), both cohort ECDFs ride ONE
    * `distributedPrefixSumMulti` pass over it (one shared range
    * partitioning, no single-partition window over the value space), and
    * the sup-gap is a one-row max. Integer counts feed the one double
    * division, so engine and oracle agree exactly.
    */
  def ksLengths(spark: SparkSession, dir: String): DataFrame = {
    val t = spread(spark, documents(spark, dir))
      .select(when(length(col("source")) === 4, lit("a")).otherwise(lit("b")).as("c"),
        size(tokens(col("text"))).cast("long").as("v"))
    val h = t.groupBy(col("v")).agg(
      sum(when(col("c") === "a", 1L).otherwise(0L)).as("na"),
      sum(when(col("c") === "b", 1L).otherwise(0L)).as("nb"))
      .localCheckpoint() // feeds both the totals and the ECDF pass
    val cum = graft.operators.Scale.distributedPrefixSumMulti(h,
      Seq(col("v").asc), Seq("na" -> "ca", "nb" -> "cb"))
    val tot = h.agg(sum(col("na")).cast("long").as("ta"),
      sum(col("nb")).cast("long").as("tb"))
    cum.crossJoin(broadcast(tot))
      .select(col("ta"), col("tb"),
        abs(col("ca").cast("double") / col("ta").cast("double") -
          col("cb").cast("double") / col("tb").cast("double")).as("gap"))
      .groupBy(col("ta"), col("tb"))
      .agg(max(col("gap")).as("dmax"))
      .withColumn("crit",
        lit(1.358) * sqrt((col("ta") + col("tb")).cast("double") /
          (col("ta").cast("double") * col("tb").cast("double"))))
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        round(col("dmax"), 6).as("ks_stat"),
        round(col("crit"), 6).as("crit_05"),
        when(col("dmax") > col("crit"), lit(1L)).otherwise(lit(0L)).as("reject"))
  }
}
