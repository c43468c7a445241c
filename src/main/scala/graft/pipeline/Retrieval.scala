package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions.tokens
import graft.operators.Scale

/** Sparse (BM25) and hybrid (BM25 + dense cosine) retrieval over the
  * `documents` / `embeddings` corpus — the data-curation consumer is
  * "find training documents like these seeds" (targeted up/down-sampling,
  * contamination triage, eval-set expansion), and the serving consumer is
  * the retrieval layer of a RAG stack.
  *
  * Both operators are corpus-derived end to end: the query set is the
  * first `nQueries` documents themselves (more-like-this), with query
  * TERMS mined as each seed's top-TF-IDF tokens — no out-of-band query
  * strings, so the whole computation is reproducible from the tables.
  *
  * Scale shape (the 100 TB story):
  *  - the tf aggregation shuffles on (doc_id, tok) once and feeds BOTH
  *    the query-term mining and the candidate scoring;
  *  - dfreq is vocabulary-sized → size-gated broadcast
  *    (`Scale.maybeBroadcast`), never assumed small;
  *  - the mined query-term list is nQueries·nTerms rows → unconditional
  *    broadcast; candidate generation is a broadcast-hash join of the
  *    posting list against it (docs sharing ≥1 query term), NOT a scan
  *    of all (query, doc) pairs;
  *  - doc lengths ride the same tf aggregation (no second tokenize).
  *
  * Determinism contract (cross-engine hash): per-term BM25 partials are
  * rounded to 6dp and summed as DECIMAL(28,10) — double addition is
  * order-dependent across Spark partitions and DuckDB's aggregate order —
  * then the total is re-rounded to 6dp. avgdl is exact (integer token
  * count sum / doc count) so the double division is reproducible.
  */
object Retrieval {

  /** (doc_id, tok, tf) posting list + (doc_id, dl) lengths, computed from
    * one tokenize pass over an arbitrary (doc_id, text) frame — the entry
    * point the scale sweep feeds replicated corpora through.
    */
  private def postingsFrom(docsIn: DataFrame): (DataFrame, DataFrame) = {
    val docs = docsIn.select(col("doc_id"), tokens(col("text")).as("toks"))
    val tf = docs
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // doc length = Σ tf over the doc's posting rows — derived from the
    // CHECKPOINTED tf instead of a second tokenize pass over the corpus
    // (r15; profiled as a full extra scan+tokenize stage, 7.2 s sumTask at
    // sf0.1). Exact for every doc that can join downstream: a doc appears
    // in the scoring join only via a posting row, and any such doc has
    // ≥1 token, hence a dlen row with the identical Σ tf = size(toks).
    // (Zero-token docs vanish from dlen — they had no posting row to score
    // anyway; avgdl handles them explicitly below.)
    val dlen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    (tf, dlen)
  }

  /** Top-`nTerms` TF-IDF tokens of each seed doc — the mined query terms.
    * Same score construct as `TextPipeline.tfidfTopK` (tf · ln(N/df), 6dp).
    */
  private def queryTerms(tf: DataFrame, dfreq: DataFrame, n: Long,
                         nQueries: Int, nTerms: Int): DataFrame =
    tf.filter(col("doc_id") < nQueries)
      .join(Scale.maybeBroadcast(dfreq), "tok")
      .select(col("doc_id").as("query_id"), col("tok"),
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6).as("score"))
      .withColumn("qrk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("tok").asc)))
      .filter(col("qrk") <= nTerms)
      .select(col("query_id"), col("tok"))

  /** BM25 more-like-this: for each seed doc (doc_id < nQueries), rank the
    * rest of the corpus by Okapi BM25 over the seed's top-`nTerms` TF-IDF
    * tokens. idf is the Robertson/Lucene non-negative form
    * ln(1 + (N − df + 0.5)/(df + 0.5)); k1 = 1.2, b = 0.75.
    */
  def bm25MoreLikeThis(spark: SparkSession, dir: String, nQueries: Int = 10,
                       nTerms: Int = 3, k: Int = 10,
                       k1: Double = 1.2, b: Double = 0.75): DataFrame =
    // metadata-only parquet count (same N contract as tfidfTopK)
    bm25MoreLikeThisFrom(spread(spark, documents(spark, dir)),
      documents(spark, dir).count(), nQueries, nTerms, k, k1, b)

  def bm25MoreLikeThisFrom(docs: DataFrame, n: Long, nQueries: Int = 10,
                           nTerms: Int = 3, k: Int = 10,
                           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, dlen) = postingsFrom(docs)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val qt = queryTerms(tf, dfreq, n, nQueries, nTerms)
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    // denominator is the FULL corpus count `n` (the caller's contract),
    // not count(dlen): dlen now omits zero-token docs (see postingsFrom),
    // which contribute dl = 0 to the sum and 1 to the count — lit(n) keeps
    // avgdl bit-identical to the old all-docs rendering
    val avg = dlen.agg(sum(col("dl")).as("s"))
      .select((col("s").cast("double") / lit(n.toDouble)).as("avgdl"))
    val scored = tf
      .join(broadcast(qt), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(Scale.maybeBroadcast(dfreq), Seq("tok"))
      .join(Scale.maybeBroadcast(dlen), Seq("doc_id"))
      .crossJoin(broadcast(avg))
      .select(col("query_id"), col("doc_id"),
        round(idf * tfNorm, 6).cast("decimal(28,10)").as("part"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("part")).as("s"))
      .select(col("query_id"), col("doc_id"),
        round(col("s").cast("double"), 6).as("bm25"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("bm25").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk").cast("long").as("rnk"), col("bm25"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion: fuse the dense ranking
    * (brute-force cosine over `embeddings`; vec_id ≡ doc_id in the corpus)
    * with the sparse BM25 ranking, score = Σ 1/(c + rank) over the
    * rankings that retrieved the candidate (c = 60, the standard RRF
    * constant). Each side contributes its top-`depth`; fused top-`k` out.
    *
    * RRF needs no score calibration between the two systems — only ranks —
    * which is exactly why it is the default fusion in production hybrid
    * search. Determinism: both input rankings are deterministically
    * tie-broken, and the fused score is a two-term sum of exact
    * reciprocals rounded to 6dp.
    *
    * Scale: the two rankings are top-`depth` per query (tiny) — the fusion
    * join is nQueries·depth rows a side regardless of corpus size.
    */
  def hybridRrf(spark: SparkSession, dir: String, nQueries: Int = 10,
                k: Int = 10, depth: Int = 20, c: Int = 60): DataFrame =
    hybridRrfFrom(spread(spark, documents(spark, dir)), documents(spark, dir).count(),
      spread(spark, embeddings(spark, dir)), nQueries, k, depth, c)

  def hybridRrfFrom(docs: DataFrame, n: Long, vecs: DataFrame, nQueries: Int = 10,
                    k: Int = 10, depth: Int = 20, c: Int = 60,
                    denseLeg: (DataFrame, Int, Int) => DataFrame =
                      Similarity.bruteForceTopKFrom(_, _, _)): DataFrame = {
    // denseLeg is swappable: brute cosine is the exact default (and the
    // oracle contract); pass ivfTopKFrom / pqTopKFrom past RAM scale —
    // the sweep records the IVF-leg variant's scaling
    val dense = denseLeg(vecs, nQueries, depth)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rnk").as("rd"))
    val sparse = bm25MoreLikeThisFrom(docs, n, nQueries, k = depth)
      .select(col("query_id"), col("doc_id"), col("rnk").as("rs"))
    val fused = dense.join(sparse, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(c) + col("rd")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rs")), lit(0.0)), 6).as("rrf"))
    fused
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk").cast("long").as("rnk"), col("rrf"))
  }

  /** Two-stage retrieve→rerank — the production RAG/search topology: a
    * cheap recall stage (hybrid RRF top-`depth`) bounds the candidate
    * list, then an EXPENSIVE scorer runs on candidates only, never the
    * corpus. The reranker here is the exact embedding cosine (the
    * deterministic stand-in for a cross-encoder — same join shape, same
    * cost asymmetry: at 100 TB the stage-2 scorer touches
    * nQueries·depth rows no matter how the corpus grows, which is the
    * entire point of staging). The candidate list broadcasts into both
    * embedding attaches; the heavy model call would sit in exactly that
    * projection.
    */
  def rerankTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
                 depth: Int = 10, k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.{cosineRFromNorms, norm}
    // ONE corpus norm pass + checkpoint feeds the dense recall leg AND both
    // rerank attach legs (r15; previously the dense leg built its own
    // identical withNorms checkpoint — a second corpus materialization job).
    // Identical expression to Similarity.withNormsFrom, so the dense
    // ranking is bit-unchanged.
    val e = spread(spark, embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .localCheckpoint()
    val cands = hybridRrfFrom(spread(spark, documents(spark, dir)),
        documents(spark, dir).count(), e, nQueries, k = depth,
        denseLeg = (_, nq, d) => Similarity.bruteForceTopKNormed(e, nq, d))
      .select(col("query_id"), col("doc_id"))
    val q = e.select(col("vec_id").as("r_qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val d = e.select(col("vec_id").as("r_did"), col("embedding").as("de"), col("nrm").as("dn"))
    val scored = broadcast(cands)
      .join(q, col("query_id") === col("r_qid"))
      .join(d, col("doc_id") === col("r_did"))
      .select(col("query_id"), col("doc_id"),
        cosineRFromNorms(col("qe"), col("de"), col("qn"), col("dn")).as("ce_score"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ce_score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk").cast("long").as("rnk"), col("ce_score"))
  }

  /** The inverted index ITSELF as a table — the artifact a retrieval
    * pipeline persists (term → document-ordered postings with term
    * frequencies), not a query over it. Postings are SEGMENTED into
    * fixed doc-id blocks (`segSize`): at corpus scale a stopword's single
    * posting list outgrows any one row/task, so the index shards into
    * (term, segment) rows that writers emit independently and query-time
    * readers merge by segment order — the standard skew bound that keeps
    * the widest row at `segSize` entries no matter how common the term.
    * One tokenize+explode pass, one (term, doc) aggregate, one
    * (term, segment) list-build: two keyed shuffles, both combinable.
    */
  def indexPostings(spark: SparkSession, dir: String, segSize: Int = 128): DataFrame = {
    val (tf, _) = postingsFrom(spread(spark, documents(spark, dir)))
    tf
      .withColumn("seg", expr(s"doc_id div $segSize"))
      .groupBy(col("tok").as("term"), col("seg"))
      .agg(
        count(lit(1)).as("seg_df"),
        sum(col("tf")).as("seg_cf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("post"))
      .select(col("term"), col("seg"), col("seg_df"), col("seg_cf"),
        // comma-joined rendering: the oracle gate hashes scalars, and the
        // wire format of a posting row is a packed payload anyway
        concat_ws(",", col("post.doc_id")).as("doc_ids"),
        concat_ws(",", col("post.tf")).as("tfs"))
  }

  /** Exact phrase search over POSITIONAL postings — the index structure a
    * bag-of-words posting list can't answer ("new york" ≠ "york new"):
    * tokens explode WITH positions, each query's phrase (its own first
    * bigram) probes the two term lists, and adjacency is an equi-join on
    * pos₂ = pos₁ + 1. Output is (query, doc, occurrence count) — the
    * verification primitive behind quoted-query retrieval and exact-span
    * contamination checks.
    *
    * Scale: query terms broadcast (nQueries·2 rows) and PRE-FILTER the
    * postings scan, so only matching term rows survive to the adjacency
    * join, which is keyed on (query, doc, position) — never a posting-list
    * cross product. The positional postings frame is built once
    * (localCheckpoint) and probed by both phrase legs.
    */
  def phraseMatch(spark: SparkSession, dir: String, nQueries: Int = 10): DataFrame = {
    val pos = spread(spark, documents(spark, dir))
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
      .localCheckpoint()
    val q = pos.filter(col("doc_id") < nQueries && col("pos") <= 1)
      .groupBy(col("doc_id").as("query_id"))
      .agg(max(when(col("pos") === 0, col("tok"))).as("w1"),
        max(when(col("pos") === 1, col("tok"))).as("w2"))
      .filter(col("w1").isNotNull && col("w2").isNotNull)
    val p1 = pos.join(broadcast(q), col("tok") === col("w1"))
      .select(col("query_id"), col("doc_id"), col("pos"))
    val p2 = pos.join(broadcast(q.select(col("query_id").as("q2"), col("w2"))),
        col("tok") === col("w2"))
      .select(col("q2"), col("doc_id").as("d2"), (col("pos") - 1).as("pm1"))
    p1.join(p2, col("query_id") === col("q2") && col("doc_id") === col("d2") &&
        col("pos") === col("pm1"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Retrieval quality evaluation — precision@k and (capped) recall@k of
    * the BM25 more-like-this ranking against the corpus's own structure:
    * a hit is a retrieved document from the QUERY's source (the corpus's
    * topical block), the same labeled-proxy discipline as
    * `text_langid_eval`. This is the audit that belongs NEXT TO every
    * retrieval system: the sweep gates check shape (full top-k, positive
    * scores); this measures whether the ranking finds what it should.
    *
    * recall@k caps the denominator at k (a query with 90 relevant docs
    * can't score above hits/k) — the standard "recall@k" most IR evals
    * report. Per-query rows; macro-average on the consumer side.
    *
    * Scale: the ranked list is nQueries·k rows by construction, source
    * attach rides the byte gate, per-source corpus counts are a
    * catalog-sized broadcast — evaluation cost is corpus-independent
    * once the ranking exists.
    */
  def retrievalEval(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val ranked = bm25MoreLikeThis(spark, dir, k = k)
    val src = documents(spark, dir)
      .select(col("doc_id"), col("source")).localCheckpoint()
    val bySrc = src.groupBy(col("source")).agg(count(lit(1)).as("src_ct"))
    val q = src.join(broadcast(bySrc), "source")
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("source").as("q_src"),
        (col("src_ct") - 1).as("n_rel"))
    ranked
      .join(Scale.maybeBroadcast(src), "doc_id")
      .join(broadcast(q), "query_id")
      .groupBy(col("query_id"), col("n_rel"))
      .agg(sum(when(col("source") === col("q_src"), 1L).otherwise(0L)).as("hits"))
      .select(col("query_id"), col("hits"), col("n_rel"),
        round(col("hits") / lit(k.toDouble), 6).as("p_at_k"),
        // a query that is its source's only member has n_rel = 0: recall
        // is vacuously perfect-by-absence — render 0.0, never null (the
        // raw division would be a silent null metric row)
        when(col("n_rel") === 0, lit(0.0)).otherwise(
          round(col("hits").cast("double") / least(col("n_rel"), lit(k.toLong)), 6))
          .as("recall_at_k"))
  }
}
