package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions — pure `org.apache.spark.sql.functions`
  * compositions (codegen'd; no UDFs in the hot path).
  *
  * U1 tokenizer contract from the reference (`app/function/SplitFunction
  * .java:12-29` + `utils/KeywordUtil.java:13-35`): string → word rows, never
  * throws. The IK Chinese analyzer is replaced by a whitespace tokenizer —
  * the operator surface (UDTF → LATERAL/explode) is what's reproduced.
  */
object TextFunctions {

  /** Tokenize into a non-empty lowercase word array — native
    * `graft_tokenize` kernel (codegen'd; the higher-order `filter`
    * rendering it replaces is CodegenFallback and would bar every
    * downstream projection from whole-stage codegen).
    */
  def tokens(text: Column): Column = call_function("graft_tokenize", text)

  /** Distinct token set (order-normalized via array_sort so downstream
    * signatures are deterministic).
    */
  def tokenSet(text: Column): Column = array_sort(array_distinct(tokens(text)))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alnum runs + single non-alnum-non-space chars,
    * the usual pre-tokenizer regex shape.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality-score features (length / punctuation / stopword ratios), the
    * standard pre-training filters. Ratios are rounded to 6dp so batch and
    * oracle hash identically.
    */
  def charLen(text: Column): Column = length(text)
  def punctRatio(text: Column): Column =
    // count-by-deletion: length(text) − length(text minus the class) is the
    // same count as size(regexp_extract_all(class)) without materializing a
    // per-match string array per row (small win — the projection is
    // tokenizer-dominated; value-identical, consumers re-gated)
    round((length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")))
      .cast("double") / greatest(length(text).cast("double"), lit(1.0)), 6)
  /** Ratio variants over a PRE-MATERIALIZED token array column — pass an
    * attribute, not `tokens(text)` inline: a lambda/expression referencing
    * the tokenizer tree N times re-runs the regex split N times per row.
    */
  def stopwordRatioFrom(toks: Column, stops: Seq[String] = Seq("the", "a", "of", "and", "to")): Column =
    round(size(filter(toks, w => w.isInCollection(stops))).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0)), 6)
  def uniqueTokenRatioFrom(toks: Column): Column =
    round(size(array_distinct(toks)).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0)), 6)
  def stopwordRatio(text: Column, stops: Seq[String] = Seq("the", "a", "of", "and", "to")): Column =
    stopwordRatioFrom(tokens(text), stops)
  def uniqueTokenRatio(text: Column): Column = uniqueTokenRatioFrom(tokens(text))

  /** Language-ID: marker-stopword n-gram heuristic. Scores each candidate
    * language by marker-token hits; deterministic argmax with fixed
    * tie-break order (score desc, then language code asc via the fold
    * order). Real deployments swap in a fastText-style model via the same
    * column signature.
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = markers.map { case (lang, ms) =>
      struct(size(filter(toks, w => w.isInCollection(ms))).as("score"), lit(lang).as("lang"))
    }
    // argmax: keep candidate iff strictly greater than best-so-far → first
    // (earliest in `markers`) wins ties, matching the oracle's CASE chain.
    scored.reduceLeft { (best, cand) =>
      when(cand.getField("score") > best.getField("score"), cand).otherwise(best)
    }.getField("lang")
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * exact-dup key that is stable across engines (DuckDB md5 = Spark md5).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** First 8 md5 hex chars as a non-negative long — the cross-engine hash
    * primitive used by minhash/simhash (DuckDB: CAST('0x'||substr(md5(x),1,8)
    * AS BIGINT)).
    */
  def md5Prefix64(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** First 15 md5 hex chars (60 bits) as a long — the wide gram
    * fingerprint for exact-substring span detection, where a 32-bit space
    * would manufacture false duplicates by collision at corpus scale
    * (birthday bound: ~1 collision per 10^5 grams at 32 bits vs ~10^9 at
    * 60). 15 chars, not 16, so the value stays inside a signed BIGINT in
    * every engine (DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT)).
    */
  def md5Prefix60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
