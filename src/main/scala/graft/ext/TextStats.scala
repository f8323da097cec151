package graft.ext

import graft.functions.Quantize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over a `documents(doc_id, text, lang, source, n_chars)`
  * table: tokenization, quality scoring, n-gram heuristic language ID, and
  * content fingerprinting — the text-side toolkit a large-scale training-data
  * pipeline needs (SURVEY §7.5; generalizes the reference's text/embedding
  * column handling, `sql/timescaledb_schema.sql:267-286`).
  *
  * Everything here is pure column functions — codegen'd, one pass, no UDFs —
  * so a 100 TB corpus processes at scan speed with no shuffle except the
  * final aggregations.
  */
object TextStats {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexer token count: runs of lowercase letters, digits, or single
    * other non-space chars (regex kept to the common dialect subset so the
    * DuckDB oracle matches).
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** English-ish stopword ratio over whitespace tokens. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  def stopwordRatio(toks: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      size(toks).cast("double")
  }

  /** Distinct-token ratio — low values indicate repetitive/boilerplate text. */
  def uniqueTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Composite quality score in [0,1]: length band + lexical diversity −
    * stopword excess. Mirrors the shape of the reference's 4-component DQ
    * scoring (`src/quality/great_expectations_setup.py:123-244`) applied to
    * raw text.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(size(toks).cast("double") / lit(50.0), lit(1.0))
    val divScore = uniqueTokenRatio(toks)
    val stopPenalty = greatest(stopwordRatio(toks) - lit(0.4), lit(0.0))
    greatest(least(lit(0.5) * lenScore + lit(0.5) * divScore - stopPenalty, lit(1.0)), lit(0.0))
  }

  /** N-gram-heuristic language ID: stopword-marker hits per language over the
    * token stream; deterministic CASE cascade (first match wins).
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    when(padded.contains(" the ") || padded.contains(" and "), "en")
      .when(padded.contains(" der ") || padded.contains(" und "), "de")
      .when(padded.contains(" el ") || padded.contains(" los "), "es")
      .when(padded.contains(" le ") || padded.contains(" les "), "fr")
      .when(padded.contains(" de ") || padded.contains(" la "), "romance")
      .otherwise("unknown")
  }

  /** Content fingerprint (md5 — stable across engines). */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonical text normalization for dedup/training prep: lowercase, strip
    * non-alphanumerics to spaces, collapse runs, trim. Pure column fns
    * (codegen'd regexes), narrow map — and RE2-safe patterns so the DuckDB
    * oracle applies the identical transform.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Per-document unigram cross-entropy against the corpus unigram model —
    * the cheap proxy for LM-perplexity quality filtering (CCNet trains a
    * 5-gram LM; the unigram tier is the engine-native first cut): docs
    * whose tokens are all corpus-frequent score low, rare-token soup
    * scores high. logp(token) = ln(count/total) over the whole corpus.
    *
    * Engine-portable by the ordered-fold discipline: each token's logp is
    * quantized, the per-doc sum folds in token-position order (never a
    * partition-order-dependent SUM), and only the final mean is divided.
    * Shape: one explode + token-count aggregation (map-side combined, the
    * model is one row per distinct token), a broadcast-friendly join back,
    * then a per-doc sorted-array fold.
    */
  def unigramCrossEntropy(documents: DataFrame): DataFrame = {
    // The exploded token table feeds BOTH the model counts and the final
    // per-document join — unstaged, Catalyst re-plans (and re-executes)
    // the corpus explode per consumer (r17 plan audit: 18 Exchanges / 2
    // full explodes).
    // Staging the EXPLODED table is a measured decision, re-checked at 10×
    // scale in r18 (staged 6.1 s vs unstaged 6.42 s at ~sf1, anchors
    // matched): one explode + a MEMORY_AND_DISK block read beats
    // re-executing the corpus scan+explode per consumer. At a scale where
    // the exploded corpus exceeds cluster storage, drop THIS stage() (keep
    // `counts` — one row per distinct token, always safe) and pay the
    // second explode instead; see graft.core.Staging's contract.
    val toks = graft.core.Staging.stage(
      documents.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok"))))
    // the corpus total is the sum of the model's counts — one row per
    // distinct token — so it never costs a second corpus explode
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .transform(graft.core.Staging.stage)
    val total = counts.agg(sum(col("c")).as("total"))
    val model = counts
      .crossJoin(broadcast(total))
      .select(col("tok"),
        Quantize.r(-log(col("c").cast("double") / col("total")), 6).as("nll"))
    toks.join(model, Seq("tok"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("nll")))).as("obs"))
      .select(col("doc_id"),
        size(col("obs")).cast("long").as("n_tokens"),
        Quantize.r(
          aggregate(col("obs"), lit(0.0), (acc, x) => acc + x.getField("nll")) /
            size(col("obs")).cast("double"), 6).as("unigram_ce"))
  }

  /** Per-language corpus stats — one agg pass. */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), col("n_chars"), tokens(col("text")).as("toks"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        Quantize.r(avg(size(col("toks")).cast("double")), 6).as("avg_tokens"),
        Quantize.r(avg(col("n_chars").cast("double") / size(col("toks")).cast("double")), 6)
          .as("avg_chars_per_token"))

  /** Top-k TF-IDF terms per document — the classic keyword-extraction /
    * featurization pass. Exact whitespace tokens (no lowercasing: case
    * folding is locale-dependent and not engine-portable), smoothed
    * idf = ln((N+1)/(df+1)). Shape: one explode + two keyed aggregations
    * (term-frequency, then document-frequency) + a per-doc top-k window —
    * every stage map-side combined, the corpus count a 1-row broadcast
    * cross join, never a driver-side collect. Ranking and emitted score
    * both use the QUANTIZED score (tie-broken by term), so cross-engine
    * rank flips cannot outrun value agreement.
    */
  def tfIdfTopK(documents: DataFrame, k: Int = 5): DataFrame = {
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    // staged once: tf feeds both the document-frequency aggregation and
    // the scoring join — unstaged, the explode+count subtree runs twice
    // staged: measured 0.71× vs unstaged at ~sf1 (r18) — tf is doc×term,
    // a contraction of the explode, so it only shrinks relative to input
    val tf = graft.core.Staging.stage(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        Quantize.r(col("tf").cast("double") *
          log((col("n_docs").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))), 6).as("tfidf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"), col("rank"))
  }

  /** Per-document quality record. */
  def docQuality(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(tokens(col("text"))).as("token_count"),
      regexTokenCount(col("text")).as("regex_token_count"),
      Quantize.r(uniqueTokenRatio(tokens(col("text"))), 6).as("unique_token_ratio"),
      Quantize.r(stopwordRatio(tokens(col("text"))), 6).as("stopword_ratio"),
      Quantize.r(qualityScore(col("text")), 6).as("quality_score"))
}
