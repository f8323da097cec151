package graft.ext

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column => C}
import org.apache.spark.sql.functions._

/** Corpus-scrubbing operators for training-data prep: PII redaction,
  * eval-set decontamination, and intra-document repetition signals — the
  * pre-training hygiene passes a large-scale pipeline runs between ingest
  * and dedup (companions to [[Curation]] / [[QualityRules]]; reference
  * quality tier: `src/quality/great_expectations_setup.py`).
  *
  * All three are engine-portable by construction (RE2-safe regexes, md5
  * gram hashes, integer counts) so every query is DuckDB-hash-checked.
  *
  * Scale shapes:
  *  - redaction: pure narrow map, no shuffle at all;
  *  - decontamination: explode train grams → hash-join against the
  *    BROADCAST eval-gram set (eval suites are small by definition) →
  *    per-doc count, map-side combined. The corpus is never all-paired and
  *    the only wide exchange is the final per-doc aggregation;
  *  - repetition: one explode + keyed aggregation on (doc_id, token) with
  *    map-side combine — state O(distinct tokens per doc), never O(corpus).
  */
object Scrub {

  /** RE2-safe PII patterns (identical semantics in Java regex and DuckDB's
    * RE2): email (case-insensitive — a redactor that misses
    * `John@Example.COM` leaks PII), dotted-quad IP, 13-19 digit
    * account/card numbers. Order matters when redacting (emails contain
    * digits; run email first), but the patterns cannot overlap-match each
    * other's replacements because the placeholder tokens contain no `@`
    * or digits.
    */
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\b\\d{13,19}\\b"

  /** Redact PII in place: emails → <EMAIL>, IPs → <IP>, long digit runs →
    * <NUM>. Pure column fns (codegen'd), narrow map.
    */
  def redact(text: C): C =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** Per-document PII audit: counts per category plus the md5 fingerprint
    * of the redacted text (the fingerprint keeps downstream exchanges
    * narrow — consumers join the redacted corpus by doc_id; the full
    * redacted text never needs to shuffle for the audit itself).
    */
  def piiAudit(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Re)).as("n_ips"),
      regexp_count(col(textCol), lit(LongNumRe)).as("n_longnums"),
      md5(redact(col(textCol))).as("redacted_fp"))

  /** Token k-grams of a whitespace-tokenized text column, md5-hashed (the
    * hash, not the gram text, is what shuffles/joins — 32 bytes per gram
    * regardless of k). Documents shorter than k tokens yield no grams.
    */
  def gramHashes(text: C, k: Int): C = {
    val toks = split(text, " ")
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k), i =>
        md5(concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Eval-set decontamination: for every train document, how many of its
    * distinct token k-grams also appear anywhere in the eval corpus
    * (n-gram-overlap decontamination, the standard pre-training hygiene
    * check against benchmark leakage). Returns one row per train doc with
    * `n_shared` and a `contaminated` flag.
    *
    * Shape: eval grams are DISTINCT-ed then BROADCAST (an eval suite is
    * bounded — if it ever weren't, the broadcast hint is the only line to
    * change and AQE falls back to a shuffled join); train grams explode,
    * semi-join the broadcast set, and aggregate per doc with map-side
    * combine. The left join at the end restores zero-overlap docs.
    */
  def decontaminate(train: DataFrame, eval_ : DataFrame, k: Int = 8): DataFrame = {
    // within-doc gram dedup is a NARROW array_distinct before the explode —
    // a corpus-wide (doc_id, g) DISTINCT shuffle would be redundant work,
    // since per-doc uniqueness is all the downstream count needs
    val trainGrams = train
      .select(col("doc_id"),
        explode(array_distinct(gramHashes(col("text"), k))).as("g"))
    val evalGrams = eval_
      .select(explode(gramHashes(col("text"), k)).as("g"))
      .distinct()
    val shared = trainGrams
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
    train.select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** CROSS-document boilerplate detection — the corpus-level repetition
    * axis ([[QualityRules]] covers the intra-document one): a token k-gram
    * is boilerplate when it appears in at least `minDocs` DISTINCT
    * documents (headers, footers, license blocks, template spam); each
    * document is then scored by the fraction of its distinct grams that
    * are boilerplate. This is the passage-level analogue of
    * line-frequency dedup (CCNet/RefinedWeb drop lines shared across
    * many pages).
    *
    * Shape: one explode → distinct (doc, gram-hash) → per-gram
    * distinct-doc count (map-side combined) → the bounded boilerplate set
    * joins back per doc. No all-pairs anywhere; the widest exchange
    * carries (doc_id, 32-byte gram hash) rows.
    */
  def boilerplate(documents: DataFrame, k: Int = 5, minDocs: Int = 3): DataFrame = {
    // Single-pass shape: within-doc dedup is a narrow array_distinct (no
    // corpus-wide DISTINCT shuffle), the per-gram doc count is ONE window
    // over the gram key, and the per-doc rollup is ONE keyed aggregation —
    // the (doc, gram) rows are never recomputed or self-joined. Two
    // exchanges total (by g, then by doc_id), both on 32-byte hashes.
    val docGrams = documents.select(col("doc_id"),
      explode(array_distinct(gramHashes(col("text"), k))).as("g"))
    val perGram = org.apache.spark.sql.expressions.Window.partitionBy("g")
    docGrams
      .withColumn("n_docs_with", count(lit(1)).over(perGram))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        count(when(col("n_docs_with") >= minDocs, 1)).as("n_boiler"))
      .select(
        col("doc_id"), col("n_grams"), col("n_boiler"),
        Quantize.r(col("n_boiler").cast("double") / col("n_grams"), 6)
          .as("boilerplate_frac"))
  }
}
