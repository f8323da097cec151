package graft.ext

import graft.functions.Quantize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style rule-based quality filtering over `documents` — the
  * repetition and composition heuristics LLM training-data pipelines apply
  * before dedup (Rae et al. 2021 §A1.1; complements the score-based
  * [[TextStats.qualityScore]], which mirrors the reference's DQ scoring
  * `src/quality/great_expectations_setup.py:123-244`).
  *
  * Per-document metrics, each a narrow one-pass column expression:
  *  - `n_words`, `mean_word_len` — composition band checks;
  *  - `stopword_ratio` — natural-language-ness (shares
  *    [[TextStats.Stopwords]] with the quality score);
  *  - `dup_bigram_fraction` — 1 − distinct/total bigrams, the repetition
  *    signal (boilerplate and decoding loops score high);
  *  - `top_word_fraction` — most-frequent-token share, the other
  *    repetition axis (computed via explode → two-level hash agg, map-side
  *    combined, so the shuffle carries one row per (doc, distinct token)).
  *
  * `passes` is decided on the QUANTIZED metrics so an ULP disagreement
  * cannot flip a document across the rule boundary between engines — same
  * discipline as the PSI/KS severity tiers.
  */
object QualityRules {

  val MinWords          = 30
  val MeanWordLenLo     = 3.0
  val MeanWordLenHi     = 10.0
  val MinStopwordRatio  = 0.02
  val MaxDupBigramFrac  = 0.10
  val MaxTopWordFrac    = 0.20

  /** doc_id, metrics (quantized), passes. */
  def compute(docs: DataFrame): DataFrame = {
    // Tokenize ONCE into a projected column and reference it by attribute:
    // embedding split(text) inside the bigram lambda would re-tokenize the
    // document per bigram (Catalyst does not CSE through higher-order
    // functions — the documented Curation.chunk pitfall, O(tokens²) per
    // doc), and CollapseProject keeps the alias because it is referenced
    // more than once by non-cheap consumers.
    val base = docs.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("toks"))
    val l = col("toks")
    val n = size(l)
    // bigram i pairs slice-element i (= l[i+1], 1-based) with l[i+2]
    val bigrams = transform(
      slice(l, lit(1), n - 1), (t, i) => concat(t, lit(" "), element_at(l, i + lit(2))))
    val narrow = base.select(
      col("doc_id"),
      n.cast("long").as("n_words"),
      Quantize.r(length(translate(col("text"), " ", "")).cast("double") /
        n.cast("double"), 6).as("mean_word_len"),
      Quantize.r(TextStats.stopwordRatio(l), 6).as("stopword_ratio"),
      Quantize.r(
        when(n > 1,
          lit(1.0) - size(array_distinct(bigrams)).cast("double") /
            (n - 1).cast("double"))
          .otherwise(lit(0.0)), 6).as("dup_bigram_fraction"))
    val top = base
      .select(col("doc_id"), explode(l).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("topc"))
    narrow.join(top, Seq("doc_id"))
      .withColumn("top_word_fraction",
        Quantize.r(col("topc").cast("double") / col("n_words").cast("double"), 6))
      .drop("topc")
      .withColumn("passes",
        col("n_words") >= MinWords &&
          col("mean_word_len").between(MeanWordLenLo, MeanWordLenHi) &&
          col("stopword_ratio") >= MinStopwordRatio &&
          col("dup_bigram_fraction") <= MaxDupBigramFrac &&
          col("top_word_fraction") <= MaxTopWordFrac)
  }
}
