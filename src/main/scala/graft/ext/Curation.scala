package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column => C}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic hash-based dataset
  * splitting, class-balanced sampling, and context-window document chunking
  * — the set a large-scale training-data pipeline runs after dedup/quality
  * filtering (SURVEY §7.5 companion surface).
  *
  * Every operator is a pure column computation on md5 (shared bit-for-bit by
  * every engine), so assignments are reproducible across runs, engines, and
  * cluster sizes — no RNG state, no `rand()` (whose sequence is
  * partitioning-dependent and engine-specific). All three are
  * DuckDB-oracle-checked end to end.
  *
  * Scale shapes: split + chunk are NARROW per-row maps (no shuffle at all);
  * balanced sampling is one hash shuffle on the class key + a bounded
  * row_number window — state per class is O(1), output O(classes × n).
  */
object Curation {

  /** Deterministic uniform [0,1) from the md5 of a key: the first 8 hex
    * digits as an integer, divided by 2³². Exact double arithmetic — every
    * engine computing the same key produces the same u.
    */
  def hashUniform(key: C): C =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint") /
      lit(4294967296.0)

  /** Train/valid/test tag with the given cumulative fractions. */
  def splitTag(key: C, trainFrac: Double = 0.8, validFrac: Double = 0.1): C = {
    val u = hashUniform(key)
    when(u < trainFrac, "train")
      .when(u < trainFrac + validFrac, "valid")
      .otherwise("test")
  }

  /** Deterministic split assignment on a key column. */
  def hashSplit(df: DataFrame, keyCol: String,
      trainFrac: Double = 0.8, validFrac: Double = 0.1): DataFrame =
    df.withColumn("split", splitTag(col(keyCol), trainFrac, validFrac))

  /** Class-balanced downsample: at most `perClass` rows per value of
    * `classCol`, chosen by md5 order (deterministic, uniform within class —
    * the "take a fixed random-but-reproducible sample of every language/
    * source" curation step). One shuffle on the class key.
    */
  def balancedSample(df: DataFrame, classCol: String, keyCol: String,
      perClass: Int): DataFrame = {
    val w = Window.partitionBy(col(classCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perClass)
      .drop("rn")
  }

  /** End-to-end curation funnel — the composed shape a training-data prep
    * job runs per corpus drop: language gate ([[TextStats.langId]] == "en"),
    * rule-based quality pass ([[QualityRules]]), exact-dedup canonical
    * (min doc_id per content hash), then the deterministic hash split.
    * Stage order puts the narrow filters before the shuffling stages so the
    * dedup/quality aggregations see only surviving rows. The doc_id
    * equi-joins are unhinted — the filtered sides are unbounded at corpus
    * scale, so AQE picks the strategy (broadcast only when a side is
    * actually small at runtime).
    */
  /** The funnel's shared stage builders — used by [[curate]] and by the
    * composed pre-training pipeline (which inserts redaction between the
    * gate and the canonical), so the two funnels cannot silently diverge.
    */
  def langGate(documents: DataFrame, lang: String = "en"): DataFrame =
    documents.filter(TextStats.langId(col("text")) === lang)

  def qualityPass(docs: DataFrame): DataFrame =
    QualityRules.compute(docs).filter(col("passes")).select("doc_id")

  /** Exact-dedup canonical: min doc_id per content hash of `textCol`. */
  def dedupCanonical(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

  def curate(documents: DataFrame): DataFrame = {
    // the narrow language gate runs FIRST so the quality and dedup
    // aggregations shuffle only surviving rows; restricting dedup to the
    // en slice is semantics-preserving (exact dups share text, hence
    // language), so canonicals are identical to a full-corpus dedup.
    // The gated slice feeds THREE consumers (join spine, quality pass,
    // dedup canonical) — materialize it once (lazy localCheckpoint, the
    // staging-table idiom) so the n-gram language ID runs ONE corpus scan
    // instead of three, and AQE sees exact sizes for the funnel joins.
    val en = langGate(documents).select("doc_id", "text")
      .transform(graft.core.Staging.stage)
    val pass = qualityPass(en)
    val canon = dedupCanonical(en)
    hashSplit(en.select("doc_id").join(pass, Seq("doc_id")).join(canon, Seq("doc_id")),
      "doc_id")
      .select("doc_id", "split")
  }

  /** Domain-mixture sampling: keep each row with a per-source probability
    * (the "sample web at 10%, books at 80%" training-mix step), decided by
    * the deterministic md5 uniform of (source, key) — reproducible across
    * runs, engines, and cluster sizes, and re-runnable per-partition with
    * no RNG state. `rates` rows are (source, rate); unknown sources fall
    * back to `defaultRate`. Narrow map + a BROADCAST join against the rate
    * table (a mixture config is bounded by the number of domains).
    */
  def mixtureSample(df: DataFrame, rates: DataFrame, keyCol: String,
      sourceCol: String = "source", defaultRate: Double = 1.0): DataFrame = {
    val u = hashUniform(concat_ws(":", col(sourceCol), col(keyCol).cast("string")))
    df.join(broadcast(rates), Seq(sourceCol), "left")
      .filter(u < coalesce(col("rate"), lit(defaultRate)))
      .drop("rate")
  }

  /** Context-window chunking: split each document's whitespace tokens into
    * consecutive windows of `chunkTokens`, one output row per chunk. A
    * narrow map + explode — no shuffle; chunk count per doc is
    * ceil(tokens / chunkTokens).
    */
  def chunk(documents: DataFrame, chunkTokens: Int): DataFrame = {
    val k = chunkTokens
    // Tokenize ONCE into a projected column and reference it by attribute:
    // embedding `split(text)` inside the transform lambda would re-tokenize
    // the document per chunk per slice (Catalyst does not CSE through
    // higher-order functions — the documented TextHashing pitfall). A
    // Project under Generate is not collapsed into the generator, so `toks`
    // stays a single evaluation per row.
    val toks = col("toks")
    val nChunks = ceil(size(toks).cast("double") / k).cast("int")
    documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), nChunks - 1), i =>
          struct(
            i.as("chunk_idx"),
            concat_ws(" ", slice(toks, i * k + 1, lit(k))).as("chunk_text"),
            size(slice(toks, i * k + 1, lit(k))).as("chunk_tokens")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"),
        col("c.chunk_tokens"))
  }

  /** Corpus-level sequence packing (concat-and-chunk): documents concatenate
    * in a deterministic md5 order WITHIN each source and split into fixed
    * `capacityTokens` training windows — the pretraining batch-packing step
    * (concatenate-then-chunk, which [[chunk]]'s per-document windows
    * deliberately are not). Emits each document's span in the packed token
    * stream: its start offset, first/last window, and how many windows it
    * crosses (the packing-efficiency / boundary-split accounting a data
    * loader needs).
    *
    * Scale shape: ONE running sum per source partition (window cumsum over
    * the hash order) — per-source streams pack independently and in
    * parallel, never a global single-partition sort. Deterministic: the md5
    * order is engine- and cluster-size-independent, so the packing layout
    * reproduces anywhere.
    */
  def packSequences(documents: DataFrame, capacityTokens: Int): DataFrame = {
    val c = capacityTokens.toLong
    val ord = Window.partitionBy("source")
      .orderBy(md5(concat(lit("pack:"), col("doc_id").cast("string"))), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("end_tok", sum(col("n_tokens")).over(ord))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("end_tok") - col("n_tokens")).as("start_tok"),
        expr(s"CAST((end_tok - n_tokens) DIV $c AS BIGINT)").as("start_window"),
        expr(s"CAST((end_tok - 1) DIV $c AS BIGINT)").as("end_window"))
      .withColumn("n_windows_spanned",
        col("end_window") - col("start_window") + lit(1L))
  }
}
