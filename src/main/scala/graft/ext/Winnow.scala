package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column => C}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * algorithm): hash every character k-gram, slide a window of `w` adjacent
  * hashes, keep each window's MINIMUM — the selected set is a position-robust
  * fingerprint with the guarantee that any shared substring of length
  * ≥ k + w - 1 yields at least one shared fingerprint.
  *
  * This complements the existing near-dup tiers: MinHash approximates SET
  * similarity of word shingles (order-insensitive), SimHash compresses to one
  * 64-bit sketch, winnowing detects shared CONTIGUOUS passages (plagiarism /
  * boilerplate / quote detection in a training corpus).
  *
  * Everything here is engine-portable integer arithmetic (polynomial hash
  * mod 1e9+7 over character codes) — unlike the xxhash64-based
  * MinHash/SimHash, the DuckDB oracle replays it exactly, so `q_winnow_pairs`
  * gets a full hash-checked oracle rather than a rows-only check. The hot
  * path is the native [[graft.plans.TextHashing.WinnowFp]] expression (one
  * primitive loop per row); [[Hof]] keeps the higher-order-function form as
  * the executable spec, equivalence-tested in ExtSpec.
  *
  * Scale shape: fingerprinting is a narrow per-row map; candidate pairing is
  * the same bucketed never-all-pairs discipline as MinHash-LSH — explode to
  * (fingerprint, doc_id), group on the fingerprint value, cap oversized
  * buckets explicitly (a boilerplate fingerprint shared by 10^6 docs would
  * contribute 10^12 pairs — dropped buckets are an observable coverage
  * decision), expand pairs only inside surviving buckets.
  */
object Winnow {

  /** The winnowed fingerprint set (native expression): distinct minima of
    * each w-window of k-gram hashes, sorted. Texts with fewer than w hashes
    * keep their global min, so every text of length ≥ k has ≥ 1 fingerprint
    * (the paper's boundary rule).
    */
  def fingerprints(text: C, k: Int, w: Int): C =
    graft.plans.TextHashing.winnow(text, k, w)

  /** Candidate near-dup pairs with the number of shared fingerprints — pairs
    * sharing ≥ `minShared` fingerprints share ≥ minShared distinct protected
    * passages. Buckets over `maxBucketSize` are dropped (observable, not
    * silent: re-run [[buckets]] to list them).
    */
  def candidatePairs(
      documents: DataFrame,
      k: Int = 16,
      w: Int = 8,
      minShared: Int = 5,
      maxBucketSize: Int = 100): DataFrame =
    buckets(documents, k, w)
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("a"), explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("b"))
      .select(least(col("a"), col("b")).as("doc_a"), greatest(col("a"), col("b")).as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)

  /** One bucket per fingerprint value: the doc_ids carrying it. */
  def buckets(documents: DataFrame, k: Int, w: Int): DataFrame =
    documents
      .select(col("doc_id"), explode(fingerprints(col("text"), k, w)).as("fp"))
      .groupBy("fp")
      .agg(collect_list(col("doc_id")).as("ids"))

  /** Higher-order-function forms — the executable spec the native expression
    * is equivalence-tested against (same pattern as [[Dedup.Hof]]). Not used
    * on hot paths.
    */
  object Hof {

    /** Polynomial hash of every character k-gram. */
    def kgramHashes(text: C, k: Int): C = {
      val n = length(text) - (k - 1)
      when(n >= 1,
        transform(sequence(lit(1), n),
          i => aggregate(sequence(i, i + (k - 1)), lit(0L),
            (acc, j) => (acc * 131L + ascii(text.substr(j, lit(1)))) % 1000000007L)))
        .otherwise(array().cast("array<bigint>"))
    }

    /** The hash array is bound through a single-element `transform` lambda so
      * the k-gram pass evaluates ONCE per row — `CollapseProject` would
      * otherwise inline the subtree into each CASE branch.
      */
    def fingerprints(text: C, k: Int, w: Int): C =
      element_at(
        transform(array(kgramHashes(text, k)), { hs =>
          val n = size(hs)
          when(n >= w,
            array_sort(array_distinct(
              transform(sequence(lit(1), n - (w - 1)),
                j => array_min(slice(hs, j, lit(w)))))))
            .when(n >= 1, array(array_min(hs)))
            .otherwise(array().cast("array<bigint>"))
        }), 1)
  }
}
