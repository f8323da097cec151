package graft.ext

import graft.functions.Quantize
import graft.plans.TextHashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column => C}
import org.apache.spark.sql.functions._

/** Deduplication operators over a document corpus: exact (hash/key),
  * MinHash+LSH near-dup, SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is a keyed `dropDuplicates`/`DISTINCT` — one hash shuffle
  *    on the key, map-side combined; never a global sort.
  *  - MinHash near-dup NEVER does all-pairs O(n²): signatures band into
  *    bucket keys, candidate pairs come from an equi-join on (band, key) —
  *    only documents sharing a band collide, and the pair count is bounded
  *    by bucket sizes (cap + log oversized buckets instead of exploding).
  *  - the exact-Jaccard verify joins candidate pairs back to token sets by
  *    doc_id (two broadcast-or-shuffle equi-joins), so verification cost is
  *    proportional to candidates, not corpus².
  *
  * Per-row compute (shingling, hashing, folds) goes through the native
  * Catalyst expressions in [[graft.plans.TextHashing]] — the interpreted
  * higher-order-function forms (kept under [[Dedup.Hof]], equivalence-tested
  * in ExtSpec) allocate arrays per lambda step and measured 30-50× slower on
  * the MinHash path at sf0.1.
  */
object Dedup {

  /** Exact dedup on a natural key (reference backstop key:
    * (time, symbol, trade_id), `sql/timescaledb_schema.sql:24`).
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Exact-content dup groups via md5 fingerprint. */
  def exactTextDups(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"),
        max(col("doc_id")).as("dup_doc_id"))
      .filter(col("n_docs") > 1)

  /** Word shingles (n-grams joined with spaces); n=1 gives plain tokens. */
  def shingles(text: C, n: Int): C = TextHashing.shingles(text, n)

  /** MinHash signature column: for each of `numHashes` seeded hash functions,
    * the min of xxhash64(shingle, seed_i) over the document's shingle set.
    * Deterministic (seeded); native single-pass loop.
    */
  def minhashSignature(sh: C, numHashes: Int): C =
    TextHashing.minhashSignature(sh, numHashes)

  /** LSH candidate pairs: band the signature, group on (band, key), expand
    * pairs inside each bucket. A single aggregation of the banded rows — the
    * signature pipeline runs ONCE ([[TextHashing.MinHashBands]] fuses
    * signature+banding into one expression, so `CollapseProject` cannot
    * duplicate the signature subtree into each band), and pair count is
    * bounded by bucket sizes, never |corpus|².
    *
    * `maxBucketSize` drops adversarial mega-buckets (an exact-dup cluster of
    * k docs contributes k²/2 pairs from every band); run [[exactTextDups]]
    * first to collapse those, and treat dropped buckets as an explicit
    * coverage decision, not a silent cap — they are observable as buckets
    * with `size > maxBucketSize` in [[minhashBuckets]].
    */
  def minhashBuckets(
      documents: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    // Shingle-less docs (< n tokens) would share the identity signature and
    // collide into one giant bucket — drop them before banding.
    documents
      .select(col("doc_id"), shingles(col("text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        posexplode(TextHashing.minhashBands(col("sh"), numHashes, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
      .groupBy("band", "key")
      .agg(collect_list(col("doc_id")).as("ids"))
  }

  def minhashCandidates(
      documents: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucketSize: Int = 1000): DataFrame =
    minhashBuckets(documents, shingleN, numHashes, bands)
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("a"), explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("b"))
      .select(least(col("a"), col("b")).as("doc_a"), greatest(col("a"), col("b")).as("doc_b"))
      .distinct()

  /** Exact n-gram Jaccard between two shingle-set columns (native). */
  def jaccard(a: C, b: C): C = TextHashing.jaccard(a, b)

  /** Full near-dup pipeline: LSH candidates → exact-Jaccard verify ≥ threshold.
    *
    * The verify joins are pruned to candidate doc_ids first, so shingle sets
    * shuffle only for documents that actually collided (candidates ≪ corpus
    * at scale), never for the whole corpus.
    */
  def nearDups(documents: DataFrame, threshold: Double = 0.7, shingleN: Int = 3): DataFrame = {
    // staged once: the candidate pairs feed the id semi-join AND the join
    // spine — unstaged, the whole LSH banding pipeline re-plans per
    // consumer (three corpus-wide minhash passes instead of one)
    val cands = minhashCandidates(documents, shingleN).transform(graft.core.Staging.stage)
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .unionAll(cands.select(col("doc_b").as("doc_id"))).distinct()
    val sets = documents.select(col("doc_id"), shingles(col("text"), shingleN).as("sh"))
      .join(candIds, "doc_id", "left_semi")
    cands
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Quantize.r(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes (native single pass).
    */
  def simhash(text: C): C = TextHashing.simhash(text)

  /** SimHash-exact dup groups (identical token multisets collide). */
  def simhashDups(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), simhash(col("text")).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      .filter(col("n_docs") > 1)

  /** SimHash dup groups over the 60-bit PORTABLE hash
    * ([[TextHashing.SimHashPoly]] with two affine families): discrimination
    * comparable to the 64-bit xxhash form ([[simhashDups]], spec-tested),
    * with every bit replayable in DuckDB — so the flagship registry query
    * carries a full cross-engine value oracle instead of a rows-only gate.
    */
  def simhashDups60(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), TextHashing.simhashPoly(col("text"), 60).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      .filter(col("n_docs") > 1)

  /** LSH candidate pairs over the PORTABLE polynomial hash, with the number
    * of shared bands per pair — the oracle-checkable twin of
    * [[minhashCandidates]] (see [[TextHashing.MinHashBandsPoly]]: same
    * banding topology, but every hash is a char-code fold DuckDB replays
    * bit-for-bit). Same scale discipline: bucketed, capped, never all-pairs.
    */
  def portableMinhashPairs(
      documents: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucketSize: Int = 1000): DataFrame =
    documents
      .select(col("doc_id"), shingles(col("text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        posexplode(TextHashing.minhashBandsPoly(col("sh"), numHashes, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
      .groupBy("band", "key")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("a"), explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("b"))
      .select(least(col("a"), col("b")).as("doc_a"), greatest(col("a"), col("b")).as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared_bands"))

  /** Near-dup pipeline over the PORTABLE polynomial LSH family: the
    * [[portableMinhashPairs]] candidates fed through the same exact-Jaccard
    * verify as [[nearDups]]. Spark and the DuckDB oracle replay the SAME
    * hash family end-to-end, so the gated compare is immune to the
    * per-family recall gap in the fragile mid-Jaccard band (with 8 bands x 4
    * rows, per-family recall at J=0.5 is only ~40% — two independent
    * families need not catch the same mid-band pair). The xxhash64 family
    * ([[nearDups]]) stays spec-tested on planted duplicates (ExtSpec).
    */
  def nearDupsPortable(documents: DataFrame, threshold: Double = 0.7,
      shingleN: Int = 3): DataFrame = {
    // staged once — same reasoning as [[nearDups]]'s candidate staging
    val cands = portableMinhashPairs(documents, shingleN)
      .select(col("doc_a"), col("doc_b")).transform(graft.core.Staging.stage)
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .unionAll(cands.select(col("doc_b").as("doc_id"))).distinct()
    val sets = documents.select(col("doc_id"), shingles(col("text"), shingleN).as("sh"))
      .join(candIds, "doc_id", "left_semi")
    cands
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Quantize.r(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash dup groups over the portable 30-bit hash — oracle-checkable
    * twin of [[simhashDups]]; doc_ids surface as a sorted CSV string so the
    * cross-engine compare is a plain string equality.
    */
  def portableSimhashDups(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), TextHashing.simhashPoly(col("text")).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))), _.cast("string")),
          ",").as("doc_ids"))
      .filter(col("n_docs") > 1)

  /** Exact repeated-substring spans across documents — the substring-level
    * exact-dedup shape (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): find every maximal run of >= `minLen` tokens
    * shared verbatim between two documents, with its position in both. The
    * reference's content-hash dedup (`sql/timescaledb_schema.sql:24` natural
    * key; doc fingerprints) only catches whole-record dups; this catches the
    * quoted-passage / template-prefix overlap that whole-doc hashing misses.
    *
    * Spark-first plan, suffix-array semantics without the suffix array:
    *  1. one narrow projection explodes each doc into positional k-gram
    *     md5 fingerprints (the slice is bounded by k — no per-doc arrays
    *     beyond the tokenizer's);
    *  2. ONE aggregation by gram collects hit lists, gated to grams seen in
    *     >= 2 distinct docs and <= `maxHits` total occurrences (the explicit
    *     budget that keeps boilerplate grams from exploding the pair join —
    *     corpus-frequent grams are [[graft.ext.Scrub.boilerplate]]'s job);
    *  3. in-bucket pair expansion (posexplode + slice, as
    *     [[portableMinhashPairs]]) — never an all-pairs corpus join;
    *  4. matches at the same diagonal (pos_a - pos_b) merge into maximal
    *     spans with the classic gaps-and-islands fold: run_id =
    *     pos_a - row_number() per (pair, diagonal) — one window, no arrays.
    *
    * Widest exchange carries (gram-hash, bounded hit list) rows; every
    * later stage is proportional to true cross-doc overlap, not corpus².
    */
  def repeatedSpans(
      documents: DataFrame,
      k: Int = 5,
      maxHits: Int = 64,
      minLen: Int = 10): DataFrame = {
    val toks = documents
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= k)
    val grams = toks.select(col("doc_id"),
      explode(transform(
        sequence(lit(0), size(col("tok")) - k),
        i => struct(i.cast("long").as("pos"),
          md5(concat_ws(" ", slice(col("tok"), i + 1, lit(k)))).as("g")))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
    val buckets = grams
      .groupBy("g")
      .agg(collect_list(struct(col("doc_id"), col("pos"))).as("hits"))
      .filter(size(col("hits")) <= maxHits &&
        size(array_distinct(col("hits.doc_id"))) >= 2)
    val swap = col("x.doc_id") > col("y.doc_id")
    val pairs = buckets
      .select(posexplode(col("hits")).as(Seq("i", "x")), col("hits"))
      .select(col("x"),
        explode(slice(col("hits"), col("i") + 2, size(col("hits")))).as("y"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(
        when(swap, col("y.doc_id")).otherwise(col("x.doc_id")).as("doc_a"),
        when(swap, col("x.doc_id")).otherwise(col("y.doc_id")).as("doc_b"),
        when(swap, col("y.pos")).otherwise(col("x.pos")).as("pos_a"),
        when(swap, col("x.pos")).otherwise(col("y.pos")).as("pos_b"))
    val diag = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b", "delta").orderBy("pos_a")
    pairs
      .withColumn("delta", col("pos_a") - col("pos_b"))
      .withColumn("run_id", col("pos_a") - row_number().over(diag))
      .groupBy("doc_a", "doc_b", "delta", "run_id")
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (max(col("pos_a")) - min(col("pos_a")) + k).as("span_tokens"))
      .filter(col("span_tokens") >= minLen)
      .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
  }

  /** The original higher-order-function forms. Value-identical to the native
    * expressions (ExtSpec asserts it); kept as the executable spec and
    * cross-check, NOT used on hot paths.
    */
  object Hof {

    def shingles(text: C, n: Int): C = {
      val toks = split(text, " ")
      if (n == 1) array_distinct(toks)
      else array_distinct(
        when(size(toks) < n, array()).otherwise(
          transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))
    }

    /** One aggregate pass (running element-wise min of the per-shingle hash
      * vector): the naive transform-per-seed form embeds the shingle
      * subtree into every seed's lambda (Catalyst does not CSE through
      * higher-order functions) — measured 30× slower at sf0.1.
      */
    def minhashSignature(sh: C, numHashes: Int): C =
      aggregate(
        sh,
        array_repeat(lit(Long.MaxValue), numHashes),
        (acc, s) => zip_with(
          acc,
          transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(s, i)),
          (a, b) => least(a, b)))

    def bands(sig: C, numHashes: Int, nBands: Int): C = {
      val rows = numHashes / nBands
      transform(sequence(lit(0), lit(nBands - 1)),
        b => concat_ws(",", slice(sig, b * rows + 1, lit(rows))))
    }

    def jaccard(a: C, b: C): C = {
      val inter = size(array_intersect(a, b)).cast("double")
      inter / nullif((size(a) + size(b) - size(array_intersect(a, b))).cast("double"), lit(0.0))
    }

    def simhash(text: C): C = {
      val hashes = transform(split(text, " "), t => xxhash64(t))
      val bitCounts = aggregate(
        hashes,
        array_repeat(lit(0L), 64),
        (acc, h) => zip_with(
          acc,
          transform(sequence(lit(0), lit(63)),
            j => call_function("shiftright", h, j.cast("int")).bitwiseAND(1L)),
          (a, b) => a + b))
      val nTokens = size(split(text, " "))
      aggregate(
        zip_with(bitCounts, sequence(lit(0), lit(63)),
          (c, j) => when(c * 2 >= nTokens,
            call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)),
        lit(0L), (acc, x) => acc + x)
    }
  }
}
