package graft.registry

import graft.core.Tables
import graft.ext.{Dedup, Multimodal, QualityRules, Similarity, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline queries: dedup, similarity search, text
  * analysis, multimodal plumbing (SURVEY §7.5; graded as first-class).
  * Hash-based ops (MinHash/SimHash/LSH) have no DuckDB-expressible oracle
  * (different hash primitives) and get deterministic rows/schema checks.
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  /** CPU-heavy per-row stages (shingling, hashing, folds) need real
    * parallelism; the local corpus is one parquet split, so fan it out to the
    * cores first. On a production cluster the input arrives pre-split, but an
    * explicit repartition before a CPU-bound stage is the correct shape
    * either way (cost: one shuffle of the raw rows).
    */
  private def docsPar(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).repartition(s.sparkContext.defaultParallelism)

  private def embPar(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).repartition(s.sparkContext.defaultParallelism)

  val queries: Map[String, Q] = Map(
    "q_text_stats" -> ((s, d) => TextStats.corpusStats(Tables.documents(s, d))),

    "q_text_quality" -> ((s, d) => TextStats.docQuality(docsPar(s, d))),

    "q_quality_rules" -> ((s, d) => QualityRules.compute(docsPar(s, d))),

    "q_curation_pipeline" -> ((s, d) =>
      graft.ext.Curation.curate(docsPar(s, d))),

    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), TextStats.langId(col("text")).as("predicted"))
        .agg(count(lit(1)).as("n"))),

    "q_text_dup_exact" -> ((s, d) => Dedup.exactTextDups(Tables.documents(s, d))),

    // Canonical normalization + how many distinct docs it collapses.
    "q_text_normalize" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextStats.normalize(col("text")).as("norm_text"))
        .groupBy("norm_text")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))),

    "q_ngram_jaccard" -> ((s, d) => {
      val docs = docsPar(s, d)
      val sets = docs.select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      val q = sets.filter(col("doc_id") === 0).select(col("sh").as("qsh"))
      sets.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("doc_id"),
          graft.functions.Quantize.r(Dedup.jaccard(col("sh"), col("qsh")), 6).as("jaccard"))
    }),

    // SAME-FAMILY oracle: both Spark and DuckDB run the portable polynomial
    // LSH (candidates) + exact-Jaccard verify at 0.5, so the gate is exact
    // by construction — not reliant on two independent hash families
    // coincidentally agreeing (with 8 bands x 4 rows, per-family recall at
    // J=0.5 is ~40%, so a mid-band pair caught by one family would
    // spuriously fail a cross-family compare). The xxhash64 family
    // (Dedup.nearDups) stays spec-tested on planted duplicates (ExtSpec).
    "q_minhash_pairs" -> ((s, d) =>
      Dedup.nearDupsPortable(docsPar(s, d), threshold = 0.5)
        .orderBy("doc_a", "doc_b")),

    // Flagship SimHash dup groups over the 60-bit portable hash (two affine
    // polynomial families) — 64-bit-class discrimination with a full DuckDB
    // value oracle; the xxhash64 form stays spec-tested (ExtSpec).
    "q_simhash_dups" -> ((s, d) =>
      Dedup.simhashDups60(docsPar(s, d))
        .select(col("simhash"), col("n_docs"),
          to_json(col("doc_ids")).as("doc_ids"))),

    // Portable-polynomial-hash twins of the two rows-only queries above:
    // identical LSH/vote topology, every hash replayable in DuckDB — the
    // near-dup tier's full cross-engine oracle.
    "q_minhash_portable" -> ((s, d) =>
      Dedup.portableMinhashPairs(docsPar(s, d))),

    "q_simhash_portable" -> ((s, d) =>
      Dedup.portableSimhashDups(docsPar(s, d))),

    "q_cosine_topk" -> ((s, d) => Similarity.topK(embPar(s, d), 0L, 20)),

    // Same top-k through the native codegen'd Catalyst expression — must be
    // bit-identical to the HOF form (shared oracle proves it).
    "q_cosine_topk_native" -> ((s, d) => {
      graft.plans.CosineSimilarity.register(s)
      val emb = embPar(s, d)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("q_embedding"))
      emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.functions.Quantize.r(expr("cosine_sim(CAST(embedding AS ARRAY<DOUBLE>), CAST(q_embedding AS ARRAY<DOUBLE>))"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(20)
    }),

    // LSH-bucketed near-dup pairs over the portable md5-parity hyperplanes
    // at a HIGHER-recall operating point than the twin below (6 planes →
    // coarser buckets → more candidates; threshold 0.25) — fully
    // value-oracled. The xxhash-seeded plane family (Similarity.nearDupPairs
    // default) stays spec-tested in ExtSpec.
    "q_embed_neardup" -> ((s, d) =>
      Similarity.portableNearDupPairs(embPar(s, d), planes = 6, threshold = 0.25)
        .orderBy("vec_a", "vec_b")),

    // Portable md5-parity hyperplanes: the embedding near-dup tier's
    // oracle-checked twin (same topology as q_embed_neardup).
    "q_embed_portable" -> ((s, d) =>
      Similarity.portableNearDupPairs(embPar(s, d), planes = 8, threshold = 0.3)),

    // Int8 embedding quantization audit — the ANN storage-compression step
    // (4x memory/scan reduction for IVF posting lists): symmetric per-vector
    // max-abs scaling to [-127, 127], then the reconstruction-error report
    // that decides whether quantized recall is acceptable. Narrow map, no
    // shuffle; per-row arrays bounded by the embedding dim. Both the
    // round-trip and the error folds are plain IEEE double ops mirrored in
    // the oracle.
    "q_embed_quant" -> ((s, d) => {
      import org.apache.spark.sql.Column
      val v = col("embedding").cast("array<double>")
      val err = (x: Column) => abs(x -
        floor(x * lit(127.0) / nullif(col("scale"), lit(0.0)) + lit(0.5)) *
          col("scale") / lit(127.0))
      Tables.embeddings(s, d)
        .select(col("vec_id"), v.as("v"),
          array_max(transform(v, x => abs(x))).as("scale"))
        .select(col("vec_id"),
          graft.functions.Quantize.r(col("scale"), 6).as("scale_q"),
          graft.functions.Quantize.r(
            array_max(transform(col("v"), err)), 6).as("max_abs_err"),
          graft.functions.Quantize.r(
            aggregate(col("v"), lit(0.0), (acc, x) => acc + err(x)) /
              size(col("v")).cast("double"), 6).as("mean_abs_err"))
    }),

    // Edit-distance near-dup verify over a deterministic candidate set
    // (adjacent doc_ids) — the fuzzy-match tier below n-gram Jaccard.
    // Levenshtein is O(len²) per pair: at scale it runs ONLY on LSH/exact
    // candidates (bounded), never all-pairs; same discipline as nearDups.
    "q_edit_distance" -> ((s, d) => {
      // O(len²) per pair is CPU-bound: fan the single parquet split out to
      // the cores before the join (same shape as docsPar)
      val docs = docsPar(s, d).select(col("doc_id"), col("text"))
      docs.as("a")
        .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.text"), col("b.text")).as("edit_dist"),
          graft.functions.Quantize.r(
            lit(1.0) - levenshtein(col("a.text"), col("b.text")).cast("double") /
              greatest(length(col("a.text")), length(col("b.text"))).cast("double"),
            6).as("similarity"))
    }),

    // IVF coarse-quantizer ANN (the pgvector-ivfflat analogue): deterministic
    // centroids -> broadcast assignment -> probe 2 of 16 buckets -> exact
    // cosine top-k within. Fully DuckDB-oracle-checked (assignment, probe
    // selection and scoring reproduce bit-identically).
    "q_ann_ivf" -> ((s, d) =>
      graft.ext.Ivf.topK(embPar(s, d), queryVecId = 0L, k = 20,
        nCentroids = 16, nProbe = 2)),

    // The trained-quantizer variant: deterministic Lloyd k-means (fixed
    // seeds, 3 iterations, no RNG) refines the coarse centroids before the
    // same assign/probe/score pipeline — pgvector ivfflat's training step.
    // quantize=true rounds each centroid mean to 1e-6 per iteration, which
    // absorbs summation-order drift and makes the whole train→assign→probe→
    // score pipeline bit-replayable in DuckDB: the oracle unrolls the same
    // 3 Lloyd iterations in SQL and must reproduce the exact top-k.
    "q_ann_ivf_kmeans" -> ((s, d) => {
      val emb = embPar(s, d)
      val cents = graft.ext.Ivf.kmeansCentroids(
        emb, nCentroids = 16, iters = 3, quantize = true)
      graft.ext.Ivf.topKWith(emb, cents, queryVecId = 0L, k = 20, nProbe = 4)
    }),

    // Deterministic (md5-keyed) train/valid/test split — per-split × lang
    // counts. No RNG: reproducible across engines/cluster sizes.
    "q_train_split" -> ((s, d) =>
      graft.ext.Curation.hashSplit(Tables.documents(s, d), "doc_id")
        .groupBy("split", "lang").agg(count(lit(1)).as("n"))),

    // Class-balanced downsample: 20 docs per language, md5-ordered.
    "q_balanced_sample" -> ((s, d) =>
      graft.ext.Curation.balancedSample(
        Tables.documents(s, d), "lang", "doc_id", perClass = 20)
        .select("doc_id", "lang", "source", "n_chars")),

    // Context-window chunking: 50-token windows, one row per chunk.
    "q_doc_chunks" -> ((s, d) =>
      graft.ext.Curation.chunk(docsPar(s, d), chunkTokens = 50)),

    // Corpus-level sequence packing (concat-and-chunk, per-source md5
    // order): each document's span in the packed 512-token training
    // windows — the pretraining batch-packing accounting.
    "q_pack_sequences" -> ((s, d) =>
      graft.ext.Curation.packSequences(Tables.documents(s, d), capacityTokens = 512)),

    // PII audit + redaction. The synthetic corpus contains no PII, so the
    // query injects a deterministic email/IP/card per document first
    // (keeps the check non-vacuous); the audit itself is corpus-agnostic.
    "q_pii_redact" -> ((s, d) =>
      graft.ext.Scrub.piiAudit(
        Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com from 10.0."),
            (col("doc_id") % 256).cast("string"),
            lit(".7 card 4111111111111111")).as("text")))),

    // Eval-set decontamination: every 50th doc plays the benchmark suite;
    // train docs sharing any 8-token gram with it are flagged.
    "q_decontaminate" -> ((s, d) => {
      val docs = docsPar(s, d)
      graft.ext.Scrub.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), k = 8)
    }),

    // Cross-document boilerplate: 5-grams shared by >= 3 distinct docs,
    // per-doc boilerplate fraction (passage-level line-dedup analogue).
    "q_boilerplate" -> ((s, d) =>
      graft.ext.Scrub.boilerplate(docsPar(s, d), k = 5, minDocs = 3)),

    // The COMPOSED pre-training funnel — every curation-tier operator
    // chained the way a corpus drop actually flows: language gate →
    // quality rules → PII redaction → exact-dedup canonical (on the
    // REDACTED text — scrub before hashing) → eval-set decontamination →
    // deterministic split. Output is the funnel report: survivors per
    // stage plus final split sizes. Narrow stages run first so every
    // shuffle sees only survivors.
    "q_pretrain_pipeline" -> ((s, d) => {
      val docs = docsPar(s, d)
      // the gated slice feeds the quality pass, the redaction branch, the
      // join spine AND a stage count; the redacted slice feeds dedup and
      // both decontamination sides — stage each once (lazy localCheckpoint,
      // the staging-table idiom) so language ID and redaction regexes run
      // one corpus scan apiece instead of re-evaluating per consumer
      val en = graft.ext.Curation.langGate(docs)
        .select("doc_id", "text").transform(graft.core.Staging.stage)
      val pass = graft.ext.Curation.qualityPass(en)
      val redacted = en.select(col("doc_id"),
        graft.ext.Scrub.redact(col("text")).as("text"))
        .transform(graft.core.Staging.stage)
      val canon = graft.ext.Curation.dedupCanonical(redacted)
      val clean = graft.ext.Scrub.decontaminate(
        redacted.filter(col("doc_id") % 50 =!= 0),
        redacted.filter(col("doc_id") % 50 === 0), k = 8)
        .filter(!col("contaminated")).select("doc_id")
      val surv = en.select("doc_id")
        .join(pass, Seq("doc_id")).join(canon, Seq("doc_id"))
        .join(clean, Seq("doc_id"))
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
      stage("input", docs)
        .unionByName(stage("lang_en", en))
        .unionByName(stage("quality_pass", pass))
        .unionByName(stage("canonical", canon))
        .unionByName(stage("decontaminated", clean))
        .unionByName(graft.ext.Curation.hashSplit(surv, "doc_id")
          .groupBy(col("split").as("stage")).agg(count(lit(1)).as("n")))
    }),

    // Domain-mixture sampling: per-source keep rates (0.2/0.4/0.6/0.8 by
    // source index), decided by the deterministic md5 uniform — the
    // "sample web at 10%, books at 80%" training-mix step.
    "q_source_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rates = docs.select(col("source")).distinct()
        .select(col("source"),
          ((substring(col("source"), 4, 10).cast("int") % 4 + 1) * lit(0.2))
            .as("rate"))
      graft.ext.Curation.mixtureSample(docs, rates, "doc_id")
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
    }),

    // Winnowing (MOSS) passage fingerprints: candidate pairs sharing >= 5
    // selected k-gram minima. Engine-portable integer hashing, so unlike
    // MinHash/SimHash this near-dup tier is FULLY hash-checked in DuckDB.
    "q_winnow_pairs" -> ((s, d) =>
      graft.ext.Winnow.candidatePairs(docsPar(s, d),
        k = 16, w = 8, minShared = 5, maxBucketSize = 100)),

    // Top-5 TF-IDF terms per doc: keyword extraction / featurization.
    "q_tfidf_top" -> ((s, d) => TextStats.tfIdfTopK(docsPar(s, d), k = 5)),

    // Unigram cross-entropy vs the corpus model — the LM-perplexity
    // filtering proxy (ordered per-doc fold; quantized per-token nll).
    "q_unigram_ce" -> ((s, d) =>
      TextStats.unigramCrossEntropy(docsPar(s, d))),

    // Duplicate-cluster resolution over the winnow pair graph: connected
    // components collapse each duplicate family to its min-id canonical
    // doc. Full DuckDB oracle (recursive CTE over the identical pairs).
    "q_dup_clusters" -> ((s, d) =>
      graft.ext.DupClusters.connectedComponents(
        graft.ext.Winnow.candidatePairs(docsPar(s, d),
          k = 16, w = 8, minShared = 5, maxBucketSize = 100))),

    // The DISTRIBUTED min-label tier of the same operator, forced via
    // driverEdgeLimit = 0 (every graph takes the >limit path) — the tier a
    // 100 TB corpus would actually exercise, under the identical
    // recursive-CTE oracle as the driver-DSU tier above. The two tiers are
    // pinned equal in ExtSpec; this gates the distributed one cross-engine.
    "q_dup_clusters_dist" -> ((s, d) =>
      graft.ext.DupClusters.connectedComponents(
        graft.ext.Winnow.candidatePairs(docsPar(s, d),
          k = 16, w = 8, minShared = 5, maxBucketSize = 100),
        driverEdgeLimit = 0L)),

    // Exact repeated-substring spans (Lee et al. 2022 substring dedup):
    // maximal >= 10-token runs shared verbatim between two docs, located
    // in both. Positional 5-gram md5 inversion -> capped bucket pair
    // expansion -> gaps-and-islands diagonal merge; full DuckDB oracle.
    "q_repeated_spans" -> ((s, d) =>
      graft.ext.Dedup.repeatedSpans(docsPar(s, d), k = 5, maxHits = 64,
        minLen = 10)),

    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.fakeDecode(Multimodal.payloads(s, d))
        .select(col("media_id"), col("source"),
          col("n_bytes").cast("int").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"), col("meta.codec_tag").as("codec_tag"))),

    "q_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.fakeDecode(Multimodal.payloads(s, d)))))

  /** The q_winnow_pairs oracle, split so q_dup_clusters can build its
    * recursive component walk on the IDENTICAL pair set (shared constants,
    * not a copy — same discipline as the session-oracle twins).
    */
  private val winnowCtes =
    """h AS (
      |  SELECT doc_id, list_transform(range(1, length(text) - 16 + 2), i ->
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(i, i + 16), j -> unicode(substr(text, CAST(j AS INT), 1)))),
      |      (acc, c) -> (acc * 131 + c) % 1000000007)) AS hs
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, CASE
      |    WHEN len(hs) >= 8 THEN list_sort(list_distinct(list_transform(
      |      range(1, len(hs) - 8 + 2), j -> list_min(list_slice(hs, CAST(j AS INT), CAST(j + 7 AS INT))))))
      |    WHEN len(hs) >= 1 THEN [list_min(hs)]
      |    ELSE CAST([] AS BIGINT[]) END AS fps
      |  FROM h),
      |e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
      |keep AS (SELECT fp FROM e GROUP BY fp HAVING count(*) BETWEEN 2 AND 100)""".stripMargin

  private val winnowPairsSelect =
    """SELECT e1.doc_id AS doc_a, e2.doc_id AS doc_b, count(*) AS shared_fps
      |FROM e e1 JOIN keep k ON e1.fp = k.fp
      |JOIN e e2 ON e1.fp = e2.fp AND e1.doc_id < e2.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin

  /** Recursive-CTE connected components over the winnow pair graph — the
    * shared oracle of both DupClusters tiers.
    */
  private val dupClustersOracle =
    s"""WITH RECURSIVE $winnowCtes,
      |pairs AS ($winnowPairsSelect),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |walk(node, lbl) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node),
      |comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id
      |         FROM walk GROUP BY node)
      |SELECT doc_id, cluster_id,
      |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
      |       doc_id = cluster_id AS is_canonical
      |FROM comp""".stripMargin

  private val shinglesCte =
    """s AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
      |              ELSE list_distinct(list_transform(range(1, len(t)),
      |                     i -> t[i] || ' ' || t[i+1])) END AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))""".stripMargin

  /** Shared CTE block mirroring [[graft.ext.QualityRules.compute]] —
    * `rules(doc_id, n_words, mean_word_len, stopword_ratio,
    * dup_bigram_fraction, top_word_fraction, passes)`. Metrics quantized,
    * flags decided on the quantized values.
    */
  private val qualityRuleCtes =
    """base AS (
      |  SELECT doc_id, string_split(text, ' ') AS l, text FROM documents),
      |narrow AS (
      |  SELECT doc_id,
      |         CAST(len(l) AS BIGINT) AS n_words,
      |         floor((CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len(l) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mean_word_len,
      |         floor((CAST(len(list_filter(l, t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t))) AS DOUBLE) / CAST(len(l) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS stopword_ratio,
      |         floor((CASE WHEN len(l) > 1 THEN
      |             CAST(1 AS DOUBLE) - CAST(len(list_distinct(list_transform(
      |               list_zip(l[1:len(l)-1], l[2:len(l)]), p -> p[1] || ' ' || p[2]))) AS DOUBLE) /
      |               CAST(len(l) - 1 AS DOUBLE)
      |           ELSE CAST(0 AS DOUBLE) END) * 1e6 + 0.5) / 1e6 AS dup_bigram_fraction
      |  FROM base),
      |tw AS (
      |  SELECT doc_id, max(c) AS topc FROM (
      |    SELECT doc_id, tok, count(*) AS c
      |    FROM (SELECT doc_id, unnest(l) AS tok FROM base) GROUP BY 1, 2)
      |  GROUP BY 1),
      |rules AS (
      |  SELECT n.doc_id, n.n_words, n.mean_word_len, n.stopword_ratio,
      |         n.dup_bigram_fraction,
      |         floor((CAST(tw.topc AS DOUBLE) / CAST(n.n_words AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS top_word_fraction,
      |         (n.n_words >= 30 AND
      |          n.mean_word_len BETWEEN CAST(3 AS DOUBLE) AND CAST(10 AS DOUBLE) AND
      |          n.stopword_ratio >= CAST(0.02 AS DOUBLE) AND
      |          n.dup_bigram_fraction <= CAST(0.10 AS DOUBLE) AND
      |          floor((CAST(tw.topc AS DOUBLE) / CAST(n.n_words AS DOUBLE)) * 1e6 + 0.5) / 1e6 <= CAST(0.20 AS DOUBLE)) AS passes
      |  FROM narrow n JOIN tw ON n.doc_id = tw.doc_id)""".stripMargin

  /** The portable polynomial string hash as DuckDB SQL — the same
    * char-code fold as [[graft.plans.TextHashing.polyHash]]:
    * `h = fold (h*131 + codePoint) mod 1e9+7` (winnow-oracle precedent).
    */
  private def polyHashSql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($s) + 1), " +
      s"j -> CAST(unicode(substr($s, CAST(j AS INT), 1)) AS BIGINT))), " +
      s"(acc, c) -> (acc * 131 + c) % 1000000007)"

  /** DuckDB cosine with the identical left-to-right double fold as
    * [[graft.plans.CosineSimilarity]] — bit-stable across engines.
    */
  private def cosSql(a: String, b: String): String =
    s"(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (x, y) -> x + y) / " +
      s"nullif(sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]), (x, y) -> x + y)) * " +
      s"sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]), (x, y) -> x + y)), CAST(0 AS DOUBLE)))"

  /** One quantized Lloyd iteration as DuckDB SQL (mirrors
    * [[graft.ext.Ivf.kmeansCentroids]] with quantize=true): assign every
    * vector to its max-cosine centroid in `prev` (ties to the smallest id),
    * re-center as the per-dimension mean quantized to 1e-6, keep the
    * previous centroid for empty clusters — emitting CTEs a`cur`/m`cur`/`cur`.
    */
  private def kmeansIterSql(prev: String, cur: String): String =
    s"""a$cur AS (
      |  SELECT vec_id, v, centroid_id FROM (
      |    SELECT e.vec_id, e.v, c.centroid_id,
      |           row_number() OVER (PARTITION BY e.vec_id
      |             ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.centroid_id) AS rn
      |    FROM e CROSS JOIN $prev c)
      |  WHERE rn = 1),
      |m$cur AS (
      |  SELECT centroid_id, list(m ORDER BY pos) AS mv FROM (
      |    SELECT centroid_id, i AS pos,
      |           floor((sum(v[i]) / count(*)) * 1e6 + 0.5) / 1e6 AS m
      |    FROM a$cur, unnest(range(1, len(v) + 1)) AS t(i)
      |    GROUP BY centroid_id, i) mm
      |  GROUP BY centroid_id),
      |$cur AS (
      |  SELECT p.centroid_id, coalesce(m.mv, p.cv) AS cv
      |  FROM $prev p LEFT JOIN m$cur m USING (centroid_id))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_edit_distance" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       levenshtein(a.text, b.text) AS edit_dist,
        |       floor((CAST(1 AS DOUBLE) - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
        |              CAST(greatest(length(a.text), length(b.text)) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |         AS similarity
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |probes AS (
        |  SELECT centroid_id FROM (
        |    SELECT centroid_id, ${cosSql("cv", "qv")} AS qcos FROM c, q)
        |  ORDER BY qcos DESC, centroid_id LIMIT 2),
        |assign AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT e.vec_id, c.centroid_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.centroid_id) AS rn
        |    FROM e CROSS JOIN c)
        |  WHERE rn = 1)
        |SELECT e.vec_id, a.centroid_id,
        |       floor(${cosSql("e.v", "qv")} * 1e6 + 0.5) / 1e6 AS cosine
        |FROM e JOIN assign a ON e.vec_id = a.vec_id CROSS JOIN q
        |WHERE a.centroid_id IN (SELECT centroid_id FROM probes) AND e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       floor((avg(CAST(len(string_split(text, ' ')) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS avg_tokens,
        |       floor((avg(CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS avg_chars_per_token
        |FROM documents GROUP BY lang""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id,
        |       len(t) AS token_count,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS regex_token_count,
        |       floor((CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS unique_token_ratio,
        |       floor((CAST(len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS stopword_ratio,
        |       floor((greatest(least(
        |         CAST(0.5 AS DOUBLE) * least(CAST(len(t) AS DOUBLE) / CAST(50 AS DOUBLE), CAST(1 AS DOUBLE)) +
        |         CAST(0.5 AS DOUBLE) * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) -
        |         greatest(CAST(len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) AS DOUBLE) / CAST(len(t) AS DOUBLE) - CAST(0.4 AS DOUBLE), CAST(0 AS DOUBLE)),
        |         CAST(1 AS DOUBLE)), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS quality_score
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)""".stripMargin,

    // Mirrors QualityRules.compute: bigrams via slice-zip, quantized metrics,
    // pass flags decided on the QUANTIZED values (tier-flip-safe).
    "q_quality_rules" ->
      s"""WITH $qualityRuleCtes
        |SELECT doc_id, n_words, mean_word_len, stopword_ratio,
        |       dup_bigram_fraction, top_word_fraction, passes
        |FROM rules""".stripMargin,

    // Mirrors the composed curation pipeline: en lang-ID ∧ quality pass ∧
    // exact-dedup canonical, then the md5 hash split.
    "q_curation_pipeline" ->
      s"""WITH $qualityRuleCtes,
        |en AS (
        |  SELECT doc_id FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)
        |  WHERE contains(p, ' the ') OR contains(p, ' and ')),
        |canon AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT r.doc_id,
        |       CASE WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
        |            WHEN u < CAST(0.9 AS DOUBLE) THEN 'valid'
        |            ELSE 'test' END AS split
        |FROM (
        |  SELECT rules.doc_id,
        |         CAST(('0x' || substr(md5(CAST(rules.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           / CAST(4294967296 AS DOUBLE) AS u
        |  FROM rules
        |  JOIN en ON rules.doc_id = en.doc_id
        |  JOIN canon ON rules.doc_id = canon.doc_id
        |  WHERE rules.passes) r""".stripMargin,

    "q_lang_id" ->
      """SELECT lang,
        |       CASE WHEN contains(p, ' the ') OR contains(p, ' and ') THEN 'en'
        |            WHEN contains(p, ' der ') OR contains(p, ' und ') THEN 'de'
        |            WHEN contains(p, ' el ') OR contains(p, ' los ') THEN 'es'
        |            WHEN contains(p, ' le ') OR contains(p, ' les ') THEN 'fr'
        |            WHEN contains(p, ' de ') OR contains(p, ' la ') THEN 'romance'
        |            ELSE 'unknown' END AS predicted,
        |       count(*) AS n
        |FROM (SELECT lang, ' ' || text || ' ' AS p FROM documents)
        |GROUP BY 1, 2""".stripMargin,

    "q_text_dup_exact" ->
      """SELECT md5(text) AS fingerprint, count(*) AS n_docs,
        |       min(doc_id) AS keep_doc_id, max(doc_id) AS dup_doc_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,

    // Mirrors Winnow.fingerprints exactly: polynomial k-gram hash mod 1e9+7
    // (list_reduce seeded via list_prepend 0), w-window minima, distinct.
    "q_winnow_pairs" -> s"WITH $winnowCtes\n$winnowPairsSelect",

    // Mirrors Dedup.repeatedSpans: positional 5-gram md5, grams gated to
    // <= 64 occurrences and >= 2 distinct docs, cross-doc position pairs,
    // diagonal gaps-and-islands merge to maximal spans >= 10 tokens.
    "q_repeated_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 5),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |         md5(array_to_string(t[i+1:i+5], ' ')) AS g
        |  FROM tok, unnest(range(0, len(t) - 5 + 1)) AS r(i)),
        |keep AS (SELECT g FROM grams GROUP BY g
        |         HAVING count(*) <= 64 AND count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos, g FROM grams WHERE g IN (SELECT g FROM keep)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
        |  FROM hits a JOIN hits b USING (g) WHERE a.doc_id < b.doc_id),
        |runs AS (
        |  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS delta,
        |         pos_a - row_number() OVER (
        |           PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS run_id
        |  FROM pairs)
        |SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
        |       CAST(max(pos_a) - min(pos_a) + 5 AS BIGINT) AS span_tokens
        |FROM runs GROUP BY doc_a, doc_b, delta, run_id
        |HAVING span_tokens >= 10""".stripMargin,

    // Mirrors Dedup.portableMinhashPairs: 3-word shingles -> poly base hash
    // -> 32 affine hashes ((2i+1)h+i mod 1e9+7), min per slot, 8 bands of 4
    // rendered as CSV keys, bucket join capped at 1000, shared-band counts.
    "q_minhash_portable" ->
      s"""WITH sh0 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 3),
        |hs AS (
        |  SELECT doc_id, list_transform(sh, s -> ${polyHashSql("s")}) AS hs
        |  FROM sh0 WHERE len(sh) > 0),
        |sig AS (
        |  SELECT doc_id, list_transform(range(0, 32), i ->
        |           list_min(list_transform(hs, h -> ((2*i + 1) * h + i) % 1000000007))) AS sig
        |  FROM hs),
        |keys AS (
        |  SELECT doc_id, unnest(range(0, 8)) AS band,
        |         unnest(list_transform(range(0, 8), b -> array_to_string(
        |           list_transform(range(b*4 + 1, b*4 + 5), r -> CAST(sig[r] AS VARCHAR)), ','))) AS key
        |  FROM sig),
        |ok AS (
        |  SELECT band, key FROM keys GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 1000)
        |SELECT k1.doc_id AS doc_a, k2.doc_id AS doc_b, count(*) AS n_shared_bands
        |FROM keys k1
        |JOIN keys k2 ON k1.band = k2.band AND k1.key = k2.key AND k1.doc_id < k2.doc_id
        |JOIN ok ON ok.band = k1.band AND ok.key = k1.key
        |GROUP BY 1, 2""".stripMargin,

    // Same-family replay of the gated query (Dedup.nearDupsPortable): the
    // portable polynomial 3-shingle LSH candidates (8 bands x 4 rows,
    // bucket cap 1000) through the exact Jaccard verify at 0.5 — every hash
    // is a char-code fold DuckDB reproduces bit-for-bit, so the compare is
    // exact by construction at any fixture regeneration.
    "q_minhash_pairs" ->
      s"""WITH sh3 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 3),
        |hs AS (
        |  SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hs
        |  FROM sh3 WHERE len(sh) > 0),
        |sig AS (
        |  SELECT doc_id, sh, list_transform(range(0, 32), i ->
        |           list_min(list_transform(hs, h -> ((2*i + 1) * h + i) % 1000000007))) AS sig
        |  FROM hs),
        |keys AS (
        |  SELECT doc_id, unnest(range(0, 8)) AS band,
        |         unnest(list_transform(range(0, 8), b -> array_to_string(
        |           list_transform(range(b*4 + 1, b*4 + 5), r -> CAST(sig[r] AS VARCHAR)), ','))) AS key
        |  FROM sig),
        |ok AS (
        |  SELECT band, key FROM keys GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 1000),
        |cand AS (
        |  SELECT DISTINCT k1.doc_id AS doc_a, k2.doc_id AS doc_b
        |  FROM keys k1
        |  JOIN keys k2 ON k1.band = k2.band AND k1.key = k2.key AND k1.doc_id < k2.doc_id
        |  JOIN ok ON ok.band = k1.band AND ok.key = k1.key)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT c.doc_a, c.doc_b,
        |         floor((CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) /
        |                nullif(CAST(len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS jaccard
        |  FROM cand c JOIN sig a ON a.doc_id = c.doc_a JOIN sig b ON b.doc_id = c.doc_b)
        |WHERE jaccard >= CAST(0.5 AS DOUBLE)""".stripMargin,

    // Mirrors Dedup.simhashDups60: 60-bit portable simhash — bits 0..29 vote
    // on the base polynomial hash, bits 30..59 on the affine rehash
    // (31h+17 mod 1e9+7); doc_ids rendered as the same JSON array string
    // Spark's to_json emits.
    "q_simhash_dups" ->
      s"""SELECT simhash, count(*) AS n_docs,
        |       '[' || array_to_string(list_transform(list_sort(list(doc_id)),
        |         d -> CAST(d AS VARCHAR)), ',') || ']' AS doc_ids
        |FROM (
        |  SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(0, 60), j ->
        |             CASE WHEN 2 * len(list_filter(hs, h ->
        |                    ((CASE WHEN j < 30 THEN h
        |                           ELSE (31 * h + 17) % 1000000007 END)
        |                     // (CAST(1 AS BIGINT) << (j % 30))) % 2 = 1)) >= len(hs)
        |                  THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
        |           (a, b) -> a + b) AS simhash
        |  FROM (SELECT doc_id,
        |               list_transform(string_split(text, ' '), tok -> ${polyHashSql("tok")}) AS hs
        |        FROM documents))
        |GROUP BY simhash HAVING count(*) > 1""".stripMargin,

    // Mirrors the flagship q_embed_neardup (portable hyperplanes at the
    // higher-recall operating point): 6 md5-parity planes, cosine verify,
    // threshold 0.25 on the quantized value.
    "q_embed_neardup" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (
        |  SELECT vec_id, v,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 6), p ->
        |      CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |             list_transform(range(1, len(v) + 1), i -> v[i] *
        |               (CASE WHEN CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0
        |                     THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END))),
        |             (a, x) -> a + x) >= CAST(0 AS DOUBLE)
        |           THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)),
        |      (a, x) -> a + x) AS bucket
        |  FROM e)
        |SELECT vec_a, vec_b, cosine FROM (
        |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
        |         floor(${cosSql("a.v", "b2.v")} * 1e6 + 0.5) / 1e6 AS cosine
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        |WHERE cosine >= CAST(0.25 AS DOUBLE)""".stripMargin,

    // Full replay of the quantized 3-iteration Lloyd k-means + IVF probe:
    // per-iteration centroid means are quantized to 1e-6 on BOTH engines, so
    // the trained centroids — and the assignment, probe set, and final
    // top-k — reproduce bit-identically despite different summation orders.
    "q_ann_ivf_kmeans" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |c0 AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
        |${kmeansIterSql("c0", "c1")},
        |${kmeansIterSql("c1", "c2")},
        |${kmeansIterSql("c2", "c3")},
        |probes AS (
        |  SELECT centroid_id FROM (
        |    SELECT centroid_id, ${cosSql("cv", "qv")} AS qcos FROM c3, q)
        |  ORDER BY qcos DESC, centroid_id LIMIT 4),
        |assign AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT e.vec_id, c.centroid_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.centroid_id) AS rn
        |    FROM e CROSS JOIN c3 c)
        |  WHERE rn = 1)
        |SELECT e.vec_id, a.centroid_id,
        |       floor(${cosSql("e.v", "qv")} * 1e6 + 0.5) / 1e6 AS cosine
        |FROM e JOIN assign a ON e.vec_id = a.vec_id CROSS JOIN q
        |WHERE a.centroid_id IN (SELECT centroid_id FROM probes) AND e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin,

    // Mirrors Similarity.portableNearDupPairs: SRP bucket = Σ 2^p over
    // planes whose index-order projection fold is >= 0, signs from the
    // parity of md5("p_i")'s first hex digit; bucket join, cosine verify
    // on the shared left-to-right fold, threshold on the quantized value.
    // Mirrors the int8 round-trip: same max-abs scale, same
    // floor(x*127/scale + 0.5)*scale/127 reconstruction, same left folds.
    "q_embed_quant" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |         list_max(list_transform(v, x -> abs(x))) AS scale
        |  FROM e)
        |SELECT vec_id,
        |  floor(scale * 1e6 + 0.5) / 1e6 AS scale_q,
        |  floor((list_max(list_transform(v, x ->
        |      abs(x - floor(x * 127.0 / nullif(scale, CAST(0 AS DOUBLE)) + 0.5)
        |            * scale / 127.0)))) * 1e6 + 0.5) / 1e6 AS max_abs_err,
        |  floor((list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x ->
        |      abs(x - floor(x * 127.0 / nullif(scale, CAST(0 AS DOUBLE)) + 0.5)
        |            * scale / 127.0))), (acc, x) -> acc + x)
        |      / CAST(len(v) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mean_abs_err
        |FROM s""".stripMargin,

    "q_embed_portable" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (
        |  SELECT vec_id, v,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 8), p ->
        |      CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |             list_transform(range(1, len(v) + 1), i -> v[i] *
        |               (CASE WHEN CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0
        |                     THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END))),
        |             (a, x) -> a + x) >= CAST(0 AS DOUBLE)
        |           THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)),
        |      (a, x) -> a + x) AS bucket
        |  FROM e)
        |SELECT vec_a, vec_b, cosine FROM (
        |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
        |         floor(${cosSql("a.v", "b2.v")} * 1e6 + 0.5) / 1e6 AS cosine
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        |WHERE cosine >= CAST(0.3 AS DOUBLE)""".stripMargin,

    // Mirrors Dedup.portableSimhashDups: 30-bit vote over poly token hashes,
    // bit j set when 2*count >= n; doc_ids as a sorted CSV string.
    "q_simhash_portable" ->
      s"""SELECT simhash, count(*) AS n_docs,
        |       array_to_string(list_transform(list_sort(list(doc_id)),
        |         d -> CAST(d AS VARCHAR)), ',') AS doc_ids
        |FROM (
        |  SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(0, 30), j ->
        |             CASE WHEN 2 * len(list_filter(hs, h ->
        |                    (h // (CAST(1 AS BIGINT) << j)) % 2 = 1)) >= len(hs)
        |                  THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
        |           (a, b) -> a + b) AS simhash
        |  FROM (SELECT doc_id,
        |               list_transform(string_split(text, ' '), tok -> ${polyHashSql("tok")}) AS hs
        |        FROM documents))
        |GROUP BY simhash HAVING count(*) > 1""".stripMargin,

    // TF-IDF with smoothed ln idf; rank and score share the quantized
    // value (ln cross-engine agreement: same precedent as q_volatility_1h).
    "q_tfidf_top" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |t AS (SELECT doc_id, term, count(*) AS tf
        |      FROM toks WHERE length(term) > 0 GROUP BY 1, 2),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf,
        |         floor((CAST(t.tf AS DOUBLE) *
        |           ln((CAST(n.n_docs AS DOUBLE) + CAST(1 AS DOUBLE)) /
        |              (CAST(d.df AS DOUBLE) + CAST(1 AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS tfidf
        |  FROM t JOIN d USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, tfidf, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // Connected components of the winnow pair graph via a recursive CTE:
    // labels reach every node a walk can, min per node = component id —
    // the declarative twin of DupClusters' min-label propagation. Shared
    // verbatim by the driver-DSU tier (q_dup_clusters) and the forced
    // distributed tier (q_dup_clusters_dist).
    "q_dup_clusters" -> dupClustersOracle,
    "q_dup_clusters_dist" -> dupClustersOracle,

    "q_ngram_jaccard" -> s"""WITH $shinglesCte,
      |q AS (SELECT sh AS qsh FROM s WHERE doc_id = 0)
      |SELECT doc_id,
      |       floor((CAST(len(list_filter(sh, x -> list_contains(qsh, x))) AS DOUBLE) /
      |              nullif(CAST(len(sh) + len(qsh) - len(list_filter(sh, x -> list_contains(qsh, x))) AS DOUBLE), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS jaccard
      |FROM s, q WHERE doc_id <> 0""".stripMargin,

    "q_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |c AS (SELECT vec_id,
        |        list_reduce(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]), (a, b) -> a + b) AS dp,
        |        list_reduce(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]), (a, b) -> a + b) AS na,
        |        list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i]), (a, b) -> a + b) AS nb
        |      FROM e, q WHERE vec_id <> 0)
        |SELECT vec_id, floor((dp / nullif(sqrt(na) * sqrt(nb), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS cosine
        |FROM c ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,

    "q_cosine_topk_native" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |c AS (SELECT vec_id,
        |        list_reduce(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]), (a, b) -> a + b) AS dp,
        |        list_reduce(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]), (a, b) -> a + b) AS na,
        |        list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i]), (a, b) -> a + b) AS nb
        |      FROM e, q WHERE vec_id <> 0)
        |SELECT vec_id, floor((dp / nullif(sqrt(na) * sqrt(nb), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS cosine
        |FROM c ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,

    "q_text_normalize" ->
      """SELECT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |            ' +', ' ', 'g')) AS norm_text,
        |       count(*) AS n_docs, min(doc_id) AS keep_doc_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q_train_split" ->
      """SELECT split, lang, count(*) AS n FROM (
        |  SELECT lang,
        |         CASE WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
        |              WHEN u < CAST(0.9 AS DOUBLE) THEN 'valid'
        |              ELSE 'test' END AS split
        |  FROM (SELECT lang,
        |               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |                 / CAST(4294967296 AS DOUBLE) AS u
        |        FROM documents))
        |GROUP BY 1, 2""".stripMargin,

    "q_balanced_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin,

    "q_doc_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |x AS (SELECT doc_id, t,
        |             unnest(range(0, CAST(ceil(CAST(len(t) AS DOUBLE) / 50) AS BIGINT))) AS ci
        |      FROM d)
        |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |       array_to_string(t[(ci*50+1):(ci*50+50)], ' ') AS chunk_text,
        |       CAST(len(t[(ci*50+1):(ci*50+50)]) AS INT) AS chunk_tokens
        |FROM x""".stripMargin,

    // Mirrors Curation.packSequences: per-source md5-ordered token cumsum,
    // 512-token window spans via integer division.
    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         md5('pack:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, n_tokens,
        |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_tok
        |  FROM d)
        |SELECT doc_id, source, n_tokens,
        |       end_tok - n_tokens AS start_tok,
        |       (end_tok - n_tokens) // 512 AS start_window,
        |       (end_tok - 1) // 512 AS end_window,
        |       (end_tok - 1) // 512 - (end_tok - n_tokens) // 512 + 1 AS n_windows_spanned
        |FROM s""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, source,
        |       CAST(strlen(text) AS INTEGER) AS n_bytes,
        |       64 + (ascii(substr(md5(text), 1, 1)) % 16) * 16 AS width,
        |       64 + (ascii(substr(md5(text), 2, 1)) % 16) * 16 AS height,
        |       1 + doc_id % 8 AS n_frames,
        |       substr(md5(text), 1, 8) AS codec_tag
        |FROM documents""".stripMargin,

    "q_frame_sample" ->
      """SELECT media_id, n_frames, frame_idx FROM (
        |  SELECT doc_id AS media_id, 1 + doc_id % 8 AS n_frames,
        |         unnest(range(0, 1 + doc_id % 8)) AS frame_idx
        |  FROM documents)
        |WHERE frame_idx % 2 = 0""".stripMargin,

    // Mirrors Scrub.piiAudit over the same deterministically-augmented
    // text; RE2 patterns are identical to the Java-regex ones (no
    // backtracking-only constructs), replacement with the 'g' flag.
    "q_pii_redact" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |       CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
        |       CAST(len(regexp_extract_all(text, '\b\d{13,19}\b')) AS INTEGER) AS n_longnums,
        |       md5(regexp_replace(regexp_replace(regexp_replace(text,
        |             '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |             '\b\d{13,19}\b', '<NUM>', 'g')) AS redacted_fp
        |FROM (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |         '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        |         '.7 card 4111111111111111' AS text
        |  FROM documents)""".stripMargin,

    // Mirrors Scrub.decontaminate: identical md5 gram hashes, train =
    // doc_id % 50 <> 0, eval = the rest; left join restores 0-overlap docs.
    "q_decontaminate" ->
      """WITH grams AS (
        |  SELECT doc_id,
        |         unnest(CASE WHEN len(t) >= 8
        |           THEN list_transform(range(1, len(t) - 6),
        |                  i -> md5(array_to_string(t[i:i+7], ' ')))
        |           ELSE [] END) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |tg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 50 <> 0),
        |eg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
        |shared AS (
        |  SELECT doc_id, count(*) AS n_shared FROM tg
        |  WHERE g IN (SELECT g FROM eg) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(s.n_shared, 0) AS n_shared,
        |       COALESCE(s.n_shared, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        |LEFT JOIN shared s USING (doc_id)""".stripMargin,

    // Mirrors Scrub.boilerplate (k=5, minDocs=3). Docs shorter than k
    // tokens have no grams and are absent on both sides.
    "q_boilerplate" ->
      """WITH dg AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id,
        |           unnest(CASE WHEN len(t) >= 5
        |             THEN list_transform(range(1, len(t) - 3),
        |                    i -> md5(array_to_string(t[i:i+4], ' ')))
        |             ELSE [] END) AS g
        |    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))),
        |boiler AS (
        |  SELECT g FROM dg GROUP BY g HAVING count(*) >= 3),
        |flagged AS (
        |  SELECT doc_id, count(*) AS n_boiler FROM dg
        |  WHERE g IN (SELECT g FROM boiler) GROUP BY doc_id)
        |SELECT dg.doc_id, count(*) AS n_grams,
        |       COALESCE(max(f.n_boiler), 0) AS n_boiler,
        |       floor((CAST(COALESCE(max(f.n_boiler), 0) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS boilerplate_frac
        |FROM dg LEFT JOIN flagged f USING (doc_id)
        |GROUP BY dg.doc_id""".stripMargin,

    // Mirrors unigramCrossEntropy: zipped parallel unnests give (pos, tok),
    // per-token nll quantized in the model, per-doc fold in position order.
    "q_unigram_ce" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, unnest(t) AS tok
        |  FROM base),
        |model AS (
        |  SELECT tok,
        |         floor((-ln(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM toks))) * 1e6 + 0.5) / 1e6 AS nll
        |  FROM toks GROUP BY tok)
        |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
        |       floor((list_reduce(list_prepend(CAST(0 AS DOUBLE), l), (a, x) -> a + x)
        |              / len(l)) * 1e6 + 0.5) / 1e6 AS unigram_ce
        |FROM (
        |  SELECT t.doc_id, list(m.nll ORDER BY t.pos) AS l
        |  FROM toks t JOIN model m ON t.tok = m.tok
        |  GROUP BY t.doc_id)""".stripMargin,

    // Mirrors the composed funnel stage by stage; quality rules are
    // per-doc metrics, so computing them corpus-wide and joining the en
    // slice equals computing them on the slice.
    "q_pretrain_pipeline" ->
      s"""WITH $qualityRuleCtes,
        |en AS (
        |  SELECT doc_id, text FROM (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents)
        |  WHERE contains(p, ' the ') OR contains(p, ' and ')),
        |red AS (
        |  SELECT doc_id,
        |         regexp_replace(regexp_replace(regexp_replace(text,
        |           '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
        |           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
        |           '\\b\\d{13,19}\\b', '<NUM>', 'g') AS text
        |  FROM en),
        |canon AS (SELECT min(doc_id) AS doc_id FROM red GROUP BY md5(text)),
        |pgrams AS (
        |  SELECT doc_id,
        |         unnest(CASE WHEN len(t) >= 8
        |           THEN list_distinct(list_transform(range(1, len(t) - 6),
        |                  i -> md5(array_to_string(t[i:i+7], ' '))))
        |           ELSE [] END) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM red)),
        |ptg AS (SELECT doc_id, g FROM pgrams WHERE doc_id % 50 <> 0),
        |peg AS (SELECT DISTINCT g FROM pgrams WHERE doc_id % 50 = 0),
        |pclean AS (
        |  SELECT d.doc_id FROM (SELECT doc_id FROM red WHERE doc_id % 50 <> 0) d
        |  LEFT JOIN (SELECT doc_id, count(*) AS ns FROM ptg
        |             WHERE g IN (SELECT g FROM peg) GROUP BY doc_id) s
        |    USING (doc_id)
        |  WHERE COALESCE(s.ns, 0) = 0),
        |surv AS (
        |  SELECT e.doc_id FROM en e
        |  JOIN (SELECT doc_id FROM rules WHERE passes) q USING (doc_id)
        |  JOIN canon USING (doc_id)
        |  JOIN pclean USING (doc_id))
        |SELECT 'input' AS stage, count(*) AS n FROM documents
        |UNION ALL SELECT 'lang_en', count(*) FROM en
        |UNION ALL SELECT 'quality_pass', count(*) FROM rules r
        |          WHERE r.passes AND r.doc_id IN (SELECT doc_id FROM en)
        |UNION ALL SELECT 'canonical', count(*) FROM canon
        |UNION ALL SELECT 'decontaminated', count(*) FROM pclean
        |UNION ALL
        |SELECT CASE WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
        |            WHEN u < CAST(0.9 AS DOUBLE) THEN 'valid'
        |            ELSE 'test' END AS stage, count(*) AS n
        |FROM (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |             / CAST(4294967296 AS DOUBLE) AS u
        |      FROM surv)
        |GROUP BY 1""".stripMargin,

    // Mirrors Curation.mixtureSample + the per-source rate config.
    "q_source_mix" ->
      """SELECT source, count(*) AS n_kept FROM (
        |  SELECT source FROM (
        |    SELECT source,
        |           CAST(('0x' || substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |             / CAST(4294967296 AS DOUBLE) AS u,
        |           (CAST(substr(source, 4, 10) AS INT) % 4 + 1) * CAST(0.2 AS DOUBLE) AS rate
        |    FROM documents)
        |  WHERE u < rate)
        |GROUP BY source""".stripMargin)
}
