package graft

import graft.core.Tables
import graft.ext.{Dedup, QualityRules, Similarity, TextStats}
import graft.quality.{DqScore, KsTest}
import org.apache.spark.sql.functions._

/** LLM-pipeline ext operators + quality framework. */
class ExtSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sf0001)

  test("minhash near-dup finds planted near-duplicates and only high-jaccard pairs") {
    val pairs = Dedup.nearDups(docs, threshold = 0.5).collect()
    assert(pairs.nonEmpty, "corpus contains planted near-dups; LSH must surface them")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("minhash candidates contain every exact-duplicate text pair (recall on identity)") {
    val exact = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val candidates = Dedup.minhashCandidates(docs)
    assert(exact.exceptAll(candidates).count() === 0)
  }

  test("simhash collides only for near-identical token sets (high jaccard)") {
    val dups = Dedup.simhashDups(docs)
    assert(dups.count() > 0, "planted dups must collide")
    // simhash is deliberately lossy: colliding docs should be near-identical
    // in token-set space, not necessarily byte-identical.
    val sets = docs.select(col("doc_id"), Dedup.shingles(col("text"), 1).as("sh"))
    val exploded = dups.select(explode(col("doc_ids")).as("doc_id"), col("simhash"))
      .join(sets, "doc_id")
    val pairs = exploded.as("a").join(exploded.as("b"),
        col("a.simhash") === col("b.simhash") && col("a.doc_id") < col("b.doc_id"))
      .select(Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
    assert(pairs.filter(col("j") < 0.8).count() === 0)
  }

  test("native text-hash expressions are value-identical to the HOF spec forms") {
    import graft.plans.TextHashing
    val d = docs.select(col("doc_id"), col("text"))
    // shingles (n = 1 and n = 3), minhash signature, bands, simhash
    val both = d.select(
      col("doc_id"),
      TextHashing.shingles(col("text"), 1).as("sh1_n"),
      Dedup.Hof.shingles(col("text"), 1).as("sh1_h"),
      TextHashing.shingles(col("text"), 3).as("sh3_n"),
      Dedup.Hof.shingles(col("text"), 3).as("sh3_h"),
      TextHashing.simhash(col("text")).as("simhash_n"),
      Dedup.Hof.simhash(col("text")).as("simhash_h"))
    assert(both.filter(col("sh1_n") =!= col("sh1_h")).count() === 0)
    assert(both.filter(col("sh3_n") =!= col("sh3_h")).count() === 0)
    assert(both.filter(col("simhash_n") =!= col("simhash_h")).count() === 0)

    val sigs = d.select(TextHashing.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(
        TextHashing.minhashSignature(col("sh"), 32).as("sig_n"),
        Dedup.Hof.minhashSignature(col("sh"), 32).as("sig_h"),
        TextHashing.minhashBands(col("sh"), 32, 8).as("bands_n"))
    assert(sigs.filter(col("sig_n") =!= col("sig_h")).count() === 0)
    assert(sigs.filter(col("bands_n") =!= Dedup.Hof.bands(col("sig_h"), 32, 8)).count() === 0)

    // jaccard on real shingle pairs (cross a small sample)
    val s = d.limit(20).select(TextHashing.shingles(col("text"), 2).as("sh"))
    val pairs = s.as("a").crossJoin(s.as("b"))
      .select(
        TextHashing.jaccard(col("a.sh"), col("b.sh")).as("j_n"),
        Dedup.Hof.jaccard(col("a.sh"), col("b.sh")).as("j_h"))
    assert(pairs.filter(
      (col("j_n").isNull =!= col("j_h").isNull) ||
        (col("j_n").isNotNull && col("j_n") =!= col("j_h"))).count() === 0)
  }

  test("SQL-registered text-hash functions match the column API") {
    graft.plans.TextHashing.register(spark)
    // deterministic subset: limit without orderBy may pick different rows
    // on the two independent executions below
    docs.filter(col("doc_id") < 50).createOrReplaceTempView("th_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(text) AS sh,
        |       graft_minhash_bands(graft_shingles(text, 3), 32, 8) AS bands
        |FROM th_docs""".stripMargin)
    val viaCols = docs.filter(col("doc_id") < 50).select(
      col("doc_id"),
      graft.plans.TextHashing.simhash(col("text")).as("sh"),
      graft.plans.TextHashing.minhashBands(
        graft.plans.TextHashing.shingles(col("text"), 3), 32, 8).as("bands"))
    assert(viaSql.exceptAll(viaCols).count() === 0)
    assert(viaCols.exceptAll(viaSql).count() === 0)
  }

  test("native jaccard edge cases: empty arrays -> null, disjoint -> 0, equal -> 1") {
    import spark.implicits._
    val rows = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b"), Seq("a", "b"))).toDF("a", "b")
    val out = rows.select(Dedup.jaccard(col("a"), col("b")).as("j")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 0.0)
    assert(out(2).getDouble(0) === 1.0)
  }

  test("cosine: self-similarity is 1, topK is ordered and bounded") {
    val emb = Tables.embeddings(spark, sf0001)
    val self = emb.limit(5)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
    val top = Similarity.topK(emb, 0L, 10).collect()
    assert(top.length === 10)
    val cosines = top.map(_.getAs[Double]("cosine"))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, "descending")
    assert(cosines.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }

  test("native SRP bucket is value-identical to the HOF spec form") {
    val emb = Tables.embeddings(spark, sf0001)
    val both = emb.select(
      Similarity.lshBucket(col("embedding"), 12).as("b_n"),
      Similarity.Hof.lshBucket(col("embedding"), 12).as("b_h"))
    assert(both.filter(col("b_n") =!= col("b_h")).count() === 0)
  }

  test("IVF with full probe degrades exactly to brute-force top-k") {
    val emb = Tables.embeddings(spark, sf0001)
    val brute = Similarity.topK(emb, 0L, 15).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    val full = graft.ext.Ivf.topK(emb, 0L, 15, nCentroids = 16, nProbe = 16)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
    assert(full.toSeq === brute.toSeq)
  }

  test("IVF probe subset keeps high recall on the clustered corpus") {
    val emb = Tables.embeddings(spark, sf0001)
    val brute = Similarity.topK(emb, 0L, 10).collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = graft.ext.Ivf.topK(emb, 0L, 10, nCentroids = 16, nProbe = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((brute intersect ivf).size >= 5,
      s"recall@10 too low: ${(brute intersect ivf).size}/10")
  }

  test("curation: chunks reassemble to the original text; sizes bounded") {
    import graft.ext.Curation
    val chunks = Curation.chunk(docs, chunkTokens = 50)
    assert(chunks.filter(col("chunk_tokens") > 50 || col("chunk_tokens") < 1).count() === 0)
    val reassembled = chunks.orderBy("doc_id", "chunk_idx")
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("chunk_text"))).as("re"))
    val diff = reassembled.join(docs, "doc_id")
      .filter(col("re") =!= col("text")).count()
    assert(diff === 0, "concatenated chunks must equal the source text")
  }

  test("curation: hash split is deterministic, total, and near the target fractions") {
    import graft.ext.Curation
    val s1 = Curation.hashSplit(docs, "doc_id")
    val s2 = Curation.hashSplit(docs, "doc_id")
    assert(s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).count() === 0)
    val n = docs.count()
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.1,
      s"train frac ${counts("train").toDouble / n}")
    assert(counts.values.sum === n, "split must be total (every doc tagged exactly once)")
  }

  test("curation: balanced sample caps every class and is stable") {
    import graft.ext.Curation
    val sample = Curation.balancedSample(docs, "lang", "doc_id", perClass = 7)
    val over = sample.groupBy("lang").count().filter(col("count") > 7).count()
    assert(over === 0)
    val again = Curation.balancedSample(docs, "lang", "doc_id", perClass = 7)
    assert(sample.select("doc_id").exceptAll(again.select("doc_id")).count() === 0)
  }

  test("language id is deterministic and total") {
    val out = docs.select(TextStats.langId(col("text")).as("p"))
    assert(out.filter(col("p").isNull).count() === 0)
  }

  test("quality scores live in [0,1]") {
    val q = TextStats.docQuality(docs)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
    assert(q.filter(col("unique_token_ratio") <= 0 || col("unique_token_ratio") > 1).count() === 0)
  }

  test("DQ score components and overall are in [0,1]; clean data scores >= 0.85") {
    val t = Tables.trades(spark, sf0001)
    val row = DqScore.compute(
      graft.features.Ohlc.compute(t), t.agg(max(col("time")).as("mx"))).collect()(0)
    Seq("completeness", "consistency", "accuracy", "timeliness", "overall").foreach { c =>
      val v = row.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c=$v")
    }
    // the reference's alerting threshold on clean data
    assert(row.getAs[Double]("overall") >= 0.85)
  }

  test("KS test: identical distributions give d == 0; disjoint give d == 1") {
    import spark.implicits._
    // decade blocks alternate groups so every value hits both groups equally
    val same = Seq.tabulate(100)(i => (i % 10 * 1.0, if ((i / 10) % 2 == 0) "a" else "b"))
      .toDF("value", "event_type")
    val d0 = KsTest.dStatistic(same, "value", "event_type", "a", "b")
      .collect()(0).getAs[Double]("d_statistic")
    assert(d0 === 0.0)
    val disjoint = (Seq.tabulate(50)(i => (i * 1.0, "a")) ++
      Seq.tabulate(50)(i => (1000.0 + i, "b"))).toDF("value", "event_type")
    val d1 = KsTest.dStatistic(disjoint, "value", "event_type", "a", "b")
      .collect()(0)
    assert(d1.getAs[Double]("d_statistic") === 1.0)
    assert(d1.getAs[Boolean]("shifted"))
  }

  test("KS p-value and severity: identical → p=1/ok; disjoint → p≈0/critical") {
    import spark.implicits._
    val same = Seq.tabulate(100)(i => (i % 10 * 1.0, if ((i / 10) % 2 == 0) "a" else "b"))
      .toDF("value", "event_type")
    val r0 = KsTest.dStatistic(same, "value", "event_type", "a", "b").collect()(0)
    assert(r0.getAs[Double]("p_value") === 1.0)
    assert(r0.getAs[String]("severity") === "ok")
    val disjoint = (Seq.tabulate(50)(i => (i * 1.0, "a")) ++
      Seq.tabulate(50)(i => (1000.0 + i, "b"))).toDF("value", "event_type")
    val r1 = KsTest.dStatistic(disjoint, "value", "event_type", "a", "b").collect()(0)
    assert(r1.getAs[Double]("p_value") < 0.01)
    assert(r1.getAs[String]("severity") === "critical")
    // moderate shift lands between the tiers deterministically
    val shifted = (Seq.tabulate(60)(i => (i * 1.0, "a")) ++
      Seq.tabulate(60)(i => (i * 1.0 + 14.0, "b"))).toDF("value", "event_type")
    val r2 = KsTest.dStatistic(shifted, "value", "event_type", "a", "b").collect()(0)
    val p2 = r2.getAs[Double]("p_value")
    assert(p2 > 0.0 && p2 < 1.0)
    assert(Seq("ok", "warning", "critical").contains(r2.getAs[String]("severity")))
  }

  test("k-means IVF: deterministic centroids, recall meets the placeholder path") {
    val emb = Tables.embeddings(spark, sf0001)
    def centMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("centroid_id") ->
        r.getAs[Seq[Double]]("centroid")).toMap
    val c1 = centMap(graft.ext.Ivf.kmeansCentroids(emb, 16, iters = 3))
    val c2 = centMap(graft.ext.Ivf.kmeansCentroids(emb, 16, iters = 3))
    assert(c1 === c2, "k-means must be run-to-run deterministic (no RNG)")
    assert(c1.size === 16)

    val brute = Similarity.topK(emb, 0L, 20).collect().map(_.getAs[Long]("vec_id")).toSet
    val trained = graft.ext.Ivf
      .topKWith(emb, graft.ext.Ivf.kmeansCentroids(emb, 16, iters = 3), 0L, 20, nProbe = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((brute intersect trained).size >= 10,
      s"recall@20 too low: ${(brute intersect trained).size}/20")
  }

  test("quantized-Lloyd oracle: every centroid-mean component stays far from its rounding boundary") {
    // The q_ann_ivf_kmeans cross-engine oracle replays the quantized Lloyd
    // trajectory exactly; it is exact only while no raw mean component sits
    // within float-summation error of a 0.5e-6 rounding boundary. That
    // error is ~1e-15 in value = ~1e-9 in quanta (sums of O(100) doubles
    // around 0.1); require a margin 100x above it so a fixture regeneration
    // that lands a mean near a boundary fails HERE with a name, not as an
    // opaque bench hash mismatch. (Shipped fixture measures ~3.8e-5.)
    val emb = Tables.embeddings(spark, sf0001)
    val margin = graft.ext.Ivf.kmeansBoundaryMargin(emb, nCentroids = 16, iters = 3)
    assert(margin > 1e-7,
      f"centroid-mean component within $margin%.2e quanta of a rounding " +
        "boundary — the quantized k-means oracle is fragile on this fixture")
  }

  test("RLS: tenants see disjoint, covering symbol sets") {
    val t = Tables.trades(spark, sf0001)
    val counts = (0L to 2L).map(ten =>
      graft.operators.Rls.withTenant(t, ten).count())
    assert(counts.sum === t.count())
  }

  test("winnowing guarantee: a shared passage of length >= k+w-1 yields a shared fingerprint") {
    import graft.ext.Winnow
    val k = 16; val w = 8
    // two documents sharing one long passage embedded in unrelated noise
    val passage = "the quick brown fox jumps over the lazy dog near the riverbank"
    val docs = spark.createDataFrame(Seq(
      (0L, s"alpha beta gamma delta $passage epsilon zeta"),
      (1L, s"one two three four five six seven $passage eight nine"),
      (2L, "completely unrelated content with no overlap whatsoever here")
    )).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"), Winnow.fingerprints(col("text"), k, w).as("fps"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[collection.Seq[Long]]("fps").toSet)
      .toMap
    assert((fps(0L) intersect fps(1L)).nonEmpty,
      "shared passage longer than k+w-1 must share at least one fingerprint")
    // every non-empty text gets >= 1 fingerprint (boundary rule)
    assert(fps.values.forall(_.nonEmpty))
    // candidate pairs surface the sharing pair and score it above noise
    val pairs = Winnow.candidatePairs(docs, k, w, minShared = 2, maxBucketSize = 10)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("winnow fingerprints: native expression equals the HOF spec on the corpus") {
    import graft.ext.Winnow
    val d = docs.select(col("doc_id"),
      Winnow.fingerprints(col("text"), 16, 8).as("native"),
      Winnow.Hof.fingerprints(col("text"), 16, 8).as("hof"))
    assert(d.filter(not(col("native") === col("hof"))).count() === 0)
  }

  test("winnow fingerprints: native equals HOF on non-ASCII text (code points, not bytes)") {
    import graft.ext.Winnow
    val d = spark.createDataFrame(Seq(
      (0L, "le café est prêt — naïve façade, déjà vu, über alles, smörgåsbord"),
      (1L, "日本語のテキストと emoji 😀🚀 mixed with ascii words here"),
      (2L, "ASCII only control sample for the same parameters and sizes")
    )).toDF("doc_id", "text")
    val cmp = d.select(
      Winnow.fingerprints(col("text"), 8, 4).as("native"),
      Winnow.Hof.fingerprints(col("text"), 8, 4).as("hof"))
    assert(cmp.filter(not(col("native") === col("hof"))).count() === 0)
  }

  test("winnow fingerprints: short-text boundary cases") {
    import graft.ext.Winnow
    val docs = spark.createDataFrame(Seq(
      (0L, "tiny"),                 // shorter than k -> no k-grams
      (1L, "exactly sixteen!!"),    // length 17 -> 2 hashes, < w -> global min
      (2L, "")                      // empty
    )).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"), Winnow.fingerprints(col("text"), 16, 8).as("fps"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[collection.Seq[Long]]("fps"))
      .toMap
    assert(fps(0L).isEmpty)
    assert(fps(1L).length === 1)
    assert(fps(2L).isEmpty)
  }

  test("PSI: identical samples are stable near zero; disjoint samples drift major") {
    import spark.implicits._
    import graft.quality.Psi
    val same = Seq.tabulate(100)(i => (i % 10 * 1.0, if ((i / 10) % 2 == 0) "a" else "b"))
      .toDF("value", "event_type")
    val r0 = Psi.psi(same, "value", "event_type", "a", "b").collect()(0)
    assert(math.abs(r0.getAs[Double]("psi")) < 1e-9)
    assert(r0.getAs[String]("drift") === "stable")
    val disjoint = (Seq.tabulate(50)(i => (i * 1.0, "a")) ++
      Seq.tabulate(50)(i => (1000.0 + i, "b"))).toDF("value", "event_type")
    val r1 = Psi.psi(disjoint, "value", "event_type", "a", "b").collect()(0)
    assert(r1.getAs[Double]("psi") > 0.25)
    assert(r1.getAs[String]("drift") === "major")
  }

  test("tf-idf ranks a document's distinctive term above ubiquitous ones") {
    import graft.ext.TextStats
    val docs = spark.createDataFrame(Seq(
      (0L, "the cat sat"), (1L, "the dog sat"), (2L, "the bird flew")
    )).toDF("doc_id", "text")
    val top = TextStats.tfIdfTopK(docs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // "the" appears in all docs (idf ln(4/4)=0); the unique nouns win
    assert(top === Map(0L -> "cat", 1L -> "dog", 2L -> "bird"))
  }

  test("dup clusters: min-label components over a chain and a disjoint pair") {
    import graft.ext.DupClusters
    // chain 1-2-3-4 (diameter 3, forces multi-round propagation) + {10,11}
    val pairs = spark.createDataFrame(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)
    )).toDF("doc_a", "doc_b")
    val expected = Map(
      1L -> (1L, 4L, true), 2L -> (1L, 4L, false), 3L -> (1L, 4L, false),
      4L -> (1L, 4L, false), 10L -> (10L, 2L, true), 11L -> (10L, 2L, false))
    // both tiers — driver DSU (default) and the distributed label loop
    // (forced via a zero edge budget) — must produce identical clusters
    for (limit <- Seq(4000000L, 0L)) {
      val out = DupClusters.connectedComponents(pairs, driverEdgeLimit = limit)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toMap
      assert(out === expected, s"driverEdgeLimit=$limit")
    }
    // empty pair set resolves to an empty (correctly-typed) frame
    val empty = DupClusters.connectedComponents(pairs.limit(0))
    assert(empty.columns.toSeq ===
      Seq("doc_id", "cluster_id", "cluster_size", "is_canonical"))
    assert(empty.count() === 0)
  }

  test("portable minhash pairs contain every exact-duplicate pair; simhash-poly groups are near-identical") {
    val exact = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val pairs = Dedup.portableMinhashPairs(docs)
    assert(exact.exceptAll(pairs.select("doc_a", "doc_b")).count() === 0)
    // identical docs share every band
    val full = pairs.join(exact, Seq("doc_a", "doc_b"))
    assert(full.filter(col("n_shared_bands") =!= 8).count() === 0)
    val groups = Dedup.portableSimhashDups(docs)
    assert(groups.count() > 0, "planted dups must collide")
  }

  test("portable SRP near-dup pairs: deterministic, ordered, verified above threshold") {
    val emb = Tables.embeddings(spark, sf0001)
    val pairs = Similarity.portableNearDupPairs(emb).collect()
    assert(pairs.nonEmpty, "synthetic corpus has cosine>=0.3 bucket-mates")
    assert(pairs.forall(r => r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.3))
    val again = Similarity.portableNearDupPairs(emb).collect()
    assert(pairs.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("quality rules: repetition fails, a normal doc passes, flags match thresholds") {
    import spark.implicits._
    val clean = "the quick brown fox jumps over lazy dogs while seven wizards " +
      "brew potions under ancient oaks near silver rivers flowing past small " +
      "stone towers where owls watch distant ships sail home"
    val loop = Seq.fill(20)("spam eggs spam").mkString(" ")
    val docs = Seq((1L, clean), (2L, loop)).toDF("doc_id", "text")
    val out = QualityRules.compute(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("passes"),
      s"clean doc should pass: ${out(1L)}")
    assert(!out(2L).getAs[Boolean]("passes"), "repetitive doc must fail")
    assert(out(2L).getAs[Double]("dup_bigram_fraction") > 0.9)
    assert(out(2L).getAs[Double]("top_word_fraction") > 0.2)
    assert(out(1L).getAs[Long]("n_words") >= 30)
  }

  test("curation funnel keeps only en + passing + canonical docs and splits deterministically") {
    import spark.implicits._
    val en = "the quick brown fox jumps over lazy dogs while seven wizards " +
      "brew potions under ancient oaks near silver rivers flowing past small " +
      "stone towers where owls watch distant ships sail home"
    val docs = Seq(
      (1L, en),                                  // kept
      (2L, en),                                  // exact dup of 1 -> dropped
      (3L, Seq.fill(20)("spam eggs spam").mkString(" ")),  // fails quality
      (4L, "der hund und die katze laufen schnell durch den park heute")  // not en
    ).toDF("doc_id", "text")
    val out = graft.ext.Curation.curate(docs).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L))
    assert(Set("train", "valid", "test").contains(out.head.getAs[String]("split")))
    // deterministic: same input, same assignment
    val again = graft.ext.Curation.curate(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("profiler reports exact nulls, cardinality and typed ranges per column") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("b", Some(3.5)), ("a", None), ("c", Some(-2.0))
    ).toDF("name", "score")
    val out = graft.quality.Profiler.profile(
      df, Seq("name" -> false, "score" -> true)).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val nameR = out("name")
    assert(nameR.getAs[Long]("n_rows") === 4L)
    assert(nameR.getAs[Long]("n_nulls") === 0L)
    assert(nameR.getAs[Long]("n_distinct") === 3L)
    assert(nameR.getAs[String]("min_str") === "a")
    assert(nameR.getAs[String]("max_str") === "c")
    assert(nameR.isNullAt(nameR.fieldIndex("min_num")))
    val scoreR = out("score")
    assert(scoreR.getAs[Long]("n_nulls") === 1L)
    assert(scoreR.getAs[Long]("n_distinct") === 3L)
    assert(scoreR.getAs[Double]("min_num") === -2.0)
    assert(scoreR.getAs[Double]("max_num") === 3.5)
    assert(scoreR.getAs[Double]("null_fraction") === 0.25)
  }

  test("approx profile: HLL distinct counts within tolerance of exact at sf0.1; rest identical") {
    val cols = Seq("symbol" -> false, "side" -> false, "trade_id" -> false,
      "price" -> true, "volume" -> true, "bid" -> true, "ask" -> true)
    val t = graft.core.Tables.trades(spark, "/root/testdata/sf0.1")
    def byCol(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val exact = byCol(graft.quality.Profiler.profile(t, cols))
    val approx = byCol(graft.quality.Profiler.profileApprox(t, cols, rsd = 0.05))
    cols.foreach { case (c, _) =>
      val e = exact(c); val a = approx(c)
      // distinct counts: HLL++ rsd 0.05 — allow 4x the nominal rsd
      val (ne, na) = (e.getAs[Long]("n_distinct"), a.getAs[Long]("n_distinct"))
      assert(math.abs(na - ne) <= math.max(1L, (ne * 0.2).toLong),
        s"$c: approx n_distinct $na too far from exact $ne")
      // everything that ISN'T a sketch must be identical
      Seq("n_rows", "n_nulls").foreach(f =>
        assert(a.getAs[Long](f) === e.getAs[Long](f), s"$c.$f drifted"))
      Seq("null_fraction", "min_num", "max_num").foreach { f =>
        val i = e.fieldIndex(f)
        assert(a.isNullAt(i) === e.isNullAt(i), s"$c.$f nullness drifted")
        if (!e.isNullAt(i))
          assert(a.getAs[Double](f) === e.getAs[Double](f), s"$c.$f drifted")
      }
      Seq("min_str", "max_str").foreach { f =>
        val i = e.fieldIndex(f)
        assert(a.isNullAt(i) === e.isNullAt(i), s"$c.$f nullness drifted")
        if (!e.isNullAt(i))
          assert(a.getAs[String](f) === e.getAs[String](f), s"$c.$f drifted")
      }
    }
  }

  test("repeated spans: maximal shared runs located exactly, singletons ignored") {
    import spark.implicits._
    // docs 1 and 2 share tokens 0..10 (11 tokens) then diverge; doc 3 is
    // disjoint; doc 4 repeats doc 1's tokens 4..8 (5 tokens) mid-document.
    val shared = (0 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, shared + " x1 x2 x3"),
      (2L, shared + " y1 y2 y3"),
      (3L, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"),
      (4L, "p0 p1 w4 w5 w6 w7 w8 q0 q1 q2")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, k = 3, maxHits = 64, minLen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // (1,2): the full 11-token prefix, not fragments; (1,4)/(2,4): the
    // 5-token excerpt at its true offsets. Nothing touches doc 3.
    assert(spans === Set(
      (1L, 2L, 0L, 0L, 11L), (1L, 4L, 4L, 2L, 5L), (2L, 4L, 4L, 2L, 5L)))
  }

  test("repeated spans on the corpus are verbatim and left/right maximal") {
    val spans = Dedup.repeatedSpans(docs, k = 5, maxHits = 64, minLen = 10)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("tok"))
    val joined = spans
      .join(toks.select(col("doc_id").as("doc_a"), col("tok").as("tok_a")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("tok").as("tok_b")), "doc_b")
    assert(joined.count() > 0, "sf0.001 corpus contains planted duplicate passages")
    // verbatim: the claimed token range matches exactly in both documents
    val mismatched = joined.filter(
      slice(col("tok_a"), col("start_a") + 1, col("span_tokens")) =!=
        slice(col("tok_b"), col("start_b") + 1, col("span_tokens")))
    assert(mismatched.count() === 0, "every reported span must match verbatim")
    // maximal: the span cannot be extended by one token on either side
    val extendableLeft = joined.filter(col("start_a") > 0 && col("start_b") > 0 &&
      try_element_at(col("tok_a"), col("start_a").cast("int")) ===
        try_element_at(col("tok_b"), col("start_b").cast("int")))
    val extendableRight = joined.filter(
      try_element_at(col("tok_a"), (col("start_a") + col("span_tokens") + 1).cast("int")) ===
        try_element_at(col("tok_b"), (col("start_b") + col("span_tokens") + 1).cast("int")))
    assert(extendableLeft.count() === 0, "no span may extend left")
    assert(extendableRight.count() === 0, "no span may extend right")
  }
}
