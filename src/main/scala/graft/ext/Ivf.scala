package graft.ext

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * for similarity search, modeling the reference's pgvector `ivfflat` cosine
  * index (`sql/timescaledb_schema.sql:283-286`: `lists = 100`, probed at
  * query time).
  *
  * Shape, and why it scales:
  *  - **Coarse quantizer**: `nCentroids` centroids — either the deterministic
  *    lowest-vec_id seeds (oracle-friendly, [[centroids]]) or a k-means
  *    refinement of those seeds ([[kmeansCentroids]], pgvector's ivfflat
  *    training analogue). Centroids are broadcast — they are tiny
  *    (`k × dims`) at any corpus size.
  *  - **Assignment**: each vector goes to its max-cosine centroid (ties to
  *    the smallest centroid id). This is a NARROW map over the corpus — a
  *    broadcast join plus a per-row argmax, no shuffle, no pairwise blowup.
  *    At rest you would write the corpus bucketed/partitioned by
  *    `centroid_id`, so probing prunes partitions at the scan.
  *  - **Probe**: the query embedding picks its `nProbe` nearest centroids;
  *    only vectors assigned to those buckets are scored — the scored set
  *    shrinks by ~`nProbe / nCentroids` while recall stays high for
  *    clustered data. `nProbe = nCentroids` degrades exactly to brute force
  *    (IvfSpec asserts bit-equality with [[Similarity.topK]]).
  *
  * Every stage is cosine-in-double with the same left-to-right fold as the
  * DuckDB oracle, so `q_ann_ivf` is hash-checked end to end (assignment,
  * probe selection, and final top-k all reproduce bit-identically). The
  * k-means path is deterministic too (fixed seeds, fixed iteration count, no
  * RNG); with `quantize = true` the per-iteration centroid means are rounded
  * to 1e-6, absorbing summation-order drift, so the trained pipeline is ALSO
  * bit-replayable cross-engine — `q_ann_ivf_kmeans` hash-checks against a
  * DuckDB replay of the same 3 Lloyd iterations.
  */
object Ivf {

  /** Deterministic coarse centroids: the `nCentroids` lowest vec_ids. */
  def centroids(embeddings: DataFrame, nCentroids: Int): DataFrame =
    embeddings.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").cast("array<double>").as("centroid"))

  /** Deterministic k-means (Lloyd) refinement of the seed centroids —
    * pgvector ivfflat's training step (`lists` k-means on a sample). No RNG:
    * init = the lowest-vec_id seeds, a FIXED number of iterations, ties on
    * assignment to the smallest centroid id. Determinism caveat: the
    * re-centering means are floating-point sums whose partial-aggregate
    * merge order follows the physical partitioning — bit-stable on a fixed
    * plan/partitioning (the tested setting), but last-ULP drift is possible
    * across differing cluster layouts; anything consuming centroids across
    * heterogeneous deployments should persist them rather than retrain.
    *
    * Scale shape per iteration: assignment is the same broadcast-centroids
    * narrow map as [[assign]]; the re-centering is one `(centroid_id, dim)`
    * hash aggregate over `sample × dims` rows (map-side combined). Like
    * pgvector, training runs on a bounded deterministic sample
    * (`vec_id % sampleMod == 0`) — the full corpus is never shuffled.
    * Centroids are `localCheckpoint`ed between iterations so the plan stays
    * O(1) deep. Empty clusters keep their previous centroid.
    */
  def kmeansCentroids(
      embeddings: DataFrame,
      nCentroids: Int,
      iters: Int = 3,
      sampleMod: Long = 1L,
      quantize: Boolean = false): DataFrame = {
    val train = trainSample(embeddings, sampleMod)
    var cents = centroids(embeddings, nCentroids).transform(graft.core.Staging.stageNow)
    for (_ <- 1 to iters) {
      cents = stepCentroids(train, cents, quantize).transform(graft.core.Staging.stageNow)
    }
    cents
  }

  private def trainSample(embeddings: DataFrame, sampleMod: Long): DataFrame =
    (if (sampleMod > 1) embeddings.filter(pmod(col("vec_id"), lit(sampleMod)) === 0)
     else embeddings)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  /** One Lloyd re-centering: raw per-(centroid, dim) sums and counts. */
  private def rawMeans(train: DataFrame, cents: DataFrame): DataFrame =
    assignTo(train, cents)
      .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("centroid_id", "pos")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))

  /** Advance the centroid set by one Lloyd iteration (shared verbatim by
    * [[kmeansCentroids]] and [[kmeansBoundaryMargin]] so the diagnostic
    * replays the exact training trajectory).
    */
  private def stepCentroids(train: DataFrame, cents: DataFrame,
      quantize: Boolean): DataFrame = {
    val means = rawMeans(train, cents)
      .groupBy("centroid_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          // quantize=true rounds each mean component to 1e-6 per
          // iteration: the quantum absorbs sub-ULP summation-order drift,
          // making the trained centroids (and everything downstream)
          // bit-reproducible across engines AND cluster layouts — the
          // cross-engine-oracle / heterogeneous-deployment mode.
          (if (quantize) Quantize.r(col("sx") / col("cnt"), 6)
           else col("sx") / col("cnt")).as("m")))),
        e => e.getField("m")).as("mean"))
    cents
      .join(means, Seq("centroid_id"), "left_outer")
      .select(col("centroid_id"),
        coalesce(col("mean"), col("centroid")).as("centroid"))
  }

  /** Fixture-fragility diagnostic for the quantized-Lloyd oracle: the
    * MINIMUM distance (in units of the 1e-6 quantum, range [0, 0.5]) of any
    * raw centroid-mean component from its `Quantize.r(·, 6)` rounding
    * boundary, across the full quantized training trajectory. The
    * cross-engine oracle is exact only while this margin exceeds the
    * float-summation error (~1e-10 quanta at fixture scale); a fixture
    * regeneration that lands a mean near a boundary would flip a rounded
    * bit and cascade through assignments — IvfSpec asserts a wide margin on
    * the shipped fixtures so that failure mode surfaces as a NAMED spec
    * failure, not an opaque downstream hash mismatch.
    */
  def kmeansBoundaryMargin(
      embeddings: DataFrame,
      nCentroids: Int,
      iters: Int = 3,
      sampleMod: Long = 1L): Double = {
    val train = trainSample(embeddings, sampleMod)
    var cents = centroids(embeddings, nCentroids).transform(graft.core.Staging.stageNow)
    var margin = 0.5
    for (_ <- 1 to iters) {
      val m = rawMeans(train, cents)
        .select((col("sx") / col("cnt")).as("mean"))
        // distance of mean*1e6 from the nearest x.5 boundary
        .select(abs(abs(col("mean") * 1e6 - floor(col("mean") * 1e6)) - 0.5)
          .as("d"))
        .agg(min(col("d"))).collect()(0).getDouble(0)
      margin = math.min(margin, m)
      cents = stepCentroids(train, cents, quantize = true).transform(graft.core.Staging.stageNow)
    }
    margin
  }

  /** Assign every vector to its max-cosine centroid (smallest id on ties).
    *
    * Shape: the K centroids collapse to a ONE-row array frame that
    * broadcast-joins onto the corpus, and the argmax is a per-row fold over
    * that array — a genuinely narrow map with NO shuffle of the corpus
    * (plan-asserted in PlanSpec). The K-way explode + re-group alternative
    * would push |corpus|×K rows through a hash shuffle — wrong at 100 TB.
    */
  def assignTo(embeddings: DataFrame, cents: DataFrame): DataFrame = {
    val centArr = cents
      .agg(sort_array(collect_list(struct(col("centroid_id"), col("centroid"))))
        .as("cents"))
    val best = aggregate(
      col("cents"),
      struct(lit(-1L).as("centroid_id"), lit(Double.NegativeInfinity).as("ccos")),
      (acc, c) => {
        val cos = Similarity.cosineNative(col("embedding"), c.getField("centroid"))
        // strict > keeps the first (lowest-id, array sorted) centroid on ties
        when(cos > acc.getField("ccos"),
          struct(c.getField("centroid_id").as("centroid_id"), cos.as("ccos")))
          .otherwise(acc)
      })
    embeddings.crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("embedding"), best.getField("centroid_id").as("centroid_id"))
  }

  def assign(embeddings: DataFrame, nCentroids: Int): DataFrame =
    assignTo(embeddings, centroids(embeddings, nCentroids))

  /** The query's `nProbe` nearest centroids. */
  def probesOf(embeddings: DataFrame, cents: DataFrame, queryVecId: Long,
      nProbe: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"))
    cents
      .crossJoin(broadcast(q))
      .select(col("centroid_id"),
        Similarity.cosineNative(col("centroid"), col("q_embedding")).as("qcos"))
      .orderBy(col("qcos").desc, col("centroid_id"))
      .limit(nProbe)
      .select(col("centroid_id"))
  }

  def probes(embeddings: DataFrame, queryVecId: Long, nCentroids: Int, nProbe: Int): DataFrame =
    probesOf(embeddings, centroids(embeddings, nCentroids), queryVecId, nProbe)

  /** IVF top-k over an explicit centroid set. */
  def topKWith(
      embeddings: DataFrame,
      cents: DataFrame,
      queryVecId: Long,
      k: Int,
      nProbe: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"))
    assignTo(embeddings, cents)
      .join(broadcast(probesOf(embeddings, cents, queryVecId, nProbe)), "centroid_id")
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("centroid_id"),
        Quantize.r(Similarity.cosineNative(col("embedding"), col("q_embedding")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF top-k: score only vectors assigned to the probed buckets. */
  def topK(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 2): DataFrame =
    topKWith(embeddings, centroids(embeddings, nCentroids), queryVecId, k, nProbe)
}
