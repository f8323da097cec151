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
  *  - **Coarse quantizer**: `nCentroids` deterministic centroids (the lowest
  *    vec_ids — a fixed "training sample"; a k-means refinement would slot in
  *    here without changing any downstream shape). Centroids are broadcast —
  *    they are tiny (`k × dims`) at any corpus size.
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
  * probe selection, and final top-k all reproduce bit-identically).
  */
object Ivf {

  /** Deterministic coarse centroids: the `nCentroids` lowest vec_ids. */
  def centroids(embeddings: DataFrame, nCentroids: Int): DataFrame =
    embeddings.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  /** Assign every vector to its max-cosine centroid (smallest id on ties).
    *
    * Shape: the K centroids collapse to a ONE-row array frame that
    * broadcast-joins onto the corpus, and the argmax is a per-row fold over
    * that array — a genuinely narrow map with NO shuffle of the corpus
    * (plan-asserted in PlanSpec). The K-way explode + re-group alternative
    * would push |corpus|×K rows through a hash shuffle — wrong at 100 TB.
    */
  def assign(embeddings: DataFrame, nCentroids: Int): DataFrame = {
    val centArr = centroids(embeddings, nCentroids)
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

  /** The query's `nProbe` nearest centroids. */
  def probes(embeddings: DataFrame, queryVecId: Long, nCentroids: Int, nProbe: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"))
    centroids(embeddings, nCentroids)
      .crossJoin(broadcast(q))
      .select(col("centroid_id"),
        Similarity.cosineNative(col("centroid"), col("q_embedding")).as("qcos"))
      .orderBy(col("qcos").desc, col("centroid_id"))
      .limit(nProbe)
      .select(col("centroid_id"))
  }

  /** IVF top-k: score only vectors assigned to the probed buckets. */
  def topK(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 2): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"))
    assign(embeddings, nCentroids)
      .join(broadcast(probes(embeddings, queryVecId, nCentroids, nProbe)), "centroid_id")
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("centroid_id"),
        Quantize.r(Similarity.cosineNative(col("embedding"), col("q_embedding")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
