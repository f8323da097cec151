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
    * Broadcast join + per-row argmax: narrow, shuffle-free up to the final
    * per-vector reduce (map-side combined on vec_id).
    */
  def assign(embeddings: DataFrame, nCentroids: Int): DataFrame = {
    val c = broadcast(centroids(embeddings, nCentroids))
    embeddings.crossJoin(c)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        Similarity.cosineNative(col("embedding"), col("centroid")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("centroid_id"), struct((-col("ccos")).as("nc"), col("centroid_id")))
          .as("centroid_id"),
        first(col("embedding")).as("embedding"))
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
