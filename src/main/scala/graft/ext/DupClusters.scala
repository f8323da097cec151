package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-CLUSTER resolution: the step after pair generation in a
  * dedup pipeline. Near-dup detectors (MinHash/SimHash/winnowing) emit
  * PAIRS; curation needs connected COMPONENTS of the pair graph so each
  * duplicate family collapses to one canonical document (reference
  * behavior lives in its dedup tier; clustering is how every production
  * corpus dedup actually applies it).
  *
  * Algorithm: min-label propagation to a fixpoint — each node repeatedly
  * takes the min label among itself and its neighbors. Deterministic
  * (min is order-insensitive), converges in O(component diameter)
  * rounds; near-dup clusters are dense and shallow (diameter 2-3 in
  * practice), so 3-4 shuffle rounds settle real corpora. Each round is
  * one equi-join (edges × labels) + one map-side-combined min — no
  * all-pairs, no driver-side graph. For adversarial chain-shaped graphs
  * at 100 TB, swap the body for alternating large-star/small-star
  * (O(log n) rounds, same join primitives); the API doesn't change.
  * Lineage is truncated per round (`localCheckpoint`) so Catalyst plans
  * stay O(1) deep instead of growing with iterations — at cluster scale
  * use reliable checkpointing, same call shape.
  */
object DupClusters {

  /** Resolve the undirected pair graph to components. Output: one row per
    * node — `doc_id`, `cluster_id` (= the component's min doc_id),
    * `cluster_size`, and `is_canonical` (the keeper under min-id
    * canonicalization). Nodes with no pairs are not emitted (they are
    * their own singleton clusters by definition).
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIter: Int = 50): DataFrame = {
    val dir = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val byDst = labels.select(col("id").as("dst"), col("lbl").as("dlbl"))
      val nmin = edges.join(byDst, Seq("dst"))
        .groupBy("src").agg(min(col("dlbl")).as("nmin"))
      val next = labels
        .join(nmin.select(col("src").as("id"), col("nmin")), Seq("id"), "left_outer")
        .select(col("id"), least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      changed = next.join(labels.select(col("id"), col("lbl").as("old")), Seq("id"))
        .filter(col("lbl") =!= col("old")).count()
      labels = next
      i += 1
    }
    edges.unpersist()
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("lbl"))
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_size"), (col("id") === col("lbl")).as("is_canonical"))
  }
}
