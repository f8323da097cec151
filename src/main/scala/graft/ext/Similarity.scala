package graft.ext

import graft.functions.Quantize
import graft.plans.{CosineSimilarity, SrpBucket, SrpBucketPoly}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column => C}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Similarity search over an embedding column (`Array[Float]`) — generalizes
  * the reference's pgvector column + ivfflat cosine ANN index
  * (`sql/timescaledb_schema.sql:267-286`, `news_sentiment_embedding
  * vector(1536)`).
  *
  * Baseline: brute-force cosine top-k — a narrow scan-side map followed by
  * `TakeOrderedAndProject` (per-partition top-k, merged on the driver: k rows
  * per partition travel, never the vectors). Scale paths: sign-random-
  * projection LSH buckets (deterministic seeded hyperplanes) so candidate
  * generation is an equi-join on bucket key — the same never-all-pairs
  * discipline as [[Dedup.minhashCandidates]] — and the IVF coarse-quantizer
  * variant in [[Ivf]].
  */
object Similarity {

  /** Left-fold dot product in double precision (bit-stable across engines). */
  def dot(a: C, b: C): C =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity via the HOF fold — the executable spec form; value-
    * identical to [[cosineNative]] (shared DuckDB oracle proves it).
    */
  def cosine(a: C, b: C): C =
    dot(a, b) / nullif(sqrt(dot(a, a)) * sqrt(dot(b, b)), lit(0.0))

  /** Cosine similarity through the native codegen'd Catalyst expression —
    * the hot-path form (one fused primitive loop, no array allocation).
    */
  def cosineNative(a: C, b: C): C =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Brute-force cosine top-k of `embeddings(vec_id, embedding, ...)` against
    * the embedding of `queryVecId`.
    */
  def topK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"))
    embeddings
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        Quantize.r(cosine(col("embedding"), col("q_embedding")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** LSH bucket key from `planes` sign-random-projection bits (native). */
  def lshBucket(emb: C, planes: Int): C = SrpBucket(emb, planes)

  /** LSH-bucketed near-duplicate pairs: same bucket → exact cosine verify.
    * Bucket keys come from the native [[SrpBucket]] expression; the verify
    * cosine is the native fused loop. Values identical to the HOF forms.
    */
  def nearDupPairs(embeddings: DataFrame, planes: Int = 12, threshold: Double = 0.4): DataFrame = {
    val sig = embeddings.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), planes).as("bucket"))
    sig.as("a").join(sig.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Quantize.r(cosineNative(col("a.embedding"), col("b.embedding")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Portable twin of [[nearDupPairs]] over md5-parity hyperplane signs
    * ([[graft.plans.SrpBucketPoly]]) — same bucket-join-then-verify
    * topology, every hash and fold DuckDB-replayable, so the embedding
    * near-dup tier carries a full cross-engine oracle like the text tiers.
    */
  def portableNearDupPairs(
      embeddings: DataFrame, planes: Int = 8, threshold: Double = 0.3): DataFrame = {
    val sig = embeddings.select(col("vec_id"), col("embedding"),
      SrpBucketPoly(col("embedding"), planes).as("bucket"))
    sig.as("a").join(sig.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Quantize.r(cosineNative(col("a.embedding"), col("b.embedding")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The original higher-order-function forms — executable spec, equivalence-
    * tested against the native expressions in ExtSpec; not on hot paths.
    */
  object Hof {

    /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim). */
    private def planeSign(p: Int, i: C): C =
      when(pmod(xxhash64(lit(p.toLong), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

    def lshBucket(emb: C, planes: Int): C = {
      val e = emb.cast("array<double>")
      val bits = (0 until planes).map { p =>
        val proj = aggregate(
          zip_with(e, sequence(lit(0), size(e) - 1).cast("array<bigint>"),
            (x, i) => x * planeSign(p, i)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, 1L << p).otherwise(0L)
      }
      bits.reduce(_ + _)
    }
  }
}
