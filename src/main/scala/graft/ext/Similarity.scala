package graft.ext

import graft.functions.Quantize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column => C}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) — generalizes
  * the reference's pgvector column + ivfflat cosine ANN index
  * (`sql/timescaledb_schema.sql:267-286`, `news_sentiment_embedding
  * vector(1536)`).
  *
  * Baseline: brute-force cosine top-k — a narrow scan-side map (zip_with +
  * aggregate fold, codegen'd, no UDF) followed by `TakeOrderedAndProject`
  * (per-partition top-k, merged on the driver: k rows per partition travel,
  * never the vectors). Scale path: sign-random-projection LSH buckets
  * (deterministic seeded hyperplanes) so candidate generation is an
  * equi-join on bucket key — the same never-all-pairs discipline as
  * [[Dedup.minhashCandidates]].
  */
object Similarity {

  /** Left-fold dot product in double precision (bit-stable across engines). */
  def dot(a: C, b: C): C =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: C, b: C): C =
    dot(a, b) / nullif(sqrt(dot(a, a)) * sqrt(dot(b, b)), lit(0.0))

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

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim). */
  private def planeSign(p: Int, i: C): C =
    when(pmod(xxhash64(lit(p.toLong), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** LSH bucket key from `planes` sign-random-projection bits. */
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

  /** LSH-bucketed near-duplicate pairs: same bucket → exact cosine verify. */
  def nearDupPairs(embeddings: DataFrame, planes: Int = 12, threshold: Double = 0.4): DataFrame = {
    val sig = embeddings.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), planes).as("bucket"))
    sig.as("a").join(sig.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Quantize.r(cosine(col("a.embedding"), col("b.embedding")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
