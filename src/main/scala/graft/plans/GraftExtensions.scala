package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extensions entry point: register the engine's native expressions
  * at session build time —
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the cluster-config
  * path: every session on the cluster gets the full SQL surface without
  * touching application code).
  *
  * Injects the complete native-expression layer — cosine similarity, the
  * text-hashing family (shingles, MinHash signatures/bands, Jaccard,
  * SimHash, winnowing, portable twins), and the SRP embedding buckets —
  * plus the tenant row-level-security optimizer rule. Per SURVEY §4 the
  * reference requires zero further optimizer rules (Catalyst's
  * pushdown/pruning/reorder cover it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.intLit

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, cls: Class[_], builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder))

    inject(CosineSimilarity.name, classOf[CosineSimilarity],
      exprs => CosineSimilarity(exprs.head, exprs(1)))

    // The text-hashing family (same names TextHashing.register binds at
    // runtime, so SQL written against either registration path is portable).
    import TextHashing._
    inject("graft_shingles", classOf[WordShingles],
      ex => WordShingles(ex.head, intLit(ex(1), "n")))
    inject("graft_minhash", classOf[MinHashSig],
      ex => MinHashSig(ex.head, intLit(ex(1), "numHashes")))
    inject("graft_minhash_bands", classOf[MinHashBands],
      ex => MinHashBands(ex.head, intLit(ex(1), "numHashes"), intLit(ex(2), "bands")))
    inject("graft_jaccard", classOf[JaccardSim], ex => JaccardSim(ex.head, ex(1)))
    inject("graft_simhash", classOf[SimHash64], ex => SimHash64(ex.head))
    inject("graft_winnow", classOf[WinnowFp],
      ex => WinnowFp(ex.head, intLit(ex(1), "k"), intLit(ex(2), "w")))
    inject("graft_minhash_bands_poly", classOf[MinHashBandsPoly],
      ex => MinHashBandsPoly(ex.head, intLit(ex(1), "numHashes"), intLit(ex(2), "bands")))
    inject("graft_simhash_poly", classOf[SimHashPoly], ex => SimHashPoly(ex.head))

    inject("graft_srp_bucket", classOf[SrpBucket],
      ex => SrpBucket(ex.head, intLit(ex(1), "planes")))
    inject("graft_srp_bucket_poly", classOf[SrpBucketPoly],
      ex => SrpBucketPoly(ex.head, intLit(ex(1), "planes")))

    ext.injectOptimizerRule(spark => new TenantFilterRule(spark))
  }
}

object GraftExtensions {
  private def intLit(ex: Expression, what: String): Int = ex match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
