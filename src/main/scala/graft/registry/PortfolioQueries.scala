package graft.registry

import graft.functions.Quantize
import graft.core.Tables
import graft.features.Ohlc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portfolio / cross-sectional tier of the feature registry (split from
  * FeatureQueries by tier — pure code motion): the six queries that fold
  * over the shared memoized bucket-returns frame, with their DuckDB
  * oracles. See each entry's comment for the scaled-integer exact-moment
  * discipline they share.
  */
object PortfolioQueries {
  import OracleSql.withTradesAnd
  import FeatureQueries.trades

  type Q = (SparkSession, String) => DataFrame

  /** 5-minute close-to-close returns per symbol, quantized at the source so
    * downstream correlation/covariance folds see identical doubles in both
    * engines. Null first-bucket returns are dropped.
    *
    * MEMOIZED + persisted per (session, dir): seven portfolio/microstructure
    * queries fold over this same frame, and re-deriving it (full fact scan →
    * 5-min OHLC agg → per-symbol lag window) per query dominated their bench
    * time. The frame is O(symbols × buckets) — an aggregate, not the corpus
    * — so pinning it is the continuous-aggregate pattern, exactly what a
    * 100 TB deployment would materialize once and share.
    */
  private val retsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def bucketReturns(s: SparkSession, d: String): DataFrame = {
    retsCache.keySet.forEach { k =>
      if (k._1.sparkContext.isStopped) retsCache.remove(k)
    }
    retsCache.computeIfAbsent((s, d), _ => {
      val bars = Ohlc.compute(trades(s, d), "5 minutes")
        .select(col("bucket"), col("symbol"), col("close"))
      val w = Window.partitionBy("symbol").orderBy("bucket")
      bars.select(col("bucket"), col("symbol"),
          Quantize.r(col("close") / nullif(lag(col("close"), 1).over(w), lit(0.0)) - lit(1.0), 6).as("ret"))
        .filter(col("ret").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  private val bucketReturnsSql =
    """rets AS (
      |  SELECT bucket, symbol,
      |         floor((close / nullif(lag(close) OVER (PARTITION BY symbol ORDER BY bucket), CAST(0 AS DOUBLE))
      |                - CAST(1 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ret
      |  FROM (SELECT time_bucket(INTERVAL '5 minutes', time) AS bucket, symbol,
      |               arg_max(price, time) AS close
      |        FROM trades GROUP BY 1, 2))""".stripMargin

  val queries: Map[String, Q] = Map(
    // Cross-symbol return correlation matrix: bucketed close returns,
    // self-joined per bucket (sym_a < sym_b). O(K² · buckets) where K is
    // the symbol UNIVERSE (a bounded dimension, thousands at most) — never
    // corpus-scale. A correlation is a cancellation-sensitive ratio of
    // covariance sums, and corr()/covar float aggregates are accumulation-
    // order-dependent — so the moment sums run over the 1e6-scaled BIGINT
    // image of the quantized returns: integer sums are order-independent
    // and EXACT (DECIMAL(38,0) accumulation), the join output aggregates
    // with map-side combine into K² rows (no per-pair arrays — the
    // round-5 collect_list shape was 12× slower and grew linearly with the
    // time range), and the 1e6 scaling cancels in the correlation ratio.
    // r = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)).
    "q_pair_corr" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val d19 = "decimal(19,0)"
      val rets = bucketReturns(s, d)
        .select(col("bucket"), col("symbol"), Quantize.i(col("ret")).as("ri"))
      val mom = rets.as("a").join(rets.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.symbol") < col("b.symbol"))
        .select(col("a.symbol").as("sym_a"), col("b.symbol").as("sym_b"),
          col("a.ri").as("ra"), col("b.ri").as("rb"))
        .groupBy("sym_a", "sym_b")
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(col("ra").cast(dec)).as("sxd"),
          sum(col("rb").cast(dec)).as("syd"),
          // products as DECIMAL(19,0)×DECIMAL(19,0): 64-bit multiply can
          // overflow on outlier returns (ri ~1e9 ⇒ ri² ~1e18+)
          sum(col("ra").cast(d19) * col("rb").cast(d19)).as("sxyd"),
          sum(col("ra").cast(d19) * col("ra").cast(d19)).as("sx2d"),
          sum(col("rb").cast(d19) * col("rb").cast(d19)).as("sy2d"))
      val n = col("n_buckets").cast("double")
      def dbl(c: String) = col(c).cast("double")
      mom.select(col("sym_a"), col("sym_b"),
        // FP cancellation can leave a variance term at -1e-20: clamp to 0
        // (NaN-from-sqrt semantics differ between engines), null via nullif
        Quantize.r(
          (n * dbl("sxyd") - dbl("sxd") * dbl("syd")) /
            nullif(sqrt(greatest(n * dbl("sx2d") - dbl("sxd") * dbl("sxd"), lit(0.0))) *
              sqrt(greatest(n * dbl("sy2d") - dbl("syd") * dbl("syd"), lit(0.0))), lit(0.0)),
          6).as("ret_corr"),
        col("n_buckets"))
    }),

    // Market beta per symbol: covar(r_i, r_mkt) / var(r_mkt) against the
    // equal-weight market return. covar_samp/var_samp/avg float aggregates
    // are accumulation-order-dependent (at sf0.1 two symbols flipped
    // across the 1e-6 quantum against the oracle), so everything runs on
    // 1e6-scaled BIGINT return images: the market return is itself an
    // integer (floor(Σri/K + 0.5) — the quantized equal-weight mean), the
    // four moment sums are exact DECIMAL(38,0) integer sums, and the 1e6
    // scaling cancels in beta = (n·Σxy − Σx·Σy) / (n·Σy² − (Σy)²). No
    // per-group arrays — two hash aggregations and a join, map-side
    // combined, O(1) group state at any scale.
    "q_beta" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val rets = bucketReturns(s, d)
        .select(col("bucket"), col("symbol"), Quantize.i(col("ret")).as("ri"))
      val mkt = rets.groupBy("bucket")
        .agg(sum(col("ri").cast(dec)).as("smd"), count(lit(1)).as("k"))
        .select(col("bucket"),
          floor(col("smd").cast("double") / col("k").cast("double") + lit(0.5))
            .cast("long").as("mi"))
      val d19 = "decimal(19,0)"
      val mom = rets.join(mkt, Seq("bucket"))
        .groupBy("symbol")
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(col("ri").cast(dec)).as("sxd"),
          sum(col("mi").cast(dec)).as("syd"),
          sum(col("ri").cast(d19) * col("mi").cast(d19)).as("sxyd"),
          sum(col("mi").cast(d19) * col("mi").cast(d19)).as("sy2d"))
      val n = col("n_buckets").cast("double")
      def dbl(c: String) = col(c).cast("double")
      mom.select(col("symbol"),
        Quantize.r(
          (n * dbl("sxyd") - dbl("sxd") * dbl("syd")) /
            nullif(n * dbl("sy2d") - dbl("syd") * dbl("syd"), lit(0.0)), 6).as("beta"),
        col("n_buckets"))
    }),

    // Lag-1 return autocorrelation per symbol (momentum/mean-reversion
    // signal) — same scaled-integer exact-moment discipline as q_beta:
    // each return pairs with its bucket-order predecessor via lag(), the
    // five moment sums run over 1e6-scaled BIGINT images (exact, order-
    // independent, O(1) group state), and the scaling cancels in the
    // correlation ratio. First-bucket rows carry a null predecessor and
    // join no pair, so single-return symbols still emit (n_pairs = 0).
    "q_autocorr" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val d19 = "decimal(19,0)"
      val w = Window.partitionBy("symbol").orderBy("bucket")
      val mom = bucketReturns(s, d)
        .select(col("bucket"), col("symbol"), Quantize.i(col("ret")).as("x"))
        .select(col("symbol"), col("x"), lag(col("x"), 1).over(w).as("y"))
        .groupBy("symbol")
        .agg(
          count(col("y")).as("n_pairs"),
          sum(when(col("y").isNotNull, col("x")).cast(dec)).as("sxd"),
          sum(col("y").cast(dec)).as("syd"),
          sum(col("x").cast(d19) * col("y").cast(d19)).as("sxyd"),
          sum(when(col("y").isNotNull,
            col("x").cast(d19) * col("x").cast(d19))).as("sx2d"),
          sum(col("y").cast(d19) * col("y").cast(d19)).as("sy2d"))
      val m = col("n_pairs").cast("double")
      def dbl(c: String) = col(c).cast("double")
      val denom = (m * dbl("sx2d") - dbl("sxd") * dbl("sxd")) *
        (m * dbl("sy2d") - dbl("syd") * dbl("syd"))
      mom.select(col("symbol"),
        Quantize.r(
          when(denom > 0, (m * dbl("sxyd") - dbl("sxd") * dbl("syd")) / sqrt(denom)),
          6).as("autocorr_1"),
        col("n_pairs"))
    }),

    // Return-distribution shape per symbol: skewness + excess kurtosis
    // (fat-tail screening — the risk desk's normality check on every
    // symbol's return stream). Same scaled-integer discipline pushed to
    // 3rd/4th powers: returns are winsorized at ±1000% (the standard
    // moment-stability clamp; a 6000× print from a near-zero close is a
    // data artifact, and it also bounds x⁴ ≤ 1e28 so Σx⁴ accumulates
    // exactly in DECIMAL(38,0)/INT128 at any corpus size), both
    // statistics are scale-invariant ratios so the 1e6 cancels, and
    // m2^1.5 is spelled den·√den (sqrt is correctly-rounded IEEE
    // everywhere; pow(x, 1.5) is not). One map-side-combined shuffle.
    "q_higher_moments" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val d19 = "decimal(19,0)"
      val x = col("x").cast(d19)
      val mom = bucketReturns(s, d)
        .select(col("symbol"),
          least(greatest(Quantize.i(col("ret")), lit(-10000000L)),
            lit(10000000L)).as("x"))
        .groupBy("symbol")
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(col("x").cast(dec)).as("s1"),
          sum(x * x).as("s2"),
          sum(x * x * x).as("s3"),
          sum(x * x * x * x).as("s4"))
      val n = col("n_buckets").cast("double")
      def dbl(c: String) = col(c).cast("double")
      val den2 = n * dbl("s2") - dbl("s1") * dbl("s1")
      mom.select(col("symbol"), col("n_buckets"),
        Quantize.r(when(den2 > 0,
          (n * n * dbl("s3") - lit(3.0) * n * dbl("s1") * dbl("s2") +
            lit(2.0) * dbl("s1") * dbl("s1") * dbl("s1")) /
            (den2 * sqrt(den2))), 6).as("skewness"),
        Quantize.r(when(den2 > 0,
          (n * n * n * dbl("s4") - lit(4.0) * n * n * dbl("s1") * dbl("s3") +
            lit(6.0) * n * dbl("s1") * dbl("s1") * dbl("s2") -
            lit(3.0) * dbl("s1") * dbl("s1") * dbl("s1") * dbl("s1")) /
            (den2 * den2) - lit(3.0)), 6).as("ex_kurtosis"))
    }),

    // Cross-sectional momentum: per 5-min bucket, every symbol's return
    // ranked against the whole universe — the factor-pipeline cross-section
    // step (rank/quintile assignment before long-short bucketing). Total
    // order via (ret DESC, symbol) so ranks and quintiles are
    // deterministic; ONE shuffle on bucket — the cross-section is the
    // partition, so universe size (thousands) bounds a partition, never
    // corpus size.
    "q_cs_momentum" -> ((s, d) => {
      val w = Window.partitionBy("bucket")
        .orderBy(col("ret").desc, col("symbol"))
      val n = Window.partitionBy("bucket")
      bucketReturns(s, d)
        .select(col("bucket"), col("symbol"), col("ret"),
          row_number().over(w).cast("long").as("cs_rank"),
          count(lit(1)).over(n).as("n_symbols"),
          ntile(5).over(w).cast("long").as("quintile"))
    }),

    // Jump-robust realized volatility: per symbol-day, realized variance
    // Σr² vs bipower variation (π/2)·Σ|r_t||r_t−1| (Barndorff-Nielsen &
    // Shephard) — BV is immune to a single jump, so rv − bpv isolates the
    // jump component. Integer discipline: |returns| winsorized at ±100%
    // (a 2× move inside 5 minutes is a data artifact, and the 1e6 cap
    // keeps every whole-day Σ|r|² below 2^53 — ABOVE that range Spark's
    // DECIMAL→double and DuckDB's HUGEINT→double round differently in the
    // last ulp, the one cross-engine flip the sf0.1 sweep caught), so
    // both sums accumulate exactly and convert exactly; the only float
    // steps are the final 1e-12 descale and the π/2 factor.
    "q_bipower" -> ((s, d) => {
      val w = Window.partitionBy("symbol", "day").orderBy("bucket")
      val r = bucketReturns(s, d)
        .select(col("symbol"), to_date(col("bucket")).as("day"),
          col("bucket"),
          least(abs(Quantize.i(col("ret"))), lit(1000000L)).as("ax"))
        .withColumn("axp", lag(col("ax"), 1).over(w))
      r.groupBy("symbol", "day")
        .agg(count(lit(1)).as("n_rets"),
          sum(col("ax").cast("decimal(19,0)") * col("ax").cast("decimal(19,0)"))
            .as("sx2"),
          sum(col("ax").cast("decimal(19,0)") * col("axp").cast("decimal(19,0)"))
            .as("sxy"))
        .select(col("symbol"), col("day"), col("n_rets"),
          (col("sx2").cast("double") / lit(1e12)).as("rv"),
          // a single-return day has no adjacent pair: BV contributes 0
          (lit(math.Pi / 2) * coalesce(col("sxy").cast("double"), lit(0.0)) /
            lit(1e12)).as("bpv"))
        .withColumn("jump_var", greatest(lit(0.0), col("rv") - col("bpv")))
    }),
  )

  val oracles: Map[String, String] = Map(
    // Cross-section over the shared return CTE; the (ret DESC, symbol)
    // total order makes row_number and ntile engine-exact.
    "q_cs_momentum" -> withTradesAnd(bucketReturnsSql,
      """SELECT bucket, symbol, ret,
        |       CAST(row_number() OVER w AS BIGINT) AS cs_rank,
        |       count(*) OVER (PARTITION BY bucket) AS n_symbols,
        |       CAST(ntile(5) OVER w AS BIGINT) AS quintile
        |FROM rets WHERE ret IS NOT NULL
        |WINDOW w AS (PARTITION BY bucket ORDER BY ret DESC, symbol)""".stripMargin),

    // Mirrors the ordered-fold pair correlation: moment sums in bucket
    // order, variance terms clamped at 0 before sqrt.
    // Mirrors q_autocorr: per-symbol bucket-ordered return list, lagged
    // pairs [r_i, r_{i-1}], moment sums folded left-to-right in the same
    // order Spark's aggregate() folds the pair array.
    "q_autocorr" -> withTradesAnd(bucketReturnsSql +
      """,
        |ri AS (
        |  SELECT symbol, CAST(floor(ret * 1e6 + 0.5) AS BIGINT) AS x,
        |         lag(CAST(floor(ret * 1e6 + 0.5) AS BIGINT))
        |           OVER (PARTITION BY symbol ORDER BY bucket) AS y
        |  FROM rets WHERE ret IS NOT NULL),
        |amom AS (
        |  SELECT symbol, count(y) AS n_pairs, CAST(count(y) AS DOUBLE) AS m,
        |    CAST(sum(CASE WHEN y IS NOT NULL THEN x END) AS DOUBLE) AS sx,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |    CAST(sum(CASE WHEN y IS NOT NULL THEN CAST(x AS HUGEINT) * x END) AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS sy2
        |  FROM ri GROUP BY symbol)""".stripMargin,
      """SELECT symbol,
        |       CASE WHEN (m * sx2 - sx * sx) * (m * sy2 - sy * sy) > 0
        |            THEN floor(((m * sxy - sx * sy) /
        |                   sqrt((m * sx2 - sx * sx) * (m * sy2 - sy * sy))) * 1e6 + 0.5) / 1e6
        |       END AS autocorr_1,
        |       n_pairs
        |FROM amom""".stripMargin),

    // Mirrors the bipower fold: HUGEINT |r| products, π/2 and the 1e-12
    // descale as the only float steps, pair sum coalesced to 0 on
    // single-return days.
    "q_bipower" -> withTradesAnd(bucketReturnsSql +
      """,
        |r0 AS (SELECT symbol, CAST(bucket AS DATE) AS day, bucket,
        |         least(abs(CAST(floor(ret * 1e6 + 0.5) AS BIGINT)), 1000000) AS ax
        |       FROM rets WHERE ret IS NOT NULL),
        |r1 AS (SELECT *, lag(ax) OVER (PARTITION BY symbol, day ORDER BY bucket) AS axp
        |       FROM r0),
        |bp AS (
        |  SELECT symbol, day, count(*) AS n_rets,
        |    CAST(sum(CAST(ax AS HUGEINT) * ax) AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(ax AS HUGEINT) * axp) AS DOUBLE) AS sxy
        |  FROM r1 GROUP BY 1, 2)""".stripMargin,
      """SELECT symbol, day, n_rets,
        |       sx2 / 1e12 AS rv,
        |       pi() / 2 * coalesce(sxy, CAST(0 AS DOUBLE)) / 1e12 AS bpv,
        |       greatest(0.0,
        |         sx2 / 1e12 - pi() / 2 * coalesce(sxy, CAST(0 AS DOUBLE)) / 1e12)
        |         AS jump_var
        |FROM bp""".stripMargin),

    // Mirrors the scaled-integer higher moments: HUGEINT power sums, the
    // identical double expression tree (den·√den, not pow), CASE-guarded.
    "q_higher_moments" -> withTradesAnd(bucketReturnsSql +
      """,
        |r0 AS (SELECT symbol,
        |         least(greatest(CAST(floor(ret * 1e6 + 0.5) AS BIGINT),
        |                        -10000000), 10000000) AS x
        |       FROM rets WHERE ret IS NOT NULL),
        |hmom AS (
        |  SELECT symbol, count(*) AS n_buckets, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(x AS HUGEINT) * x * x) AS DOUBLE) AS s3,
        |    CAST(sum(CAST(x AS HUGEINT) * x * x * x) AS DOUBLE) AS s4
        |  FROM r0 GROUP BY symbol),
        |hden AS (SELECT *, n * s2 - s1 * s1 AS den2 FROM hmom)""".stripMargin,
      """SELECT symbol, n_buckets,
        |       floor((CASE WHEN den2 > 0 THEN
        |           (n * n * s3 - 3.0 * n * s1 * s2 + 2.0 * s1 * s1 * s1) /
        |             (den2 * sqrt(den2)) END) * 1e6 + 0.5) / 1e6 AS skewness,
        |       floor((CASE WHEN den2 > 0 THEN
        |           (n * n * n * s4 - 4.0 * n * n * s1 * s3 +
        |              6.0 * n * s1 * s1 * s2 - 3.0 * s1 * s1 * s1 * s1) /
        |             (den2 * den2) - 3.0 END) * 1e6 + 0.5) / 1e6 AS ex_kurtosis
        |FROM hden""".stripMargin),

    "q_pair_corr" -> withTradesAnd(bucketReturnsSql +
      """,
        |r0 AS (SELECT bucket, symbol, CAST(floor(ret * 1e6 + 0.5) AS BIGINT) AS ri
        |       FROM rets WHERE ret IS NOT NULL),
        |pmom AS (
        |  SELECT a.symbol AS sym_a, b.symbol AS sym_b,
        |    count(*) AS nb, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(a.ri) AS DOUBLE) AS sx,
        |    CAST(sum(b.ri) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(a.ri AS HUGEINT) * b.ri) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(a.ri AS HUGEINT) * a.ri) AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(b.ri AS HUGEINT) * b.ri) AS DOUBLE) AS sy2
        |  FROM r0 a JOIN r0 b
        |    ON a.bucket = b.bucket AND a.symbol < b.symbol
        |  GROUP BY 1, 2)""".stripMargin,
      """SELECT sym_a, sym_b,
        |       floor(((n * sxy - sx * sy) /
        |              nullif(sqrt(greatest(n * sx2 - sx * sx, CAST(0 AS DOUBLE))) *
        |                     sqrt(greatest(n * sy2 - sy * sy, CAST(0 AS DOUBLE))), CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS ret_corr,
        |       nb AS n_buckets
        |FROM pmom""".stripMargin),

    // Mirrors the scaled-integer beta: integer market mean per bucket,
    // exact integer moment sums, scaling cancels in the ratio.
    "q_beta" -> withTradesAnd(bucketReturnsSql +
      """,
        |r0 AS (SELECT bucket, symbol, CAST(floor(ret * 1e6 + 0.5) AS BIGINT) AS ri
        |       FROM rets WHERE ret IS NOT NULL),
        |mkt AS (
        |  SELECT bucket,
        |         CAST(floor(CAST(sum(ri) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS mi
        |  FROM r0 GROUP BY bucket),
        |mom AS (
        |  SELECT r.symbol, count(*) AS nb, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(r.ri) AS DOUBLE) AS sx,
        |    CAST(sum(m.mi) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(r.ri AS HUGEINT) * m.mi) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(m.mi AS HUGEINT) * m.mi) AS DOUBLE) AS sy2
        |  FROM r0 r JOIN mkt m ON r.bucket = m.bucket
        |  GROUP BY r.symbol)""".stripMargin,
      """SELECT symbol,
        |       floor(((n * sxy - sx * sy) / nullif(n * sy2 - sy * sy, CAST(0 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS beta,
        |       nb AS n_buckets
        |FROM mom""".stripMargin),
  )
}
