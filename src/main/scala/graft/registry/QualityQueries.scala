package graft.registry

import graft.core.Tables
import graft.features.Ohlc
import graft.operators.Rls
import graft.quality.{DqScore, Expectations, KsTest, PipelineHealth, Profiler, Psi}
import graft.sources.Ingest
import graft.functions.Quantize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality, validation, RLS and ingest-contract queries, mirroring the
  * reference's quality framework (the `src/quality` modules) and security
  * layer.
  */
object QualityQueries {
  import OracleSql.{withTrades, withTradesAnd}

  type Q = (SparkSession, String) => DataFrame

  private def trades(s: SparkSession, d: String): DataFrame = Tables.trades(s, d)

  val queries: Map[String, Q] = Map(
    "q_dq_score" -> ((s, d) => {
      val t = trades(s, d)
      DqScore.compute(Ohlc.compute(t), t.agg(max(col("time")).as("mx")))
    }),

    "q_ks_test" -> ((s, d) =>
      KsTest.dStatistic(Tables.events(s, d), "value", "event_type", "view", "click")),

    // Component-health rollup: one record per component metric + the
    // worst-status overall record (health_dashboard.py:37-61,415-427).
    "q_pipeline_health" -> ((s, d) =>
      PipelineHealth.compute(trades(s, d), Tables.events(s, d))),

    // Binned drift magnitude alongside the KS shift decision.
    "q_psi" -> ((s, d) =>
      Psi.psi(Tables.events(s, d), "value", "event_type", "view", "click")),

    // One-pass schema profile of the trades surface (nulls, cardinality,
    // ranges) — the landing summary expectations are seeded from.
    "q_profile" -> ((s, d) =>
      Profiler.profile(trades(s, d), Seq(
        "symbol" -> false, "side" -> false, "trade_id" -> false,
        "price" -> true, "volume" -> true, "bid" -> true, "ask" -> true))),

    // The scale form of the profiler: HLL distinct counts, no Expand (the
    // exact q_profile multiplies its input x7 through Catalyst Expand —
    // the documented exact-vs-sketch trade). Rows-gated (no DuckDB oracle:
    // HLL estimates aren't cross-engine exact); ProfilerSpec bounds the
    // estimate error against the exact profile and PlanSpec asserts the
    // Expand is gone.
    "q_profile_approx" -> ((s, d) =>
      Profiler.profileApprox(trades(s, d), Seq(
        "symbol" -> false, "side" -> false, "trade_id" -> false,
        "price" -> true, "volume" -> true, "bid" -> true, "ask" -> true))),

    // Prometheus alert-rule evaluation as a query (monitoring/
    // prometheus-alerts.yml:8-46 shapes): p95-latency and consumer-lag
    // metrics on a 30-min evaluation grid, `for:` hold duration via
    // integer gaps-and-islands — one row per firing alert.
    "q_alert_rules" -> ((s, d) => {
      import graft.quality.AlertRules
      AlertRules.evaluate(
        AlertRules.eventMetrics(trades(s, d), intervalSec = 1800),
        Seq(
          AlertRules.Rule("FlinkHighLatency", "p95_latency", 250.0, 1),
          AlertRules.Rule("KafkaHighConsumerLag", "ingest_rate_ratio", 1.5, 2)),
        intervalSec = 1800)
    }),

    // Shadow/canary evaluation (triton_canary.py rules): two signal models
    // over the same ticks, integer-exact PnL simulation via secondary-sort
    // mapPartitions (O(1) state per symbol), promote/reject per the
    // |dPnL| > 10% / p95 > 1.2x rollback thresholds.
    "q_canary_eval" -> ((s, d) => graft.serving.Canary.evaluate(trades(s, d))),

    // Cross-source reconciliation: primary feed vs a derived backup feed
    // (every 13th record missing, every 17th price-drifted by +0.01, every
    // 23rd duplicated under a foreign key) — full-outer key join, row
    // classification, per-symbol report. The desk's two-vendor diff query.
    "q_feed_reconcile" -> ((s, d) => {
      val a = trades(s, d)
      val tid = col("trade_id").cast("bigint")
      val b = a.filter(tid % 13 =!= 0)
        .withColumn("price",
          when(tid % 17 === 0, col("price") + 0.01).otherwise(col("price")))
        .unionByName(a.filter(tid % 23 === 0)
          .withColumn("trade_id", concat(lit("b"), col("trade_id"))))
      graft.quality.Reconcile.report(a, b, Seq("trade_id"), "symbol",
        Seq("price", "volume", "side"))
    }),

    // Cost-budget monitoring (cost_budget.py): corpus metered into cost
    // lines at exact binary-fraction rates, rolled up against the monthly
    // budget with per-component enforcement actions.
    "q_cost_budget" -> ((s, d) =>
      graft.operators.CostBudget.evaluate(
        graft.operators.CostBudget.meterCorpus(
          Tables.events(s, d), Tables.documents(s, d)),
        monthlyBudget = 3000.0)),

    // Reproducibility fingerprints (train_reproducible.py data/schema
    // hashes): order-independent 60-bit md5 content hash per dataset plus
    // the schema-contract hash — a drifted schema or a single changed row
    // flips the record and the gate.
    "q_repro_fingerprint" -> ((s, d) => {
      import graft.quality.Lineage
      val t = trades(s, d)
      val nul = lit("~null~")
      val tKey = concat_ws("|",
        col("symbol"), col("trade_id"), coalesce(col("side"), nul),
        unix_micros(col("time")).cast("string"),
        Quantize.i(col("price")).cast("string"),
        Quantize.i(col("volume")).cast("string"),
        coalesce(Quantize.i(col("bid")).cast("string"), nul),
        coalesce(Quantize.i(col("ask")).cast("string"), nul))
      val docs = Tables.documents(s, d)
      val dKey = concat_ws("|",
        col("doc_id").cast("string"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("string"))
      Lineage.datasetFingerprint(t, "trades", tKey)
        .unionByName(Lineage.datasetFingerprint(docs, "documents", dKey))
    }),

    // Observed metrics under the correctness gate: the DQ bundle rides the
    // noop write via Dataset.observe (no second scan), is captured by the
    // listener, and must equal DuckDB's direct aggregation of the table.
    "q_observe_dq" -> ((s, d) => {
      val listener = graft.quality.Observability.register(s)
      try {
        graft.quality.Observability.observeTrades(trades(s, d), "dq_gate")
          .write.format("noop").mode("overwrite").save()
        val deadline = System.nanoTime() + 30000000000L
        var m: Option[org.apache.spark.sql.Row] = None
        while (m.isEmpty && System.nanoTime() < deadline) {
          m = listener.get("dq_gate")
          if (m.isEmpty) Thread.sleep(20)
        }
        val row = m.getOrElse(sys.error("observed metrics never arrived"))
        import s.implicits._
        Seq((row.getAs[Long]("n_rows"), row.getAs[Long]("null_side"),
          row.getAs[Long]("min_time_micros"), row.getAs[Long]("max_time_micros"),
          row.getAs[Double]("sum_volume")))
          .toDF("n_rows", "null_side", "min_time_micros", "max_time_micros",
            "sum_volume")
      } finally s.listenerManager.unregister(listener)
    }),

    "q_zscore_outliers" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val stats = li.groupBy("l_returnflag")
        .agg(avg(col("l_extendedprice")).as("mu"),
          stddev_samp(col("l_extendedprice")).as("sigma"))
      li.join(broadcast(stats), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
          count(when(abs((col("l_extendedprice") - col("mu")) / nullif(col("sigma"), lit(0.0))) > 3, 1))
            .as("n_outliers"),
          count(lit(1)).as("n"))
    }),

    // Chi-squared categorical drift: the PSI/KS sibling for CATEGORICAL
    // columns — has the side distribution shifted between the first and
    // second half of the time range? Cell counts are integers, expected
    // counts one division each, and the statistic folds over the cells in
    // (period, side) order — deterministic cross-engine. Severity tiers on
    // the QUANTIZED statistic at the dof=1 critical values (3.841/6.635),
    // the same tier-flip-safe discipline as KS/PSI.
    "q_chi2_drift" -> ((s, d) =>
      graft.quality.Chi2Drift.compute(trades(s, d), "time", "side")),

    // Robust (MAD-based) outliers — the z-score's median sibling, immune
    // to the outliers inflating their own threshold. Median and MAD are
    // NEAREST-RANK picks (rank ceil(n/2) over (value, trade_id) order —
    // the q_var_cvar discipline): actual observations both engines select
    // identically, so the d > 3·1.4826·MAD cut compares bit-identical
    // doubles. Two rank passes + one broadcast of the 1-row-per-symbol
    // stats; the fact table shuffles once per rank pass.
    "q_mad_outliers" -> ((s, d) => {
      val t = trades(s, d)
      def rankPick(df: DataFrame, valueCol: String): DataFrame = {
        val rw = Window.partitionBy("symbol").orderBy(col(valueCol), col("trade_id"))
        val nw = Window.partitionBy("symbol")
        df.select(col("symbol"), col(valueCol),
            row_number().over(rw).as("rn"),
            ceil(count(lit(1)).over(nw).cast("double") / 2).as("k"))
          .filter(col("rn") === col("k"))
          .select(col("symbol"), col(valueCol))
      }
      // med and devs are each consumed twice (the MAD rank pass and the
      // final rollup) — staged once so the rank-window passes run once
      // apiece instead of being re-planned per consumer (r17 plan audit:
      // 5 fact scans unstaged, 2 staged)
      val med = rankPick(t.select(col("symbol"), col("trade_id"), col("price")), "price")
        .withColumnRenamed("price", "med").transform(graft.core.Staging.stage)
      val devs = t.join(broadcast(med), Seq("symbol"))
        .select(col("symbol"), col("trade_id"), abs(col("price") - col("med")).as("dev"))
        .transform(graft.core.Staging.stage)
      val mad = rankPick(devs, "dev").withColumnRenamed("dev", "mad")
      devs.join(broadcast(med), Seq("symbol")).join(broadcast(mad), Seq("symbol"))
        .groupBy("symbol")
        .agg(
          Quantize.r(max(col("med")), 6).as("med"),
          Quantize.r(max(col("mad")), 6).as("mad"),
          count(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1))
            .as("n_outliers"),
          count(lit(1)).as("n"))
    }),

    "q_expectations" -> ((s, d) => {
      import Expectations._
      evaluate(trades(s, d), Seq(
        NotNull("price"), Positive("price"), Positive("volume"),
        InSet("side", Seq("buy", "sell")), PairGte("ask", "bid"),
        Between("volume", 1, 100),
        Unique(Seq("time", "symbol", "trade_id")),
        Increasing("price", "time", Seq("symbol"))))
    }),

    // The reference's full market-data contract report + overall verdict
    // (`data_contracts.py:64-96,127-175`): schema types, ranges, 100%
    // completeness, trade_id uniqueness, side set membership.
    "q_data_contract" -> ((s, d) => {
      import Expectations._
      withVerdict(evaluate(trades(s, d), marketDataContract), marketDataContract)
    }),

    // Field-level encryption roundtrip (`rls_encryption_audit.py:122-160`
    // EncryptionManager): AES-encrypt the symbol per row, decrypt, and
    // aggregate — framing must be value-transparent, like the Avro twin.
    // The IV is random per row (GCM), so only the ROUNDTRIP is
    // deterministic — which is exactly what the oracle checks.
    "q_field_encrypt" -> ((s, d) =>
      trades(s, d)
        .withColumn("enc", expr(
          "aes_encrypt(cast(symbol as binary), '0123456789abcdef')"))
        .withColumn("dec", expr(
          "cast(aes_decrypt(enc, '0123456789abcdef') as string)"))
        .groupBy(col("dec").as("symbol"))
        .agg(count(lit(1)).as("n"), sum(col("volume")).as("sum_volume"))),

    "q_increasing_check" -> ((s, d) =>
      Expectations.increasingViolations(trades(s, d), "price", "time", Seq("symbol"))),

    "q_ingest_dlq" -> ((s, d) => {
      val rules = Ingest.tradeRules
      val aggs = rules.map { case (n, c) => count(when(c, 1)).as(n) } ++ Seq(
        count(when(Ingest.anyViolation(rules), 1)).as("n_dlq"),
        count(when(!Ingest.anyViolation(rules), 1)).as("n_clean"))
      trades(s, d).agg(aggs.head, aggs.tail: _*)
    }),

    // Storage-lifecycle tier census (S3 lifecycle analogue,
    // `s3_lifecycle.py:11-78`): every day of data classified
    // hot/warm/cold/expired by age against the newest event.
    "q_storage_tiers" -> ((s, d) =>
      graft.operators.Lifecycle.tierReport(trades(s, d))),

    "q_rls_tenant" -> ((s, d) =>
      Rls.withTenant(trades(s, d), 0L)
        .groupBy("symbol").agg(count(lit(1)).as("n_trades"))),

    // Multi-tenant membership session (get_user_tenants() semantics): the
    // session may read tenants {0, 2} — an IN-list predicate at the scan.
    "q_rls_tenants" -> ((s, d) =>
      Rls.withTenants(trades(s, d), Seq(0L, 2L))
        .groupBy("symbol").agg(count(lit(1)).as("n_trades"))))

  private val ohlcCte =
    """ohlc AS (
      |  SELECT time_bucket(INTERVAL '1 minute', time) AS bucket, symbol,
      |         arg_min(price, time) AS open, max(price) AS high, min(price) AS low,
      |         arg_max(price, time) AS close, sum(volume) AS volume
      |  FROM trades GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dq_score" -> withTradesAnd(
      ohlcCte + """,
      |stats AS (SELECT avg(close) AS mu, stddev_samp(close) AS sigma FROM ohlc),
      |anchor AS (SELECT max(time) AS mx FROM trades),
      |raw AS (
      |  SELECT count(*) AS n_rows,
      |    CAST(1 AS DOUBLE) - (count(CASE WHEN open IS NULL THEN 1 END) + count(CASE WHEN high IS NULL THEN 1 END) +
      |      count(CASE WHEN low IS NULL THEN 1 END) + count(CASE WHEN close IS NULL THEN 1 END) +
      |      count(CASE WHEN volume IS NULL THEN 1 END)) / CAST(count(*) * 5 AS DOUBLE) AS completeness,
      |    CAST(1 AS DOUBLE) - CAST(count(CASE WHEN high < low OR low > close THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS consistency,
      |    CAST(1 AS DOUBLE) - CAST(count(CASE WHEN abs((close - mu) / nullif(sigma, CAST(0 AS DOUBLE))) > 3 THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy,
      |    CASE WHEN epoch_us(max(mx)) - epoch_us(max(bucket)) <= 60000000 THEN CAST(1.0 AS DOUBLE)
      |         WHEN epoch_us(max(mx)) - epoch_us(max(bucket)) <= 300000000 THEN CAST(0.8 AS DOUBLE)
      |         ELSE CAST(0.5 AS DOUBLE) END AS timeliness
      |  FROM ohlc CROSS JOIN stats CROSS JOIN anchor)""".stripMargin,
      """SELECT n_rows,
        |       floor(completeness * 1e6 + 0.5) / 1e6 AS completeness,
        |       floor(consistency * 1e6 + 0.5) / 1e6 AS consistency,
        |       floor(accuracy * 1e6 + 0.5) / 1e6 AS accuracy,
        |       timeliness,
        |       floor(((completeness + consistency + accuracy + timeliness) / CAST(4 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS overall
        |FROM raw""".stripMargin),

    // Mirrors PipelineHealth.compute: the DQSOps raw CTE (q_dq_score), the
    // KS p-value CTE (q_ks_test), one scalar pass over trades, five
    // component-metric rows UNION ALL the worst-status overall record.
    "q_pipeline_health" -> withTradesAnd(
      ohlcCte + """,
      |stats AS (SELECT avg(close) AS mu, stddev_samp(close) AS sigma FROM ohlc),
      |anchor AS (SELECT max(time) AS mx FROM trades),
      |rawdq AS (
      |  SELECT
      |    CAST(1 AS DOUBLE) - (count(CASE WHEN open IS NULL THEN 1 END) + count(CASE WHEN high IS NULL THEN 1 END) +
      |      count(CASE WHEN low IS NULL THEN 1 END) + count(CASE WHEN close IS NULL THEN 1 END) +
      |      count(CASE WHEN volume IS NULL THEN 1 END)) / CAST(count(*) * 5 AS DOUBLE) AS completeness,
      |    CAST(1 AS DOUBLE) - CAST(count(CASE WHEN high < low OR low > close THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS consistency,
      |    CAST(1 AS DOUBLE) - CAST(count(CASE WHEN abs((close - mu) / nullif(sigma, CAST(0 AS DOUBLE))) > 3 THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy,
      |    CASE WHEN epoch_us(max(mx)) - epoch_us(max(bucket)) <= 60000000 THEN CAST(1.0 AS DOUBLE)
      |         WHEN epoch_us(max(mx)) - epoch_us(max(bucket)) <= 300000000 THEN CAST(0.8 AS DOUBLE)
      |         ELSE CAST(0.5 AS DOUBLE) END AS timeliness
      |  FROM ohlc CROSS JOIN stats CROSS JOIN anchor),
      |dq AS (
      |  SELECT floor(((completeness + consistency + accuracy + timeliness) / CAST(4 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS dq_score
      |  FROM rawdq),
      |m AS (
      |  SELECT floor((CAST(count(CASE WHEN price <= 0 OR volume <= 0 THEN 1 END) AS DOUBLE) /
      |                CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS error_rate,
      |         floor((CAST(epoch_us(max(time)) - epoch_us(date_trunc('minute', max(time))) AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6 AS ca_lag_seconds,
      |         floor((CAST(count(CASE WHEN bid IS NULL OR ask IS NULL THEN 1 END) AS DOUBLE) /
      |                CAST(count(*) AS DOUBLE) * CAST(100 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS null_rate_percent
      |  FROM trades),
      |pts AS (
      |  SELECT value AS v,
      |         count(CASE WHEN event_type = 'view' THEN 1 END) AS c1,
      |         count(CASE WHEN event_type = 'click' THEN 1 END) AS c2
      |  FROM events WHERE event_type IN ('view', 'click') AND value IS NOT NULL
      |  GROUP BY 1),
      |r AS (
      |  SELECT sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
      |         sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2,
      |         sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
      |  FROM pts),
      |a AS (
      |  SELECT max(abs(CAST(r1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS d,
      |         CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
      |  FROM r),
      |pv AS (
      |  SELECT d, n1, n2,
      |         CASE WHEN sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) * d < CAST(0.1 AS DOUBLE)
      |              THEN CAST(1 AS DOUBLE)
      |              ELSE least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
      |           CAST(2 AS DOUBLE) * list_reduce(
      |             list_transform(range(1, 101), k ->
      |               power(CAST(-1 AS DOUBLE), CAST(k AS DOUBLE) - 1) *
      |               exp(CAST(-2 AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) *
      |                   (sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) * d) *
      |                   (sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) * d))),
      |             (acc, x) -> acc + x))) END AS p
      |  FROM a),
      |ksq AS (SELECT floor(p * 1e6 + 0.5) / 1e6 AS p_value FROM pv),
      |comps AS (
      |  SELECT 'ingest' AS component, 'error_rate' AS metric,
      |         error_rate AS value, CAST(0.001 AS DOUBLE) AS threshold,
      |         CASE WHEN error_rate > CAST(0.001 AS DOUBLE) THEN 'critical' ELSE 'healthy' END AS status
      |  FROM m
      |  UNION ALL
      |  SELECT 'storage', 'ca_lag_seconds', ca_lag_seconds, CAST(120 AS DOUBLE),
      |         CASE WHEN ca_lag_seconds > CAST(120 AS DOUBLE) THEN 'degraded' ELSE 'healthy' END
      |  FROM m
      |  UNION ALL
      |  SELECT 'features', 'dq_score', dq_score, CAST(0.8 AS DOUBLE),
      |         CASE WHEN dq_score < CAST(0.8 AS DOUBLE) THEN 'degraded' ELSE 'healthy' END
      |  FROM dq
      |  UNION ALL
      |  SELECT 'feature_quality', 'null_rate_percent', null_rate_percent, CAST(5 AS DOUBLE),
      |         CASE WHEN null_rate_percent > CAST(5 AS DOUBLE) THEN 'degraded' ELSE 'healthy' END
      |  FROM m
      |  UNION ALL
      |  SELECT 'feature_quality', 'ks_p_value', p_value, CAST(0.01 AS DOUBLE),
      |         CASE WHEN p_value < CAST(0.01 AS DOUBLE) THEN 'degraded' ELSE 'healthy' END
      |  FROM ksq)""".stripMargin,
      """SELECT component, metric, value, threshold, status FROM comps
        |UNION ALL
        |SELECT 'overall', 'worst_status', CAST(p AS DOUBLE), CAST(3 AS DOUBLE),
        |       CASE WHEN p = 3 THEN 'critical' WHEN p = 2 THEN 'degraded' ELSE 'healthy' END
        |FROM (
        |  SELECT max(CASE WHEN status = 'critical' THEN 3
        |                  WHEN status = 'degraded' THEN 2 ELSE 1 END) AS p
        |  FROM comps)""".stripMargin),

    // Mirrors the derived backup feed, then classifies via the key-join:
    // missing key -> only_a/only_b, IS DISTINCT FROM on the compare
    // columns -> mismatch.
    "q_feed_reconcile" -> withTradesAnd(
      """b AS (
        |  SELECT trade_id, symbol,
        |         CASE WHEN CAST(trade_id AS BIGINT) % 17 = 0
        |              THEN price + 0.01 ELSE price END AS price,
        |         volume, side
        |  FROM trades WHERE CAST(trade_id AS BIGINT) % 13 <> 0
        |  UNION ALL
        |  SELECT 'b' || trade_id, symbol, price, volume, side
        |  FROM trades WHERE CAST(trade_id AS BIGINT) % 23 = 0)""".stripMargin,
      """SELECT symbol,
        |       count(CASE WHEN status = 'only_a' THEN 1 END) AS n_only_a,
        |       count(CASE WHEN status = 'only_b' THEN 1 END) AS n_only_b,
        |       count(CASE WHEN status = 'mismatch' THEN 1 END) AS n_mismatch,
        |       count(CASE WHEN status = 'match' THEN 1 END) AS n_match
        |FROM (
        |  SELECT coalesce(a.symbol, b.symbol) AS symbol,
        |         CASE WHEN b.trade_id IS NULL THEN 'only_a'
        |              WHEN a.trade_id IS NULL THEN 'only_b'
        |              WHEN a.price IS DISTINCT FROM b.price
        |                OR a.volume IS DISTINCT FROM b.volume
        |                OR a.side IS DISTINCT FROM b.side THEN 'mismatch'
        |              ELSE 'match' END AS status
        |  FROM trades a FULL OUTER JOIN b ON a.trade_id = b.trade_id) x
        |GROUP BY symbol""".stripMargin),

    // Mirrors AlertRules: quantized grid metrics, VALUES rule table,
    // bucket-index-minus-rank islands (pure integer arithmetic), HAVING on
    // the hold duration.
    "q_alert_rules" -> withTradesAnd(
      """b AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', time) AS bucket,
        |         floor(quantile_cont(price, 0.95) * 1e6 + 0.5) / 1e6 AS p95_latency,
        |         count(*) AS n
        |  FROM trades GROUP BY 1),
        |mstat AS (SELECT CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_n FROM b),
        |metrics AS (
        |  SELECT bucket, 'p95_latency' AS metric, p95_latency AS value FROM b
        |  UNION ALL
        |  SELECT bucket, 'ingest_rate_ratio' AS metric,
        |         floor((CAST(n AS DOUBLE) / mean_n) * 1e6 + 0.5) / 1e6 AS value
        |  FROM b CROSS JOIN mstat),
        |rules(alert, metric, threshold, for_intervals) AS (
        |  VALUES ('FlinkHighLatency', 'p95_latency', CAST(250 AS DOUBLE), 1),
        |         ('KafkaHighConsumerLag', 'ingest_rate_ratio', CAST(1.5 AS DOUBLE), 2)),
        |viol AS (
        |  SELECT alert, bucket, value, for_intervals,
        |         epoch_us(bucket) // 1800000000 -
        |           row_number() OVER (PARTITION BY alert ORDER BY bucket) AS island
        |  FROM metrics JOIN rules USING (metric)
        |  WHERE value > threshold)""".stripMargin,
      """SELECT alert, min(bucket) AS starts_at, max(bucket) AS ends_at,
        |       count(*) AS n_intervals, max(value) AS peak
        |FROM viol GROUP BY alert, island
        |HAVING count(*) >= max(for_intervals)""".stripMargin),

    // Mirrors Canary.evaluate: identical quantized signals, the trade
    // simulation replayed as an integer list_reduce in (time, trade_id)
    // order (exact BIGINT arithmetic — order-deterministic by construction).
    "q_canary_eval" -> withTradesAnd(
      """ticks AS (
        |  SELECT symbol, time, trade_id,
        |         CAST(floor(price * 1e6 + 0.5) AS BIGINT) AS pi,
        |         CAST(sign(floor((price - avg(price) OVER w20) * 1e6 + 0.5) / 1e6) AS INT) AS pb,
        |         CAST(sign(floor((price - avg(price) OVER w5) * 1e6 + 0.5) / 1e6) AS INT) AS pc
        |  FROM trades
        |  WINDOW w20 AS (PARTITION BY symbol ORDER BY time, trade_id
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
        |         w5 AS (PARTITION BY symbol ORDER BY time, trade_id
        |                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |obs AS (
        |  SELECT symbol,
        |         list(struct_pack(pi := pi, pb := pb, pc := pc)
        |              ORDER BY time, trade_id) AS l
        |  FROM ticks GROUP BY symbol),
        |sim AS (
        |  SELECT symbol,
        |    list_reduce(
        |      list_prepend(CAST([0, 0, 0, 0] AS BIGINT[]),
        |        list_transform(l[1:len(l) - 1],
        |          x -> CAST([x.pi, x.pb, x.pc, 0] AS BIGINT[]))),
        |      (a, x) -> [
        |        a[1] + CASE WHEN x[2] > 0 THEN -x[1]
        |                    WHEN x[2] < 0 AND a[2] > 0 THEN x[1] ELSE 0 END,
        |        a[2] + CASE WHEN x[2] > 0 THEN 1
        |                    WHEN x[2] < 0 AND a[2] > 0 THEN -1 ELSE 0 END,
        |        a[3] + CASE WHEN x[3] > 0 THEN -x[1]
        |                    WHEN x[3] < 0 AND a[4] > 0 THEN x[1] ELSE 0 END,
        |        a[4] + CASE WHEN x[3] > 0 THEN 1
        |                    WHEN x[3] < 0 AND a[4] > 0 THEN -1 ELSE 0 END]) AS s,
        |    l[len(l)].pi AS last_pi
        |  FROM obs),
        |pnls AS (
        |  SELECT symbol,
        |         CAST(s[1] + last_pi * s[2] AS DOUBLE) / 1e6 AS pnl_b,
        |         CAST(s[3] + last_pi * s[4] AS DOUBLE) / 1e6 AS pnl_c
        |  FROM sim),
        |lat AS (
        |  SELECT symbol,
        |    floor(quantile_cont(CAST(50 + CAST(trade_id AS BIGINT) % 20 AS DOUBLE), 0.95) * 1e6 + 0.5) / 1e6 AS baseline_latency_p95,
        |    floor(quantile_cont(CAST(55 + CAST(trade_id AS BIGINT) % 25 AS DOUBLE), 0.95) * 1e6 + 0.5) / 1e6 AS canary_latency_p95
        |  FROM trades GROUP BY symbol)""".stripMargin,
      """SELECT *,
        |       CASE WHEN abs(pnl_diff_pct) > CAST(10 AS DOUBLE) OR
        |                 canary_latency_p95 > baseline_latency_p95 * CAST(1.2 AS DOUBLE)
        |            THEN 'reject' ELSE 'promote' END AS status
        |FROM (
        |  SELECT p.symbol,
        |         floor(pnl_b * 1e6 + 0.5) / 1e6 AS baseline_pnl,
        |         floor(pnl_c * 1e6 + 0.5) / 1e6 AS canary_pnl,
        |         CASE WHEN abs(pnl_b) < CAST(0.01 AS DOUBLE) THEN CAST(0 AS DOUBLE)
        |              ELSE floor((CAST(100 AS DOUBLE) * (pnl_c - pnl_b) / abs(pnl_b)) * 1e6 + 0.5) / 1e6 END AS pnl_diff_pct,
        |         baseline_latency_p95, canary_latency_p95,
        |         floor((CAST(100 AS DOUBLE) * (canary_latency_p95 - baseline_latency_p95) / baseline_latency_p95) * 1e6 + 0.5) / 1e6 AS latency_increase_pct
        |  FROM pnls p JOIN lat USING (symbol))""".stripMargin),

    // Mirrors CostBudget: group-then-rate lines, one rollup against the
    // budget — exact binary-fraction rates make every sum order-exact.
    // Mirrors Lineage.datasetFingerprint: identical canonical row keys
    // (engine-portable atoms only), 60-bit md5 images, BIT_XOR combine
    // (order-independent), schema-contract literals md5'd in-query.
    "q_repro_fingerprint" -> withTradesAnd(
      """tk AS (
        |  SELECT concat_ws('|', symbol, trade_id, COALESCE(side, '~null~'),
        |    CAST(epoch_us(time) AS VARCHAR),
        |    CAST(CAST(floor(price * 1e6 + 0.5) AS BIGINT) AS VARCHAR),
        |    CAST(CAST(floor(volume * 1e6 + 0.5) AS BIGINT) AS VARCHAR),
        |    COALESCE(CAST(CAST(floor(bid * 1e6 + 0.5) AS BIGINT) AS VARCHAR), '~null~'),
        |    COALESCE(CAST(CAST(floor(ask * 1e6 + 0.5) AS BIGINT) AS VARCHAR), '~null~')) AS k
        |  FROM trades),
        |dk AS (
        |  SELECT concat_ws('|', CAST(doc_id AS VARCHAR), text, lang, source,
        |    CAST(n_chars AS VARCHAR)) AS k
        |  FROM documents)""".stripMargin,
      """SELECT 'trades' AS dataset, count(*) AS n_rows,
        |  bit_xor(CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT)) AS content_hash,
        |  md5('time:timestamp,symbol:string,price:double,volume:double,trade_id:string,side:string,bid:double,ask:double') AS schema_hash
        |FROM tk
        |UNION ALL
        |SELECT 'documents', count(*),
        |  bit_xor(CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT)),
        |  md5('doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint')
        |FROM dk""".stripMargin),

    "q_cost_budget" ->
      """WITH ev AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |rates(event_type, rate) AS (
        |  VALUES ('purchase', CAST(0.5 AS DOUBLE)), ('click', CAST(0.25 AS DOUBLE)),
        |         ('view', CAST(0.125 AS DOUBLE)), ('error', CAST(1.0 AS DOUBLE)),
        |         ('signup', CAST(0.25 AS DOUBLE))),
        |lines AS (
        |  SELECT 'ingest_' || ev.event_type AS component, 'compute' AS clazz,
        |         CAST(n AS DOUBLE) * COALESCE(rate, CAST(0.25 AS DOUBLE)) AS cost
        |  FROM ev LEFT JOIN rates ON ev.event_type = rates.event_type
        |  UNION ALL
        |  SELECT 'store_' || source, 'storage',
        |         CAST(sum(n_chars) AS DOUBLE) * CAST(0.000244140625 AS DOUBLE)
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(cost) AS total FROM lines)
        |SELECT component, clazz,
        |       floor(cost * 1e6 + 0.5) / 1e6 AS cost,
        |       floor((CAST(100 AS DOUBLE) * cost / total) * 1e6 + 0.5) / 1e6 AS share_pct,
        |       floor(total * 1e6 + 0.5) / 1e6 AS total_cost,
        |       CAST(3000 AS DOUBLE) AS budget,
        |       floor((CAST(100 AS DOUBLE) * total / CAST(3000 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS utilization_pct,
        |       total > CAST(3000 AS DOUBLE) AS violated,
        |       floor((CAST(3000 AS DOUBLE) - total) * 1e6 + 0.5) / 1e6 AS remaining,
        |       CASE WHEN NOT total > CAST(3000 AS DOUBLE) THEN 'none'
        |            WHEN clazz = 'compute' THEN 'scale_down'
        |            WHEN clazz = 'storage' THEN 'tier_to_glacier'
        |            ELSE 'hold' END AS action
        |FROM lines CROSS JOIN tot""".stripMargin,

    "q_observe_dq" -> withTrades(
      """SELECT count(*) AS n_rows,
        |       count(CASE WHEN side IS NULL THEN 1 END) AS null_side,
        |       CAST(epoch_us(min(time)) AS BIGINT) AS min_time_micros,
        |       CAST(epoch_us(max(time)) AS BIGINT) AS max_time_micros,
        |       sum(volume) AS sum_volume
        |FROM trades""".stripMargin),

    "q_ks_test" ->
      """WITH pts AS (
        |  SELECT value AS v,
        |         count(CASE WHEN event_type = 'view' THEN 1 END) AS c1,
        |         count(CASE WHEN event_type = 'click' THEN 1 END) AS c2
        |  FROM events WHERE event_type IN ('view', 'click') AND value IS NOT NULL
        |  GROUP BY 1),
        |r AS (
        |  SELECT sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
        |         sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2,
        |         sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
        |  FROM pts),
        |a AS (
        |  SELECT max(abs(CAST(r1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS d,
        |         CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
        |  FROM r),
        |pv AS (
        |  SELECT d, n1, n2,
        |         CASE WHEN sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) * d < CAST(0.1 AS DOUBLE)
        |              THEN CAST(1 AS DOUBLE)
        |              ELSE least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
        |           CAST(2 AS DOUBLE) * list_reduce(
        |             list_transform(range(1, 101), k ->
        |               power(CAST(-1 AS DOUBLE), CAST(k AS DOUBLE) - 1) *
        |               exp(CAST(-2 AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) *
        |                   (sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) * d) *
        |                   (sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) * d))),
        |             (acc, x) -> acc + x))) END AS p
        |  FROM a)
        |SELECT d_statistic, n1, n2, shifted, p_value,
        |       CASE WHEN p_value < CAST(0.01 AS DOUBLE) THEN 'critical'
        |            WHEN p_value < CAST(0.05 AS DOUBLE) THEN 'warning'
        |            ELSE 'ok' END AS severity
        |FROM (
        |  SELECT floor(d * 1e6 + 0.5) / 1e6 AS d_statistic, n1, n2,
        |         d > CAST(1.358 AS DOUBLE) * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) AS shifted,
        |         floor(p * 1e6 + 0.5) / 1e6 AS p_value
        |  FROM pv)""".stripMargin,

    // PSI mirrors Psi.psi: fixed-width bins off exact [min,max], add-one
    // smoothing (exact integer ratios), terms folded IN BIN ORDER.
    "q_psi" ->
      """WITH f AS (
        |  SELECT value AS v, event_type AS g FROM events
        |  WHERE event_type IN ('view', 'click') AND value IS NOT NULL),
        |ext AS (SELECT min(v) AS lo, max(v) AS hi FROM f),
        |b AS (
        |  SELECT least(9, COALESCE(CAST(floor((v - lo) /
        |           nullif((hi - lo) / CAST(10 AS DOUBLE), CAST(0 AS DOUBLE))) AS INT), 0)) AS bin,
        |         g
        |  FROM f, ext),
        |c AS (
        |  SELECT bin,
        |         count(CASE WHEN g = 'view' THEN 1 END) AS c1,
        |         count(CASE WHEN g = 'click' THEN 1 END) AS c2
        |  FROM b GROUP BY 1),
        |n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c),
        |t AS (
        |  SELECT bin, n1, n2,
        |         (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE) -
        |          CAST(c2 + 1 AS DOUBLE) / CAST(n2 + 10 AS DOUBLE)) *
        |         ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 10 AS DOUBLE)) /
        |            (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + 10 AS DOUBLE))) AS term
        |  FROM c, n),
        |folded AS (
        |  SELECT floor(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list(term ORDER BY bin)), (acc, x) -> acc + x) * 1e6 + 0.5) / 1e6 AS psi,
        |         CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
        |  FROM t)
        |SELECT psi, n1, n2,
        |       CASE WHEN psi >= CAST(0.25 AS DOUBLE) THEN 'major'
        |            WHEN psi >= CAST(0.1 AS DOUBLE) THEN 'moderate'
        |            ELSE 'stable' END AS drift
        |FROM folded""".stripMargin,

    // Mirrors Profiler.profile over trades: per-column null/distinct/range,
    // typed min/max pairs (values, not arithmetic — exact cross-engine).
    "q_profile" -> withTrades({
      def strCol(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |       floor((CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS null_fraction,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |       CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
           |FROM trades""".stripMargin
      def numCol(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |       floor((CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS null_fraction,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           |       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM trades""".stripMargin
      (Seq("symbol", "side", "trade_id").map(strCol) ++
        Seq("price", "volume", "bid", "ask").map(numCol)).mkString("\nUNION ALL\n")
    }),

    "q_zscore_outliers" ->
      """SELECT l.l_returnflag,
        |       count(CASE WHEN abs((l_extendedprice - mu) / nullif(sigma, CAST(0 AS DOUBLE))) > 3 THEN 1 END) AS n_outliers,
        |       count(*) AS n
        |FROM lineitem l
        |JOIN (SELECT l_returnflag, avg(l_extendedprice) AS mu,
        |             stddev_samp(l_extendedprice) AS sigma
        |      FROM lineitem GROUP BY 1) s
        |  ON l.l_returnflag = s.l_returnflag
        |GROUP BY l.l_returnflag""".stripMargin,

    // Mirrors q_chi2_drift: integer cell counts, one expected-count
    // division per cell, statistic folded over (period, side)-ordered
    // cells, severity on the quantized statistic.
    "q_chi2_drift" -> withTradesAnd(
      """b AS (
        |  SELECT min(epoch_us(time)) AS lo, max(epoch_us(time)) AS hi
        |  FROM trades WHERE side IS NOT NULL),
        |cells AS (
        |  SELECT CASE WHEN epoch_us(time) <= lo + (hi - lo) / 2
        |              THEN 'p1' ELSE 'p2' END AS period,
        |         side, count(*) AS o
        |  FROM trades, b WHERE side IS NOT NULL
        |  GROUP BY 1, 2),
        |mm AS (
        |  SELECT period, side, o,
        |         CAST(sum(o) OVER (PARTITION BY period) AS DOUBLE) *
        |           (sum(o) OVER (PARTITION BY side)) /
        |           (sum(o) OVER ()) AS e
        |  FROM cells),
        |tt AS (
        |  SELECT period, side, (o - e) * (o - e) / e AS term FROM mm),
        |st AS (
        |  SELECT floor((list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list(term ORDER BY period, side)), (a, x) -> a + x)) * 1e6 + 0.5) / 1e6 AS chi2,
        |         (count(DISTINCT period) - 1) * (count(DISTINCT side) - 1) AS dof
        |  FROM tt)""".stripMargin,
      """SELECT chi2, dof,
        |       CASE WHEN chi2 > CAST(6.635 AS DOUBLE) THEN 'critical'
        |            WHEN chi2 > CAST(3.841 AS DOUBLE) THEN 'warning'
        |            ELSE 'ok' END AS severity
        |FROM st""".stripMargin),

    // Mirrors q_mad_outliers: nearest-rank median and MAD (rank ceil(n/2)
    // over (value, trade_id)), cut at 3·1.4826·MAD on bit-identical values.
    "q_mad_outliers" -> withTradesAnd(
      """med AS (
        |  SELECT symbol, price AS med FROM (
        |    SELECT symbol, price,
        |           row_number() OVER (PARTITION BY symbol ORDER BY price, trade_id) AS rn,
        |           CAST(ceil(CAST(count(*) OVER (PARTITION BY symbol) AS DOUBLE) / 2) AS BIGINT) AS k
        |    FROM trades)
        |  WHERE rn = k),
        |devs AS (
        |  SELECT t.symbol, t.trade_id, abs(t.price - m.med) AS dev
        |  FROM trades t JOIN med m ON t.symbol = m.symbol),
        |mad AS (
        |  SELECT symbol, dev AS mad FROM (
        |    SELECT symbol, dev,
        |           row_number() OVER (PARTITION BY symbol ORDER BY dev, trade_id) AS rn,
        |           CAST(ceil(CAST(count(*) OVER (PARTITION BY symbol) AS DOUBLE) / 2) AS BIGINT) AS k
        |    FROM devs)
        |  WHERE rn = k)""".stripMargin,
      """SELECT d.symbol,
        |       floor(max(m.med) * 1e6 + 0.5) / 1e6 AS med,
        |       floor(max(a.mad) * 1e6 + 0.5) / 1e6 AS mad,
        |       count(CASE WHEN d.dev > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * a.mad THEN 1 END) AS n_outliers,
        |       count(*) AS n
        |FROM devs d JOIN med m ON d.symbol = m.symbol JOIN mad a ON d.symbol = a.symbol
        |GROUP BY d.symbol""".stripMargin),

    "q_expectations" -> withTrades(
      """SELECT count(*) AS n_rows,
        |       count(CASE WHEN price IS NULL THEN 1 END) AS price_not_null,
        |       count(CASE WHEN price IS NOT NULL AND price <= 0 THEN 1 END) AS price_positive,
        |       count(CASE WHEN volume IS NOT NULL AND volume <= 0 THEN 1 END) AS volume_positive,
        |       count(CASE WHEN side IS NOT NULL AND side NOT IN ('buy', 'sell') THEN 1 END) AS side_in_set,
        |       count(CASE WHEN ask IS NOT NULL AND bid IS NOT NULL AND ask < bid THEN 1 END) AS ask_gte_bid,
        |       count(CASE WHEN volume IS NOT NULL AND NOT (volume >= 1 AND volume <= 100) THEN 1 END) AS volume_between,
        |       (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
        |          (SELECT count(*) AS c FROM trades GROUP BY time, symbol, trade_id
        |           HAVING count(*) > 1)) AS time_symbol_trade_id_unique,
        |       (SELECT count(CASE WHEN prev > price THEN 1 END) FROM
        |          (SELECT price, lag(price, 1) OVER (PARTITION BY symbol ORDER BY time) AS prev
        |           FROM trades)) AS price_increasing
        |FROM trades""".stripMargin),

    "q_increasing_check" -> withTrades(
      """SELECT count(CASE WHEN prev > price THEN 1 END) AS price_increasing_violations
        |FROM (SELECT price, lag(price, 1) OVER (PARTITION BY symbol ORDER BY time) AS prev
        |      FROM trades)""".stripMargin),

    // Mirrors Expectations.marketDataContract + withVerdict. The type
    // checks are plan-time constants on the Spark side (the trades schema
    // IS string/double/double/string), so the oracle emits TRUE; the
    // completeness fractions are one count/count division each (single
    // IEEE op — no quantization needed); the verdict repeats the same
    // predicates the Spark side folds over the report columns.
    "q_data_contract" -> withTrades(
      """SELECT count(*) AS n_rows,
        |       TRUE AS symbol_type_ok, TRUE AS price_type_ok,
        |       TRUE AS volume_type_ok, TRUE AS trade_id_type_ok,
        |       count(CASE WHEN price IS NOT NULL AND NOT (price >= 0.01 AND price <= 1000000.0) THEN 1 END) AS price_between,
        |       count(CASE WHEN volume IS NOT NULL AND NOT (volume >= 0.0 AND volume <= 1e12) THEN 1 END) AS volume_between,
        |       CAST(count(symbol) AS DOUBLE) / count(*) AS symbol_completeness,
        |       CAST(count(price) AS DOUBLE) / count(*) AS price_completeness,
        |       CAST(count(volume) AS DOUBLE) / count(*) AS volume_completeness,
        |       CAST(count(trade_id) AS DOUBLE) / count(*) AS trade_id_completeness,
        |       (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
        |          (SELECT count(*) AS c FROM trades GROUP BY trade_id
        |           HAVING count(*) > 1)) AS trade_id_unique,
        |       count(CASE WHEN side IS NOT NULL AND side NOT IN ('buy', 'sell') THEN 1 END) AS side_in_set,
        |       count(CASE WHEN price IS NOT NULL AND NOT (price >= 0.01 AND price <= 1000000.0) THEN 1 END) = 0
        |         AND count(CASE WHEN volume IS NOT NULL AND NOT (volume >= 0.0 AND volume <= 1e12) THEN 1 END) = 0
        |         AND CAST(count(symbol) AS DOUBLE) / count(*) >= 1.0
        |         AND CAST(count(price) AS DOUBLE) / count(*) >= 1.0
        |         AND CAST(count(volume) AS DOUBLE) / count(*) >= 1.0
        |         AND CAST(count(trade_id) AS DOUBLE) / count(*) >= 1.0
        |         AND (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
        |                (SELECT count(*) AS c FROM trades GROUP BY trade_id
        |                 HAVING count(*) > 1)) = 0
        |         AND count(CASE WHEN side IS NOT NULL AND side NOT IN ('buy', 'sell') THEN 1 END) = 0
        |         AS passed
        |FROM trades""".stripMargin),

    // Roundtrip transparency: decrypt(encrypt(x)) == x, so the aggregate
    // equals the plain per-symbol aggregation of the source rows.
    "q_field_encrypt" -> withTrades(
      """SELECT symbol, count(*) AS n, sum(volume) AS sum_volume
        |FROM trades GROUP BY symbol""".stripMargin),

    // Mirrors Lifecycle.tierReport: whole-day age against max(time)'s date.
    "q_storage_tiers" -> withTrades(
      """SELECT tier, count(*) AS n_rows, count(DISTINCT d) AS n_days,
        |       min(d) AS oldest, max(d) AS newest
        |FROM (
        |  SELECT CASE WHEN age < 7 THEN 'hot'
        |              WHEN age < 14 THEN 'warm'
        |              WHEN age < 21 THEN 'cold'
        |              ELSE 'expired' END AS tier, d
        |  FROM (
        |    SELECT date_diff('day', CAST(time AS DATE),
        |             (SELECT max(CAST(time AS DATE)) FROM trades)) AS age,
        |           CAST(time AS DATE) AS d
        |    FROM trades))
        |GROUP BY tier""".stripMargin),

    "q_ingest_dlq" -> withTrades(
      """SELECT count(CASE WHEN price IS NULL OR price <= 0 THEN 1 END) AS price_positive,
        |       count(CASE WHEN volume IS NULL OR volume < 1 OR volume > 100 THEN 1 END) AS volume_in_range,
        |       count(CASE WHEN side IS NOT NULL AND side NOT IN ('buy', 'sell') THEN 1 END) AS side_in_domain,
        |       count(CASE WHEN bid IS NOT NULL AND ask IS NOT NULL AND ask < bid THEN 1 END) AS ask_gte_bid,
        |       count(CASE WHEN bid IS NOT NULL AND ask IS NOT NULL AND ask - bid > CAST(0.15 AS DOUBLE) THEN 1 END) AS spread_bounded,
        |       count(CASE WHEN (price IS NULL OR price <= 0) OR (volume IS NULL OR volume < 1 OR volume > 100)
        |                    OR (side IS NOT NULL AND side NOT IN ('buy', 'sell'))
        |                    OR (bid IS NOT NULL AND ask IS NOT NULL AND ask < bid)
        |                    OR (bid IS NOT NULL AND ask IS NOT NULL AND ask - bid > CAST(0.15 AS DOUBLE))
        |             THEN 1 END) AS n_dlq,
        |       count(CASE WHEN NOT ((price IS NULL OR price <= 0) OR (volume IS NULL OR volume < 1 OR volume > 100)
        |                    OR (side IS NOT NULL AND side NOT IN ('buy', 'sell'))
        |                    OR (bid IS NOT NULL AND ask IS NOT NULL AND ask < bid)
        |                    OR (bid IS NOT NULL AND ask IS NOT NULL AND ask - bid > CAST(0.15 AS DOUBLE)))
        |             THEN 1 END) AS n_clean
        |FROM trades""".stripMargin),

    "q_rls_tenant" -> withTrades(
      """SELECT symbol, count(*) AS n_trades
        |FROM trades WHERE CAST(symbol AS BIGINT) % 3 = 0
        |GROUP BY symbol""".stripMargin),

    "q_rls_tenants" -> withTrades(
      """SELECT symbol, count(*) AS n_trades
        |FROM trades WHERE CAST(symbol AS BIGINT) % 3 IN (0, 2)
        |GROUP BY symbol""".stripMargin))
}
