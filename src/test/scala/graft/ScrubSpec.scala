package graft

import graft.ext.{Curation, Scrub}
import graft.features.Risk
import org.apache.spark.sql.functions._

/** Unit semantics for the corpus-scrubbing tier (Scrub/mixture sampling)
  * and the risk analytics (Risk) on hand-built fixtures — the DuckDB hash
  * gate covers the corpus-scale behavior; these pin the edge cases.
  */
class ScrubSpec extends SparkTestBase {

  import spark.implicits._

  test("redact replaces every PII category and leaves clean text unchanged") {
    val rows = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "server 192.168.0.1 and card 4111111111111111"),
      (3L, "clean text with no pii at all"),
      (4L, "Contact John.Doe@Example.COM please"))
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id"), Scrub.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "mail me at <EMAIL> today")
    assert(out(2L) === "server <IP> and card <NUM>")
    assert(out(3L) === "clean text with no pii at all")
    assert(out(4L) === "Contact <EMAIL> please", "mixed case must not leak")
    val audit = Scrub.piiAudit(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"), r.getAs[Int]("n_longnums"))).toMap
    assert(audit(1L) === ((1, 0, 0)))
    assert(audit(2L) === ((0, 1, 1)))
    assert(audit(3L) === ((0, 0, 0)))
    assert(audit(4L) === ((1, 0, 0)))
  }

  test("decontaminate flags exactly the docs sharing a k-gram with the eval set") {
    val train = Seq(
      (1L, "a b c d e f g h i j"),      // contains eval 8-gram a..h
      (2L, "z y x w v u t s r q"),      // disjoint
      (3L, "one two three"))            // shorter than k: no grams
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = Scrub.decontaminate(train, eval_, k = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out(1L) === ((1L, true)))
    assert(out(2L) === ((0L, false)))
    assert(out(3L) === ((0L, false)), "short docs have no grams but stay in the output")
    assert(out.size === 3)
  }

  test("boilerplate counts grams shared across >= minDocs distinct docs") {
    val docs = Seq(
      (1L, "shared header line one unique1 tail"),
      (2L, "shared header line one unique2 tail"),
      (3L, "shared header line one unique3 tail"),
      (4L, "totally different words here now"))
      .toDF("doc_id", "text")
    val out = Scrub.boilerplate(docs, k = 4, minDocs = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_boiler")).toMap
    // "shared header line one" appears in docs 1-3 (>= 3 docs); the grams
    // crossing the uniqueN token are per-doc only.
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L)
    assert(out(4L) === 0L)
  }

  test("mixtureSample is deterministic, respects rate 0 and rate 1") {
    val docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "keep" else "drop"))
      .toDF("doc_id", "source")
    val rates = Seq(("keep", 1.0), ("drop", 0.0)).toDF("source", "rate")
    val kept = Curation.mixtureSample(docs, rates, "doc_id").collect()
    assert(kept.length === 100)
    assert(kept.forall(_.getAs[String]("source") == "keep"))
    // determinism: same input -> same rows
    val again = Curation.mixtureSample(docs, rates, "doc_id")
      .agg(sum("doc_id")).collect()(0).getLong(0)
    assert(again === kept.map(_.getAs[Long]("doc_id")).sum)
  }

  test("obv accumulates signed integer volume in order") {
    // prices 1,2,1,1,3 -> steps 0,+v,-v,0,+v
    val t = Seq(
      (1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 1.0, 5.0), (4L, 1.0, 7.0), (5L, 3.0, 2.0))
      .map { case (i, p, v) =>
        (new java.sql.Timestamp(1704067200000L + i * 60000), "S", f"$i%03d", p, v)
      }
      .toDF("time", "symbol", "trade_id", "price", "volume")
    val obv = Risk.obv(t).orderBy("time").collect().map(_.getAs[Long]("obv")).toSeq
    assert(obv === Seq(0L, 20L, 15L, 15L, 17L))
  }

  test("varCvar nearest-rank cut: var is an actual observation, cvar averages the tail") {
    // 20 returns per the ramp fixture -> n = 24 non-null? use explicit data:
    // returns engineered via prices: 100 * exp(r_i) chain is overkill —
    // just check rank math on a symbol with 20 returns: k = ceil(0.05*20)=1,
    // so var = min return and cvar = that same value.
    val prices = Seq(100.0, 99.0, 100.0, 98.0, 100.0, 97.0, 100.0, 96.0, 100.0,
      95.0, 100.0, 94.0, 100.0, 93.0, 100.0, 92.0, 100.0, 91.0, 100.0, 90.0, 100.0)
    val t = prices.zipWithIndex.map { case (p, i) =>
      (new java.sql.Timestamp(1704067200000L + i * 60000L), "S", f"$i%03d", p, 1.0)
    }.toDF("time", "symbol", "trade_id", "price", "volume")
    val r = Risk.varCvar(t).collect()(0)
    assert(r.getAs[Long]("n_tail") === 1L)
    // worst return = ln(90/100), quantized at 1e-6
    val worst = math.floor(math.log(90.0 / 100.0) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("var_95") === worst)
    assert(r.getAs[Double]("cvar_95") === worst)
  }

  test("rangeVolatility: constant-price bars give zero parkinson and gk") {
    val flat = rampTrades(30).withColumn("price", lit(100.0))
    val out = Risk.rangeVolatility(flat).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Double]("parkinson") === 0.0))
    assert(out.forall(r => r.getAs[Double]("garman_klass") === 0.0))
  }

  test("data contract verdict fails on dirty data and pinpoints the failing checks") {
    import graft.quality.Expectations
    import graft.quality.Expectations._
    // dirty: null symbol (completeness<1), duplicate trade_id, price out of range
    val dirty = Seq(
      (Some("A"), 5.0, 10.0, "t1", Some("buy")),
      (None, 0.001, 10.0, "t2", Some("sell")),
      (Some("B"), 7.0, 10.0, "t2", None))
      .toDF("symbol", "price", "volume", "trade_id", "side")
    val row = Expectations.withVerdict(
      Expectations.evaluate(dirty, marketDataContract), marketDataContract).collect()(0)
    assert(!row.getAs[Boolean]("passed"))
    assert(row.getAs[Long]("price_between") === 1L)            // 0.001 < 0.01
    assert(math.abs(row.getAs[Double]("symbol_completeness") - 2.0 / 3) < 1e-12)
    assert(row.getAs[Long]("trade_id_unique") === 1L)
    assert(row.getAs[Boolean]("symbol_type_ok"))
    // wrong declared type flips the type flag and the verdict independently
    val typed = Expectations.evaluate(dirty, Seq(TypeIs("price", "string")))
    assert(!typed.collect()(0).getAs[Boolean]("price_type_ok"))
  }

  test("aes field encryption roundtrips values exactly") {
    val t = rampTrades(10)
      .withColumn("enc", expr("aes_encrypt(cast(symbol as binary), '0123456789abcdef')"))
      .withColumn("dec", expr("cast(aes_decrypt(enc, '0123456789abcdef') as string)"))
    assert(t.filter(col("dec") =!= col("symbol")).count() === 0)
    // ciphertext is NOT the plaintext (it actually encrypts)
    assert(t.filter(expr("cast(enc as string)") === col("symbol")).count() === 0)
  }

  test("retention drops only expired date partitions; survivors stay byte-identical") {
    import graft.streaming.StreamingFeatures
    val t = core.Tables.trades(spark, sf0001)
    val out = java.nio.file.Files.createTempDirectory("graft_retention_").toString + "/t"
    StreamingFeatures.mergeIntoKeyed(spark, out, t, Seq("time", "symbol", "trade_id"))
    val anchor = t.agg(max(to_date(col("time")))).collect()(0)
      .getDate(0).toLocalDate
    def partDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("part_date=")).sortBy(_.getName)
    val before = partDirs.map(_.getName)
    assert(before.length > 21, "fixture spans a month of partitions")
    // fingerprint surviving partitions' files before the drop
    def fileBytes(dir: java.io.File): Map[String, Long] =
      dir.listFiles().filter(_.isFile).map(f => f.getName -> f.length()).toMap
    val keepDays = 21
    val cutoff = anchor.minusDays(keepDays.toLong - 1)
    val surviving = partDirs.filter(d =>
      !java.time.LocalDate.parse(d.getName.stripPrefix("part_date=")).isBefore(cutoff))
    val fingerprints = surviving.map(d => d.getName -> fileBytes(d)).toMap

    val dropped = graft.operators.Lifecycle.applyRetention(out, keepDays, anchor)
    assert(dropped.nonEmpty, "a month-long table must have expired partitions")
    val after = partDirs.map(_.getName)
    assert(after.toSet === before.toSet -- dropped.map("part_date=" + _))
    // survivors untouched on disk
    surviving.foreach(d => assert(fileBytes(d) === fingerprints(d.getName)))
    // the table still reads, now only within the retention window
    val minDate = StreamingFeatures.readKeyedTable(spark, out)
      .agg(min(to_date(col("time")))).collect()(0).getDate(0).toLocalDate
    assert(!minDate.isBefore(cutoff))
  }

  test("compaction collapses fragmented partitions and preserves data exactly") {
    import graft.streaming.StreamingFeatures
    val t = core.Tables.trades(spark, sf0001)
    val out = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    // two merges fragment the touched partitions (one file set per pass)
    StreamingFeatures.mergeIntoKeyed(spark, out, t, Seq("time", "symbol", "trade_id"))
    StreamingFeatures.mergeIntoKeyed(spark, out, t, Seq("time", "symbol", "trade_id"))
    def dataFiles(dir: java.io.File) =
      dir.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val partDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("part_date="))
    assert(partDirs.exists(dataFiles(_).length > 1), "merges must fragment")
    val beforeRows = StreamingFeatures.readKeyedTable(spark, out)
      .orderBy("time", "symbol", "trade_id").collect()

    val compacted = graft.operators.Lifecycle.compactPartitions(spark, out)
    assert(compacted.nonEmpty)
    partDirs.foreach(d => assert(dataFiles(d).length === 1,
      s"${d.getName} still fragmented"))
    val afterRows = StreamingFeatures.readKeyedTable(spark, out)
      .orderBy("time", "symbol", "trade_id").collect()
    assert(afterRows.toSeq === beforeRows.toSeq)
    // idempotent: a second pass finds nothing to do
    assert(graft.operators.Lifecycle.compactPartitions(spark, out).isEmpty)
  }

  test("hampel repairs a planted spike and leaves the clean series untouched") {
    // flat series with one spike: the spike is flagged and replaced by the
    // rolling median; every other row passes through unchanged
    val prices = Seq.fill(10)(100.0) ++ Seq(500.0) ++ Seq.fill(10)(100.0)
    val t = prices.zipWithIndex.map { case (p, i) =>
      (new java.sql.Timestamp(1704067200000L + i * 60000L), "S", f"$i%03d", p, 1.0)
    }.toDF("time", "symbol", "trade_id", "price", "volume")
    val out = Risk.hampel(t, n = 21).orderBy("time").collect()
    val spike = out(10)
    assert(spike.getAs[Boolean]("is_outlier"))
    assert(spike.getAs[Double]("cleaned") === 100.0)
    assert(out.zipWithIndex.count { case (r, i) =>
      i != 10 && r.getAs[Boolean]("is_outlier")
    } === 0, "no false positives on the flat series")
    assert(out.forall(r => r.getAs[Double]("cleaned") === 100.0 ||
      r.getAs[Boolean]("is_outlier") === false))
  }

  test("compaction recovers crash artifacts: orphaned trash restored, stale trash removed") {
    import graft.streaming.StreamingFeatures
    val t = core.Tables.trades(spark, sf0001)
    val out = java.nio.file.Files.createTempDirectory("graft_recover_").toString + "/t"
    StreamingFeatures.mergeIntoKeyed(spark, out, t, Seq("time", "symbol", "trade_id"))
    val root = new java.io.File(out)
    val parts = root.listFiles().filter(_.getName.startsWith("part_date=")).sortBy(_.getName)
    val victim = parts.head
    val rowsBefore = spark.read.parquet(out).count()
    // simulate the between-renames crash: partition staged aside, swap never happened
    val gc = new java.io.File(root, s".compact_gc_${victim.getName}")
    assert(victim.renameTo(gc))
    // and a stale trash next to a LIVE partition (post-swap crash)
    val live = parts(1)
    val staleGc = new java.io.File(root, s".compact_gc_${live.getName}")
    assert(staleGc.mkdir())
    graft.operators.Lifecycle.recoverCompactionArtifacts(out)
    assert(victim.exists(), "orphaned trash must be restored as the live partition")
    assert(!gc.exists() && !staleGc.exists(), "no hidden leftovers after recovery")
    assert(spark.read.parquet(out).count() === rowsBefore, "no rows lost")
  }

  test("backfill repairs a deleted date partition and touches nothing else") {
    import graft.streaming.StreamingFeatures
    val t = core.Tables.trades(spark, sf0001)
    val out = java.nio.file.Files.createTempDirectory("graft_backfill_").toString + "/t"
    val full = graft.features.Ohlc.compute(t)
    StreamingFeatures.mergeIntoKeyed(spark, out, full, Seq("bucket", "symbol"))
    val expect = StreamingFeatures.readKeyedTable(spark, out)
      .orderBy("bucket", "symbol").collect()
    // destroy a middle partition
    val root = new java.io.File(out)
    val parts = root.listFiles().filter(_.getName.startsWith("part_date=")).sortBy(_.getName)
    val victim = parts(parts.length / 2)
    val victimDate = java.time.LocalDate.parse(victim.getName.stripPrefix("part_date="))
    import scala.reflect.io.Directory
    assert(new Directory(victim).deleteRecursively())
    // fingerprint every surviving partition's files
    def files(d: java.io.File) = d.listFiles().filter(_.isFile).map(f => f.getName -> f.length()).toMap
    val survivors = parts.filterNot(_ == victim).map(d => d.getName -> files(d)).toMap
    // backfill exactly the lost day
    val lo = victimDate.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    StreamingFeatures.backfillRange(spark, t, out,
      StreamingFeatures.sliced(graft.features.Ohlc.compute(_, _)),
      bucketSec = 60, keys = Seq("bucket", "symbol"),
      rawLo = lo.getEpochSecond * 1000000L,
      rawHi = lo.getEpochSecond * 1000000L + 86400L * 1000000L - 1)
    val repaired = StreamingFeatures.readKeyedTable(spark, out)
      .orderBy("bucket", "symbol").collect()
    assert(repaired.toSeq === expect.toSeq, "backfill must restore the table exactly")
    survivors.foreach { case (name, fp) =>
      assert(files(new java.io.File(root, name)) === fp, s"$name must stay byte-untouched")
    }
  }

  test("merge evolves the schema additively and rejects shrunken batches loudly") {
    import graft.streaming.StreamingFeatures
    val t = core.Tables.trades(spark, sf0001).limit(200)
    val out = java.nio.file.Files.createTempDirectory("graft_evolve_").toString + "/t"
    StreamingFeatures.mergeIntoKeyed(spark, out, t, Seq("time", "symbol", "trade_id"))
    val n0 = StreamingFeatures.readKeyedTable(spark, out).count()
    // evolve: the next batch carries a NEW column
    val evolved = t.limit(50).withColumn("venue", lit("X"))
    StreamingFeatures.mergeIntoKeyed(spark, out, evolved, Seq("time", "symbol", "trade_id"))
    val table = StreamingFeatures.readKeyedTable(spark, out)
    assert(table.columns.contains("venue"), "new column must survive the merge")
    assert(table.count() === n0, "upsert, not append")
    assert(table.filter(col("venue") === "X").count() === 50)
    assert(table.filter(col("venue").isNull).count() === n0 - 50,
      "pre-evolution rows read as null for the new column")
    // a batch MISSING an existing column must fail loudly, not null table data
    val shrunk = t.limit(10).drop("price")
    val e = intercept[IllegalArgumentException] {
      StreamingFeatures.mergeIntoKeyed(spark, out, shrunk, Seq("time", "symbol", "trade_id"))
    }
    assert(e.getMessage.contains("price"))
  }

  test("alert rules: for-duration holds, gaps break islands, boundary values do not fire") {
    import graft.quality.AlertRules
    // 30-min grid: minutes 0,30,60 violated (one island of 3), minute 120
    // violated after a healthy gap (island of 1), minute 150 at the
    // threshold exactly (not violated — Prometheus `>` semantics)
    val rows = Seq(
      (0, 10.0), (30, 10.0), (60, 10.0), (90, 1.0), (120, 10.0), (150, 5.0))
      .map { case (m, v) => (java.sql.Timestamp.valueOf(
        f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00"), "lat", v) }
    val metrics = rows.toDF("bucket", "metric", "value")
    val fired = AlertRules.evaluate(metrics,
      Seq(AlertRules.Rule("HighLat", "lat", 5.0, 2)), 1800)
      .collect()
    assert(fired.length === 1, "only the 3-bucket island sustains for >= 2")
    assert(fired(0).getAs[Long]("n_intervals") === 3L)
    assert(fired(0).getAs[java.sql.Timestamp]("starts_at").toString
      .startsWith("2024-01-01 00:00"))
    assert(fired(0).getAs[java.sql.Timestamp]("ends_at").toString
      .startsWith("2024-01-01 01:00"))
    // for: 1 also fires the isolated spike, never the boundary value
    val all = AlertRules.evaluate(metrics,
      Seq(AlertRules.Rule("HighLat", "lat", 5.0, 1)), 1800).collect()
    assert(all.length === 2)
  }

  test("lineage captures actual plan inputs and a schema-change-sensitive hash") {
    import graft.quality.Lineage
    val t = core.Tables.trades(spark, sf0001)
    val agg = t.groupBy("symbol").agg(count(lit(1)).as("n"))
    val e = Lineage.capture("q_test", agg, "/tmp/out/q_test")
    assert(e.inputs.exists(_.contains("events.parquet")),
      "input resolved from the analyzed plan, not declared")
    assert(e.columns === Seq("symbol" -> "string", "n" -> "bigint"))
    val e2 = Lineage.capture("q_test", agg.withColumn("x", lit(1)), "/tmp/out/q_test")
    assert(e.schemaHash !== e2.schemaHash, "schema facet hash detects evolution")
    val json = Lineage.toJson(e)
    assert(json.contains("\"eventType\":\"COMPLETE\"") && json.contains("q_test"))
    // emitted line is valid JSON for any downstream shipper
    assert(spark.read.json(Seq(json).toDS).columns.nonEmpty)
  }

  test("canary PnL simulation: buy/hold/sell ledger matches the reference by hand") {
    // 5 ticks, baseline signal path: buy@100, buy@101, sell@102, buy@103,
    // last tick's signal IGNORED (reference acts on range(len-1)), residual
    // 2 positions close at the last price 104.
    // ledger: -100 - 101 + 102 - 103 + 2·104 = +6. Canary never signals -> 0.
    val rows = Seq(
      (0L, "00", 100.0, 1, 0), (60L, "01", 101.0, 1, 0), (120L, "02", 102.0, -1, 0),
      (180L, "03", 103.0, 1, 0), (240L, "04", 104.0, -1, 0))
    val ticks = rows.map { case (mi, id, p, pb, pc) =>
      graft.serving.Canary.Tick("A", mi, id, math.round(p * 1e6), pb, pc)
    }
    // sell with no position must be a no-op: canary sells first
    val ticksB = Seq(
      graft.serving.Canary.Tick("B", 0L, "00", 50000000L, 0, -1),
      graft.serving.Canary.Tick("B", 60L, "01", 51000000L, 0, 1),
      graft.serving.Canary.Tick("B", 120L, "02", 52000000L, 0, 0))
    val ds = spark.createDataset(ticks ++ ticksB)(
      org.apache.spark.sql.Encoders.product[graft.serving.Canary.Tick])
    val out = graft.serving.Canary.simulateForTest(ds).collect()
      .map(p => p.symbol -> p).toMap
    assert(out("A").pnlBaseQ === 6000000L, "ledger -100-101+102-103+208 scaled 1e6")
    assert(out("A").pnlCanaryQ === 0L)
    // B: canary sell@50 ignored (no position), buy@51, close@52 -> +1
    assert(out("B").pnlCanaryQ === 1000000L)
    assert(out("B").pnlBaseQ === 0L)
  }

  test("corrupt schema sidecar degrades to mergeSchema instead of poisoning reads") {
    import graft.streaming.StreamingFeatures
    val t = core.Tables.trades(spark, sf0001).limit(100)
    val out = java.nio.file.Files.createTempDirectory("graft_sidecar_").toString + "/t"
    StreamingFeatures.mergeIntoKeyed(spark, out, t, Seq("time", "symbol", "trade_id"))
    val n0 = StreamingFeatures.readKeyedTable(spark, out).count()
    // simulate the pre-atomic-write crash artifact: a truncated sidecar
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "_schema.json"), "{\"type\":\"str".getBytes("UTF-8"))
    assert(StreamingFeatures.readKeyedTable(spark, out).count() === n0,
      "reads must fall back to mergeSchema on a corrupt sidecar")
    // the next merge heals the sidecar atomically (no temp residue)
    StreamingFeatures.mergeIntoKeyed(spark, out, t.limit(10), Seq("time", "symbol", "trade_id"))
    assert(StreamingFeatures.readKeyedTable(spark, out).count() === n0)
    assert(!new java.io.File(out, "._schema.json.tmp").exists(),
      "sidecar temp file must be renamed away")
    assert(spark.read.schema(core.Tables.trades(spark, sf0001).schema).json(
      s"$out/_schema.json").count() >= 0) // healed sidecar parses again
  }

  test("TypeIs resolves case-insensitively and errors loudly on a missing column") {
    import graft.quality.Expectations
    import graft.quality.Expectations.TypeIs
    val df = spark.range(3).selectExpr("CAST(id AS DOUBLE) AS Price")
    // analyzer-style resolution: 'price' must match the 'Price' column
    val row = Expectations.evaluate(df, Seq(TypeIs("price", "double"))).collect()(0)
    assert(row.getAs[Boolean]("price_type_ok"))
    val miss = intercept[IllegalArgumentException] {
      Expectations.evaluate(df, Seq(TypeIs("nope", "double")))
    }
    assert(miss.getMessage.contains("nope"))
  }

  test("chi2 drift tiers: flat series is ok, planted flip is critical") {
    import graft.quality.Chi2Drift
    def frame(secondHalfBuys: Int, secondHalfSells: Int) = {
      val firstHalf = (0 until 100).map(i =>
        (new java.sql.Timestamp(1704067200000L + i * 1000L),
          if (i % 2 == 0) "buy" else "sell"))
      val secondHalf =
        (0 until secondHalfBuys).map(i =>
          (new java.sql.Timestamp(1704067200000L + 200000L + i * 1000L), "buy")) ++
          (0 until secondHalfSells).map(i =>
            (new java.sql.Timestamp(1704067200000L + 200000L + (secondHalfBuys + i) * 1000L), "sell"))
      (firstHalf ++ secondHalf).toDF("time", "side")
    }
    // same 50/50 mix in both halves: no drift
    val flat = Chi2Drift.compute(frame(50, 50), "time", "side").collect()(0)
    assert(flat.getAs[String]("severity") === "ok")
    assert(flat.getAs[Long]("dof") === 1L)
    // buy-only second half: maximal categorical drift
    val flipped = Chi2Drift.compute(frame(100, 0), "time", "side").collect()(0)
    assert(flipped.getAs[String]("severity") === "critical")
    assert(flipped.getAs[Double]("chi2") > 6.635)
  }

  test("donchian channel brackets the price and uses the n-tick frame") {
    val out = Risk.donchian(rampTrades(30), n = 5).orderBy("time").collect()
    assert(out.forall { r =>
      r.getAs[Double]("dc_low") <= r.getAs[Double]("price") &&
        r.getAs[Double]("price") <= r.getAs[Double]("dc_high")
    })
    // ramp: dc_high = current price, dc_low = price 4 ticks back (clamped)
    val last = out.last
    assert(last.getAs[Double]("dc_high") === last.getAs[Double]("price"))
    assert(math.abs(last.getAs[Double]("dc_low") - (last.getAs[Double]("price") - 0.4)) < 1e-9)
  }
}
