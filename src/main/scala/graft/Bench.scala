package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall seconds.
  *
  * Timing is sink-based (`noop` datasource write): the full plan executes —
  * every column materializes — unlike `.count()`, which lets Catalyst prune
  * all columns and skip most work for some query shapes. Failed queries are
  * reported as -1 and EXCLUDED from the headline total.
  *
  * Isolation/ordering: the heavyweight stateful queries (streaming replays,
  * refresh/merge pipelines — temp tables, state stores, GC pressure) run
  * LAST so they cannot perturb the light declarative queries' numbers (the
  * round-3 2–5× "regressions" were exactly the alphabetical suffix after
  * q_ohlc_refresh). EVERY query runs SPARK_GRAFT_BENCH_REPS times
  * (default 3) and reports its min-of-N — noise is strictly additive, so
  * min is the robust per-query wall-time statistic, and fleet-wide reps
  * make a 2× swing on ANY query attributable (a single observation can't
  * distinguish a regression from a scheduler hiccup). The full-precision
  * artifact is also written to BENCH_FULL.json (stdout tail captures can
  * truncate the compact line).
  *
  * Attribution: `calibration_sec` is a fixed-work corpus-independent probe
  * (machine speed that run), `total_per_calib` the machine-normalized
  * headline, and `plans` a per-query canonicalized-plan fingerprint — a
  * timing swing with an unchanged fingerprint is environmental, a changed
  * fingerprint names the plan that moved.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // UTC + INT64-micros parquet come from the ONE engine-defaults site
    // (graft.core.EngineSession — the footer-stats fast path depends on it)
    val spark = graft.core.EngineSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM + FS cache so query 1 doesn't pay session startup —
    // both fact tables, or whichever query sorts first alphabetically
    // absorbs the cold read of its table into its own number.
    graft.core.Tables.lineitem(spark, sfDir).count()
    graft.core.Tables.events(spark, sfDir).count()

    // Fixed-work calibration anchor: a corpus-independent CPU+scheduler probe
    // (4e9-element hashed sum fanned across the worker threads). Official
    // bench totals have swung 576 s / 888 s / crash across rounds on
    // byte-identical binaries; this number attributes such swings — if
    // calibration_sec moves with the total, the machine moved, not the code.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      // modulo before multiply keeps every term far from Long range (ANSI
      // overflow would kill the run)
      spark.range(0L, 4000000000L, 1, cpus.toInt)
        .selectExpr("sum((id % 1048576) * 31) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // Fixed-work I/O calibration: write a corpus-independent 4M-row
    // two-column parquet dir to the bench tmp filesystem and read it
    // back. The CPU probe above CANNOT see I/O-side environment drift —
    // the r15 A/B showed the r13 BINARY running 1.2-1.9x its official
    // numbers at a FASTER cpu calibration, with the delta concentrated
    // in parquet write phases (vt.commit.write) — so the headline needs
    // BOTH anchors: a swing that tracks io_calibration_sec is
    // filesystem/environment, not code.
    def calibrateIo(): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft_iocal_").toString
      val t0 = System.nanoTime()
      spark.range(0L, 4000000L, 1, cpus.toInt)
        .selectExpr("id", "cast(id % 9973 as double) AS v")
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).selectExpr("sum(v)").collect()
      val dt = (System.nanoTime() - t0) / 1e9
      try {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
        }
        rm(new java.io.File(dir))
      } catch { case _: Throwable => () }
      dt
    }

    // Per-query (seconds, plan fingerprint). The fingerprint hashes the
    // canonicalized optimized plan (expression IDs normalized), so a timing
    // swing with an UNCHANGED fingerprint is environmental, and a changed
    // fingerprint points at the plan diff — no more unattributable swings.
    // Per-run temp paths (/tmp/graft_<kind>_<rand>) are normalized before
    // hashing — without this, exactly the heavy stream/refresh queries that
    // read their replay output back from a fresh temp dir would show a
    // "changed" fingerprint every run, defeating the env-vs-plan signal.
    def planHash(df: org.apache.spark.sql.DataFrame): String =
      try java.security.MessageDigest.getInstance("MD5")
        .digest(df.queryExecution.optimizedPlan.canonicalized.toString
          .replaceAll("/tmp/graft_[A-Za-z0-9_]+", "/tmp/graft_NORM")
          .getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      catch { case _: Throwable => "unavailable" }

    // Composite queries record sub-phase timings through BenchProbe
    // (`<query>.seed` / `<query>.refresh`) so harness setup and the
    // operator under test are separately attributable; drained per run.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, String, Map[String, Double]) = {
      BenchProbe.drain() // discard any residue from a prior failed run
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, planHash(df), BenchProbe.drain())
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (-1.0, "failed", Map.empty)
      }
    }
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0
      else {
        val s = ok.sorted
        val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
      }
    }
    def minOk(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }

    // Stateful/streaming pipelines last; light queries first, alphabetical
    // within each group for stable comparisons across rounds.
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run (local iteration).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val (heavy, light) = all.partition { case (n, _) =>
      n.startsWith("q_stream_") || n.endsWith("_refresh")
    }
    val calibration = median((1 to 3).map(_ => calibrate()))
    val ioCalibration = median((1 to 3).map(_ => calibrateIo()))
    val timed = (light ++ heavy).map { case (name, fn) =>
      val runs = (1 to reps).map(_ => runOnce(name, fn))
      // min-of-reps per PHASE, same statistic as the per-query wall time
      val phaseMaps = runs.map(_._3).filter(_.nonEmpty)
      val phases =
        if (phaseMaps.isEmpty) Map.empty[String, Double]
        else phaseMaps.flatMap(_.keySet).distinct
          .map(k => k -> phaseMaps.flatMap(_.get(k)).min).toMap
      (name, minOk(runs.map(_._1)), runs.last._2, phases)
    }
    val results = timed.map { case (name, sec, _, _) => name -> sec }
    val plans = timed.map { case (name, _, h, _) => name -> h }
    // phase keys are prefixed with their query so the artifact stays
    // attributable when two queries share a kernel phase (vt.commit.*)
    val phases = timed.flatMap { case (name, _, _, ph) =>
      ph.map { case (k, v) => s"$name::$k" -> v }
    }.sortBy(_._1)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum

    // Warm serving-path latency, the shape the reference benchmarks
    // (scripts/benchmark_performance.py:26-119: repeated feature_pit_snapshot
    // / online-read calls, p50/p95 over iterations). Each iteration rebuilds
    // and executes the full query (plan + run), as the reference's function
    // call does.
    def warmStats(name: String, iters: Int): Map[String, Double] = {
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach(_ => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      // nearest-rank percentile: index ceil(n*p/100) - 1
      def pct(ts: Seq[Double], p: Int) =
        ts.sorted.apply((math.ceil(ts.length * p / 100.0).toInt - 1).max(0))
      // cold-plan: build + analyze + optimize + execute per call
      val full = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // prepared-plan: physical plan built once, executed per call — the
      // analogue of the reference's plpgsql function (parsed/planned once)
      val rdd = fn(spark, sfDir).queryExecution.toRdd
      rdd.count()
      val prepared = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        rdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      Map(
        "p50_sec" -> pct(full, 50), "p95_sec" -> pct(full, 95),
        "prepared_p50_sec" -> pct(prepared, 50),
        "prepared_p95_sec" -> pct(prepared, 95),
        "n" -> iters.toDouble)
    }
    // filtered local runs skip the serving-path sweeps unless the filter
    // names the serving query itself
    val skipped = Map("p50_sec" -> -1.0, "p95_sec" -> -1.0,
      "prepared_p50_sec" -> -1.0, "prepared_p95_sec" -> -1.0, "n" -> 0.0)
    val pitWarm = if (only.forall(_.contains("q_pit_snapshot")))
      warmStats("q_pit_snapshot", 20) else skipped
    val onlineWarm = if (only.forall(_.contains("q_online_features")))
      warmStats("q_online_features", 10) else skipped

    // 3-significant-digit values keep the stdout line inside small tail
    // captures; the full-precision copy goes to BENCH_FULL.json.
    def sig3(v: Double): String =
      if (v == v.toLong.toDouble) v.toLong.toString
      else java.math.BigDecimal.valueOf(v).round(new java.math.MathContext(3)).toPlainString
    def warmJson(m: Map[String, Double], f: Double => String): String =
      Seq("p50_sec", "p95_sec", "prepared_p50_sec", "prepared_p95_sec", "n")
        .map(k => "\"" + k + "\":" + (if (k == "n") m(k).toLong.toString else f(m(k))))
        .mkString("{", ",", "}")
    def line(f: Double => String, sf: String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
      val ps = plans.map { case (k, h) => "\"" + k + "\":\"" + h + "\"" }.mkString("{", ",", "}")
      val phs = phases.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${f(total)},"unit":"sec","reps":$reps,""" +
        s""""stat":"min_of_$reps",""" +
        s""""calibration_sec":${f(calibration)},""" +
        s""""io_calibration_sec":${f(ioCalibration)},""" +
        s""""total_per_calib":${f(if (calibration > 0) total / calibration else -1.0)},""" +
        s""""queries":$qs,"plans":$ps,"phases":$phs,""" +
        s""""pit_warm":${warmJson(pitWarm, f)},""" +
        s""""online_warm":${warmJson(onlineWarm, f)},"sf":"$sf"}"""
    }

    val full = line(_.toString, sfDir)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (full + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }

    println(line(sig3, new java.io.File(sfDir).getName))
    // The full per-query line above can overflow small stdout tail captures
    // (its head gets cut, making it unparseable). Emit a LAST line that is
    // always short: headline total + warm stats + only the 10 slowest
    // queries; the complete per-query map lives in BENCH_FULL.json.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + sig3(v) }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${sig3(total)},"unit":"sec","reps":$reps,""" +
        s""""calibration_sec":${sig3(calibration)},""" +
        s""""io_calibration_sec":${sig3(ioCalibration)},""" +
        s""""total_per_calib":${sig3(if (calibration > 0) total / calibration else -1.0)},""" +
        s""""n_queries":${results.length},"queries":$slowest,""" +
        s""""pit_warm":${warmJson(pitWarm, sig3)},""" +
        s""""online_warm":${warmJson(onlineWarm, sig3)},""" +
        s""""sf":"${new java.io.File(sfDir).getName}","queries_full":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
