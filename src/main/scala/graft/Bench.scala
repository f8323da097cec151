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
  * q_ohlc_refresh). SPARK_GRAFT_BENCH_REPS>1 reports the per-query MEDIAN of
  * that many runs. The full-precision artifact is also written to
  * BENCH_FULL.json (stdout tail captures can truncate the compact line).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM + FS cache so query 1 doesn't pay session startup.
    graft.core.Tables.lineitem(spark, sfDir).count()

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
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
    val results = (light ++ heavy).map { case (name, fn) =>
      name -> median((1 to reps).map(_ => runOnce(name, fn)))
    }
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
    // filtered local runs skip the serving-path sweeps
    val pitWarm = if (only.isEmpty) warmStats("q_pit_snapshot", 20)
      else Map("p50_sec" -> -1.0, "p95_sec" -> -1.0,
        "prepared_p50_sec" -> -1.0, "prepared_p95_sec" -> -1.0, "n" -> 0.0)
    val onlineWarm = if (only.isEmpty) warmStats("q_online_features", 10) else pitWarm

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
      s"""{"metric":"total","value":${f(total)},"unit":"sec","reps":$reps,""" +
        s""""queries":$qs,"pit_warm":${warmJson(pitWarm, f)},""" +
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
        s""""n_queries":${results.length},"queries":$slowest,""" +
        s""""pit_warm":${warmJson(pitWarm, sig3)},""" +
        s""""online_warm":${warmJson(onlineWarm, sig3)},""" +
        s""""sf":"${new java.io.File(sfDir).getName}","queries_full":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
