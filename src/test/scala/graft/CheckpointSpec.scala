package graft

import java.nio.file.Files

import graft.sources.{CommitStore, VersionedTable, VersionedTableOps}
import org.apache.spark.sql.functions._

/** Manifest-log checkpointing (`_checkpoint/v%05d`, Delta's
  * `_last_checkpoint` shape): every Nth commit rolls a per-version
  * history summary forward so DESCRIBE HISTORY / `graft_table_history` /
  * wall-clock time travel read ONE checkpoint + O(tail) manifests
  * instead of parsing every manifest ever committed. The checkpoint is a
  * cache — losing it costs a longer walk, never correctness.
  */
class CheckpointSpec extends SparkTestBase {

  /** A CommitStore that counts manifest GETs — the probe that proves a
    * summary walk reads O(tail), not O(versions).
    */
  private class CountingStore(inner: CommitStore) extends CommitStore {
    val gets = new java.util.concurrent.atomic.AtomicInteger(0)
    override def putIfAbsent(root: String, version: Int, body: String): Boolean =
      inner.putIfAbsent(root, version, body)
    override def get(root: String, version: Int): Option[String] = {
      gets.incrementAndGet(); inner.get(root, version)
    }
    override def versions(root: String): Seq[Int] = inner.versions(root)
    override def delete(root: String, version: Int): Unit =
      inner.delete(root, version)
  }

  private def build(n: Int): String = {
    val root = Files.createTempDirectory("graft_ckpt_").toString
    (0 until n).foreach(i => VersionedTable.commit(
      spark.range(i * 2L, i * 2L + 2L).toDF("id"), root, "append"))
    root
  }

  test("historySummary reads O(tail) manifests past a checkpoint") {
    val root = build(34) // checkpoints at v10, v20, v30
    assert(new java.io.File(root, "_checkpoint/v00030").isFile,
      "every 10th commit must roll the checkpoint forward")
    val counting = new CountingStore(CommitStore.local)
    val ops = new VersionedTableOps(counting)
    val summary = ops.historySummary(root)
    assert(summary.map(_.version) === (1 to 34))
    assert(summary.forall(_.operation == "append"))
    assert(summary.forall(_.rows == 2L))
    // the probe: 4 tail manifests (31..34), not 34
    assert(counting.gets.get() <= 6,
      s"summary walked ${counting.gets.get()} manifests for a 34-commit table " +
        "(expected O(tail) past the v30 checkpoint)")
    // and the summary equals the full-walk ground truth, field by field
    val full = ops.history(root).map(s => (s.version, s.operation, s.rows,
      s.committedMs, s.dataDirs.size, s.cdfDir.isDefined))
    assert(summary.map(e => (e.version, e.operation, e.rows, e.committedMs,
      e.nDirs, e.hasCdf)) === full)
  }

  test("DESCRIBE HISTORY and wall-clock time travel ride the summary") {
    val ss = SqlCatalogSpec.session(spark)
    val root = build(23)
    val t = s"ckpt_sql_${System.nanoTime()}"
    ss.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    val hist = ss.sql(s"DESCRIBE HISTORY $t").collect()
    assert(hist.length === 23)
    assert(hist.head.getLong(0) === 23L) // newest first
    // wall-clock travel resolves through summaries to a readable version
    val tsOfV5 = VersionedTable.snapshot(root, 5).committedMs
    assert(VersionedTable.versionAsOf(root, tsOfV5) === Some(5))
    ss.sql(s"DROP TABLE $t")
  }

  test("history SURVIVES vacuum through the checkpoint; travel stays readable") {
    val root = build(25) // periodic checkpoints at 10, 20
    VersionedTable.vacuum(root, retainLast = 3)
    // manifests 1..22 are gone, but EVERY version keeps its summary:
    // vacuum rolls a checkpoint at the tip (v25) before deleting
    // manifests, so even 21/22 — past the last periodic checkpoint —
    // survive (the r15 gap: they used to be silently unknowable)
    val versions = VersionedTable.historySummary(root).map(_.version)
    assert(versions === (1 to 25))
    // versionAsOf never picks a vacuumed (unreadable) version
    val tsOfV15 = VersionedTable.historySummary(root)
      .find(_.version == 15).get.committedMs
    val picked = VersionedTable.versionAsOf(root, tsOfV15)
    assert(picked === None || picked.exists(_ >= 23),
      s"versionAsOf picked unreadable $picked")
    // superseded checkpoints are GC'd; the vacuum-time rollup survives
    val cps = Option(new java.io.File(root, "_checkpoint").listFiles())
      .toSeq.flatten.map(_.getName).sorted
    assert(cps === Seq("v00025"))
  }

  test("a mid-stream changefeed drain reads O(delta) manifests, not O(versions)") {
    import org.apache.spark.sql.streaming.Trigger
    val root = build(30)
    val ckpt = Files.createTempDirectory("graft_ckpt_feed_").toString
    def drain(): Long = {
      var n = 0L
      val q = spark.readStream.format("graft-changefeed")
        .option("root", root).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          n += b.count(); ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      n
    }
    assert(drain() === 60L) // catch-up: the whole corpus
    VersionedTable.commit(spark.range(100, 103).toDF("id"), root, "append")
    // the delta drain: offsets resume at v30; only v31's manifest (and
    // its parent, for the dir diff) are parsed — probe with the counter
    val counting = new CountingStore(CommitStore.local)
    val ops = new VersionedTableOps(counting)
    val delta = ops.changes(spark, root, 30, 31)
    assert(delta.count() === 3L)
    assert(counting.gets.get() <= 3,
      s"a 1-commit delta parsed ${counting.gets.get()} manifests")
    assert(drain() === 3L)
  }
}
