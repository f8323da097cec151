package graft

import java.io.File
import java.nio.file.Files

import graft.sources.{CommitStore, DataStore, LocalDataStore,
  ObjectModelDataStore, VersionedTable, VersionedTableOps}

import org.apache.spark.sql.functions._

/** The data-plane seam ([[graft.sources.DataStore]]): both first-party
  * implementations must satisfy the same primitive contracts, and the
  * FULL versioned-table lifecycle — commit, scoped optimize (staged-dir
  * promotion), compaction (dir sizing), clone (tree link/copy), vacuum
  * (listing + mtime + deletes) — must run unchanged through the NO-RENAME
  * object model, proving the table protocol never leans on POSIX-only
  * semantics (the data-plane twin of CommitStore's InMemory/exclusive-
  * create proof for the commit plane).
  */
class DataStoreSpec extends SparkTestBase {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ds_").toString

  private val impls: Seq[(String, DataStore)] = Seq(
    "local" -> new LocalDataStore,
    "objectModel" -> new ObjectModelDataStore)

  for ((name, ds) <- impls) {
    test(s"$name: create/open/list/exists/size/delete primitives") {
      val root = freshRoot()
      assert(ds.list(root, "nope").isEmpty)
      assert(!ds.exists(root, "nope"))
      val os = ds.create(root, "side/a.bin")
      os.write(Array[Byte](1, 2, 3)); os.close()
      assert(ds.exists(root, "side/a.bin"))
      val is = ds.open(root, "side/a.bin").get
      val read = try Iterator.continually(is.read()).takeWhile(_ >= 0).toSeq
      finally is.close()
      assert(read == Seq(1, 2, 3))
      assert(ds.open(root, "side/missing.bin").isEmpty)
      val entries = ds.list(root, "side")
      assert(entries.map(e => (e.name, e.isFile, e.length)) ==
        Seq(("a.bin", true, 3L)))
      assert(ds.sizeOfDir(root, "side") == 3L)
      assert(ds.modifiedMs(root, "side/a.bin") > 0L)
      ds.deleteFile(root, "side/a.bin")
      assert(!ds.exists(root, "side/a.bin"))
      ds.deleteFile(root, "side/a.bin") // absent: no-op, no throw
    }

    test(s"$name: promoteDir moves a staged flat dir; cloneTree copies") {
      val root = freshRoot()
      Seq("p1", "p2").foreach { n =>
        val os = ds.create(root, s"data/.staged/$n")
        os.write(n.getBytes("UTF-8")); os.close()
      }
      ds.promoteDir(root, "data/.staged", "data/final")
      assert(!ds.exists(root, "data/.staged"))
      assert(ds.list(root, "data/final").map(_.name).sorted == Seq("p1", "p2"))
      val dst = freshRoot()
      ds.cloneTree(root, "data/final", dst, "data/final")
      assert(ds.list(dst, "data/final").map(_.name).sorted == Seq("p1", "p2"))
      // clone is independent bytes-wise under BOTH impls for deletes:
      ds.deleteTree(root, "data/final")
      assert(!ds.exists(root, "data/final"))
      assert(ds.list(dst, "data/final").size == 2)
    }
  }

  test("objectModel: full versioned lifecycle, zero renames/links possible") {
    // Every verb that touches the data plane, against the no-rename store:
    // commit (bloom sidecars), scoped zorder (staging promote), scoped
    // compaction (dir sizing + staged dir), shallow clone (tree copy),
    // MOR delete + purge, vacuum (listing, mtime, recursive deletes).
    val ops = new VersionedTableOps(CommitStore.local, DataStore.objectModel)
    val root = freshRoot()
    Seq((0L, 100L), (100L, 200L), (200L, 300L)).foreach { case (lo, hi) =>
      ops.commit(spark.range(lo, hi).toDF("id")
        .withColumn("v", col("id") * 2), root, "append",
        statsCols = Seq("id"), bloomCols = Seq("id"))
    }
    val expect = (0L until 300L).map(i => (i, i * 2)).sortBy(_._1)
    def contents(o: VersionedTableOps, r: String) =
      o.read(spark, r).select("id", "v").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq

    // scoped z-order of the low range: staged __zdir buckets promote
    // via copy+delete, dismissed dirs carried by name
    ops.optimizeZorder(spark, root,
      Seq(col("id") -> 300L, col("v") -> 600L), nDirs = 2,
      statsCols = Seq("id"), where = Some(col("id") < 100))
    assert(contents(ops, root) == expect)

    // scoped compaction via dir sizing (everything is tiny at this SF)
    val vCompact = ops.compactSmallDirs(spark, root, maxBytes = Long.MaxValue / 2)
    assert(vCompact > 0 && contents(ops, root) == expect)

    // shallow clone: byte copies instead of hard links
    val cloneRoot = freshRoot()
    ops.cloneTo(spark, root, cloneRoot)
    assert(contents(ops, cloneRoot) == expect)

    // MOR delete + purge (staged rewrite dir promote, dv dirs)
    ops.deleteMor(spark, root, col("id") >= 290)
    ops.purgeDeletes(spark, root)
    assert(contents(ops, root) == expect.filter(_._1 < 290))

    // vacuum reaps the rewritten history through the seam
    val reaped = ops.vacuum(root, retainLast = 1, orphanGraceMs = 0L)
    assert(reaped.nonEmpty)
    assert(contents(ops, root) == expect.filter(_._1 < 290))
    // the clone must be untouched by the source's vacuum
    assert(contents(ops, cloneRoot) == expect)
  }

  test("both impls agree byte-for-byte on a promoted sidecar") {
    val payload = Array.tabulate[Byte](1024)(i => (i % 127).toByte)
    val outs = impls.map { case (_, ds) =>
      val root = freshRoot()
      val os = ds.create(root, "_blooms/x.bloom")
      os.write(payload); os.close()
      Files.readAllBytes(new File(root, "_blooms/x.bloom").toPath).toSeq
    }
    assert(outs.distinct.size == 1 && outs.head == payload.toSeq)
  }
}
