package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned table: an immutable-data, commit-log storage layer
  * giving snapshot isolation, time travel, optimistic concurrency and
  * vacuum over plain parquet — the lakehouse transaction shape (the
  * reference delegates this to TimescaleDB's MVCC; on an object store
  * there is no MVCC, only immutable files plus a log, which is what this
  * implements).
  *
  * Layout:
  * {{{
  *   <root>/data/v00003/part-*.parquet    # one immutable dir per commit
  *   <root>/_commits/v00003.manifest      # line-oriented snapshot manifest
  * }}}
  *
  * A snapshot manifest lists the data DIRS composing the version (append
  * accumulates the parent's dirs; overwrite starts fresh), so a reader
  * resolves ONE small file and then touches only the listed dirs — never a
  * recursive listing of a 100 TB table. Commit protocol: (1) write the new
  * data dir (its name embeds the target version — a crashed attempt leaves
  * an orphan dir that the next attempt overwrites and vacuum removes);
  * (2) write the manifest to a temp name and ATOMIC-RENAME onto
  * `v%05d.manifest` with no-replace semantics — if the target exists, a
  * concurrent writer won and the commit fails with a conflict (optimistic
  * concurrency, single-winner per version, retry-able by re-reading
  * `latestVersion`). Readers pin a manifest, so a concurrent vacuum with
  * `retainLast >= 1` never deletes files under a retained version they
  * could be reading.
  *
  * Scale notes: commit cost is O(batch) + two small metadata writes;
  * time-travel read cost is O(files in that snapshot); vacuum is
  * O(versions) metadata + file deletes, data-free. Nothing scans the table.
  */
object VersionedTable {

  final case class Snapshot(
      version: Int,
      parent: Int,
      operation: String,
      rows: Long,
      schemaCols: Seq[String],
      dataDirs: Seq[String],
      committedMs: Long = 0L)

  final class CommitConflictException(version: Int)
    extends RuntimeException(
      s"commit conflict: version $version was committed concurrently; " +
        "re-read latestVersion and retry")

  private def commitsDir(root: String) = new File(root, "_commits")
  private def dataDir(root: String) = new File(root, "data")
  private def manifestFile(root: String, v: Int) =
    new File(commitsDir(root), f"v$v%05d.manifest")
  private def versionDirName(v: Int) = f"data/v$v%05d"

  /** Highest committed version, or None for an empty/absent table. */
  def latestVersion(root: String): Option[Int] = {
    val dir = commitsDir(root)
    if (!dir.isDirectory) None
    else {
      val vs = dir.listFiles((_, n) => n.matches("v\\d{5}\\.manifest"))
        .map(f => f.getName.substring(1, 6).toInt)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Parse one snapshot manifest. */
  def snapshot(root: String, version: Int): Snapshot = {
    val f = manifestFile(root, version)
    require(f.isFile, s"no such version $version at $root")
    val kv = Files.readAllLines(f.toPath, StandardCharsets.UTF_8)
    var parent = -1; var op = ""; var rows = 0L; var ms = 0L
    var cols = Seq.empty[String]; val dirs = Seq.newBuilder[String]
    kv.forEach { line =>
      line.split("=", 2) match {
        case Array("parent", v)       => parent = v.toInt
        case Array("operation", v)    => op = v
        case Array("rows", v)         => rows = v.toLong
        case Array("committed_ms", v) => ms = v.toLong
        case Array("schema", v)       => cols = v.split(",").toSeq.filter(_.nonEmpty)
        case Array("dir", v)          => dirs += v
        case _                        => () // version= line, comments, unknown keys
      }
    }
    Snapshot(version, parent, op, rows, cols, dirs.result(), ms)
  }

  /** All snapshots, oldest first. */
  def history(root: String): Seq[Snapshot] =
    latestVersion(root).toSeq.flatMap(latest => (1 to latest).flatMap { v =>
      if (manifestFile(root, v).isFile) Some(snapshot(root, v)) else None
    })

  /** Commit `df` as the next version. `mode` is "append" (snapshot = parent
    * dirs + new dir) or "overwrite" (snapshot = new dir only). Returns the
    * committed version number; throws [[CommitConflictException]] if another
    * writer claimed the target version first — detected both up front
    * (`expectedVersion`, the CAS form: pass `latestVersion(root) + 1` as
    * read at transaction start) and at the atomic link (defense in depth
    * against the read-to-link window).
    */
  def commit(df: DataFrame, root: String, mode: String = "append",
      expectedVersion: Option[Int] = None): Int = {
    require(mode == "append" || mode == "overwrite", s"bad mode $mode")
    val parent = latestVersion(root)
    val version = parent.getOrElse(0) + 1
    expectedVersion.filter(_ != version)
      .foreach(e => throw new CommitConflictException(e))
    commitsDir(root).mkdirs()
    dataDir(root).mkdirs()

    // (1) data: an immutable dir named for the target version. A previous
    // crashed attempt at this version left only an orphan dir (no manifest)
    // — Overwrite replaces it wholesale, which is the self-heal.
    val newDir = versionDirName(version)
    df.write.mode("overwrite").parquet(new File(root, newDir).getPath)
    val rows = df.sparkSession.read.parquet(new File(root, newDir).getPath).count()

    val parentDirs = parent match {
      case Some(p) if mode == "append" => snapshot(root, p).dataDirs
      case _                           => Seq.empty
    }
    val dirs = parentDirs :+ newDir

    // (2) log: temp file + atomic no-replace rename = the commit point.
    val body = new StringBuilder()
      .append(s"version=$version\n")
      .append(s"parent=${parent.getOrElse(0)}\n")
      .append(s"operation=$mode\n")
      .append(s"rows=$rows\n")
      .append(s"committed_ms=${System.currentTimeMillis()}\n")
      .append(s"schema=${df.columns.mkString(",")}\n")
    dirs.foreach(d => body.append(s"dir=$d\n"))
    // POSIX rename() silently REPLACES an existing target, so a rename is
    // not a conflict detector. A hard link is both atomic and
    // fail-if-exists: the full manifest becomes visible in one step, and
    // EEXIST means another writer claimed this version first.
    val tmp = Paths.get(commitsDir(root).getPath,
      s".v$version.tmp${Thread.currentThread().getId}")
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8))
    try Files.createLink(manifestFile(root, version).toPath, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(version)
    } finally Files.deleteIfExists(tmp)
    version
  }

  /** Read a snapshot (default: latest). Only the manifest's dirs are read —
    * orphan dirs from crashed commits and vacuumed history are invisible.
    */
  def read(spark: SparkSession, root: String, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, v)
    require(snap.dataDirs.nonEmpty, s"version $v has no data dirs")
    // mergeSchema: commits may evolve the schema additively; without it,
    // one arbitrary footer wins and later columns silently VANISH. The
    // union schema (nulls for pre-evolution rows) is the same additive
    // discipline as mergeIntoKeyed's; cost is one footer per dir.
    spark.read.option("mergeSchema", "true")
      .parquet(snap.dataDirs.map(d => new File(root, d).getPath): _*)
  }

  /** Idempotent commit targeting a SPECIFIC version — the exactly-once
    * streaming sink primitive. Micro-batch N maps deterministically to
    * version N+1; an at-least-once replay of batch N finds its version
    * already committed and becomes a no-op. Returns true iff this call
    * committed (false = the version already existed — replay absorbed).
    */
  def idempotentCommit(df: DataFrame, root: String, version: Int,
      mode: String = "append"): Boolean = {
    if (manifestFile(root, version).isFile) return false
    try { commit(df, root, mode, expectedVersion = Some(version)); true }
    catch { case _: CommitConflictException => false }
  }

  /** Latest version committed at or before `tsMs` (wall-clock time travel:
    * `read(spark, root, versionAsOf(root, ts))`). None if the table's first
    * commit is later than `tsMs`.
    */
  def versionAsOf(root: String, tsMs: Long): Option[Int] = {
    val eligible = history(root).filter(_.committedMs <= tsMs)
    if (eligible.isEmpty) None else Some(eligible.map(_.version).max)
  }

  /** Roll the table back: a new commit whose content is exactly version
    * `v`'s snapshot (history preserved — a RESTORE, not a reset; the bad
    * versions stay auditable until vacuumed).
    */
  def restore(spark: SparkSession, root: String, v: Int): Int =
    commit(read(spark, root, Some(v)), root, "overwrite")

  /** Compact the latest snapshot into one fresh dir — an overwrite commit
    * with identical content (the OPTIMIZE analogue for a table fragmented
    * by many small appends). History stays readable until vacuumed; the
    * new version reads O(1) dirs instead of O(appends).
    */
  def compact(spark: SparkSession, root: String): Int =
    commit(read(spark, root), root, "overwrite")

  /** Change feed: rows ADDED between `fromVersion` (exclusive) and
    * `toVersion` (inclusive) — the input of O(delta) incremental
    * maintenance. Valid only across append commits: an overwrite in the
    * range replaces the snapshot wholesale (its delta is not additive), so
    * it fails loudly rather than feeding a consumer rows that were also
    * retracted. Reads ONLY the dirs the range added — cost is O(delta),
    * never O(table).
    */
  def changes(spark: SparkSession, root: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion >= 0 && toVersion > fromVersion,
      s"bad change range ($fromVersion, $toVersion]")
    val snaps = (fromVersion + 1 to toVersion).map(snapshot(root, _))
    snaps.filter(_.operation != "append") match {
      case bad if bad.nonEmpty =>
        throw new IllegalArgumentException(
          s"change feed crosses non-append versions ${bad.map(_.version).mkString(",")}: " +
            "an overwrite replaces the snapshot; re-derive consumers from it")
      case _ => ()
    }
    val baseDirs: Set[String] =
      if (fromVersion == 0) Set.empty else snapshot(root, fromVersion).dataDirs.toSet
    val added = snaps.last.dataDirs.filterNot(baseDirs.contains)
    require(added.nonEmpty, s"no data added in ($fromVersion, $toVersion]")
    spark.read.parquet(added.map(d => new File(root, d).getPath): _*)
  }

  /** Delete data dirs referenced ONLY by versions older than the retained
    * window (last `retainLast` versions), plus orphan dirs from crashed
    * commits, and their manifests. Returns the deleted dir names.
    */
  def vacuum(root: String, retainLast: Int = 2): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    val latest = latestVersion(root).getOrElse(return Seq.empty)
    val cutoff = latest - retainLast + 1
    val retainedDirs = (cutoff to latest)
      .filter(v => manifestFile(root, v).isFile)
      .flatMap(v => snapshot(root, v).dataDirs).toSet
    val live = dataDir(root).listFiles().toSeq.filter(_.isDirectory)
      .map(d => "data/" + d.getName)
    val doomed = live.filterNot(retainedDirs.contains)
    doomed.foreach { d =>
      val dir = new File(root, d)
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
    (1 until cutoff).foreach(v => manifestFile(root, v).delete())
    doomed.sorted
  }
}
