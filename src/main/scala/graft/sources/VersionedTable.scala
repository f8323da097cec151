package graft.sources

import java.io.File
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, broadcast, coalesce, col, count, countDistinct, inline, lit, max, min, struct, sum, unix_micros, when}
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Minimal versioned table: an immutable-data, commit-log storage layer
  * giving snapshot isolation, time travel, optimistic concurrency and
  * vacuum over plain parquet — the lakehouse transaction shape (the
  * reference delegates this to TimescaleDB's MVCC; on an object store
  * there is no MVCC, only immutable files plus a log, which is what this
  * implements).
  *
  * Layout:
  * {{{
  *   <root>/data/v00003-9f2c41aa/part-*.parquet  # one immutable dir per ATTEMPT
  *   <root>/_commits/v00003.manifest             # line-oriented snapshot manifest
  * }}}
  *
  * A snapshot manifest lists the data DIRS composing the version (append
  * accumulates the parent's dirs; overwrite starts fresh), so a reader
  * resolves ONE small file and then touches only the listed dirs — never a
  * recursive listing of a 100 TB table.
  *
  * Commit protocol: (1) write the new data dir under a name UNIQUE to this
  * attempt (version prefix for readability + a random token) — data files
  * need no atomicity because nothing references them yet, and two racing
  * writers can never clobber each other's files; (2) publish the manifest
  * through the [[CommitStore]] conditional put, which is the single atomic
  * commit point: exactly one writer per version wins, the loser gets a
  * [[VersionedTable.CommitConflictException]] (retry by re-reading
  * `latestVersion`) and its data dir is removed (best effort — a crash
  * leaves an unreferenced orphan that vacuum reaps after a grace window).
  * Readers pin a manifest, so a concurrent vacuum with `retainLast >= 1`
  * never deletes files under a retained version they could be reading.
  *
  * Scale notes: commit cost is O(batch) + one conditional metadata put;
  * time-travel read cost is O(files in that snapshot); vacuum is
  * O(versions) metadata + file deletes, data-free. Nothing scans the table.
  */
class VersionedTableOps(val store: CommitStore,
    val data: DataStore = DataStore.default) {
  import VersionedTable.{CommitConflictException, DirBloom, DirStat, DvFile, Snapshot}

  private def dataDir(root: String) = new File(root, "data")

  /** Opt-in io/compute split of `vt.commit.write` (guide §1.4): when
    * GRAFT_COMMIT_IO_DEBUG=1, every commit/stage write is preceded by a
    * noop-sink execution of the same plan, recorded as
    * `vt.commit.write.noop` — compute-only, so write − noop ≈ the
    * FileFormatWriter/filesystem share. Doubles commit compute; never on
    * in an official bench run.
    */
  private val commitIoDebug = sys.env.contains("GRAFT_COMMIT_IO_DEBUG")

  /** Wall clock for commit stamps and retention decisions — a seam so
    * tests drive time-based behavior (wall-clock VACUUM retention) with
    * controlled timestamps instead of sleeping.
    */
  protected def nowMs(): Long = System.currentTimeMillis()

  private def toDouble(v: Any): Double = v match {
    case l: Long   => l.toDouble
    case d: Double => d
    case i: Int    => i.toDouble
    case f: Float  => f.toDouble
    case s: String => VersionedTable.strImage(s) // string stats: prefix image
    case x         => x.toString.toDouble
  }

  /** Highest committed version, or None for an empty/absent table. */
  def latestVersion(root: String): Option[Int] = {
    val vs = store.versions(root)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Versions whose manifest still exists (i.e. not yet vacuumed) — the
    * set a Vacuum action could actually reap, as opposed to
    * [[historySummary]], whose entries survive vacuum by contract.
    */
  def existingVersions(root: String): Seq[Int] = store.versions(root)

  /** Table-level configuration (`_props` at the table root, `key=value`
    * per line) — the home of `graft.cdf.enabled` and friends. Properties
    * are OPERATIONAL config, not versioned state: they steer how future
    * commits behave (stage CDF images or not), never what a committed
    * snapshot contains, so a plain last-writer-wins file is the right
    * weight — exactly the role Delta's `delta.enableChangeDataFeed`
    * table property plays. One tiny file read per DML commit; absent
    * file = empty map (every property defaults off).
    */
  def tableProperties(root: String): Map[String, String] = {
    val f = new File(root, "_props")
    if (!f.exists()) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().flatMap { line =>
        val i = line.indexOf('=')
        if (i <= 0) None else Some(line.substring(0, i) -> line.substring(i + 1))
      }.toMap
      finally src.close()
    }
  }

  /** Merge `props` into the table's `_props` file (last writer wins PER
    * KEY; a null/empty value removes the key). The read-merge-write is
    * SERIALIZED — a per-root JVM monitor plus an OS file lock on
    * `_props.lock` for cross-process writers — so two concurrent callers
    * (say, `renameColumn` stamping `graft.column.mapping` racing a user
    * toggling `graft.cdf.enabled`) can never silently drop each other's
    * keys; the rename alone only prevented torn files, not lost updates.
    * The write itself stays atomic via temp-file rename, so readers
    * (which take no lock) never see a torn file.
    */
  def setTableProperties(root: String, props: Map[String, String]): Unit = {
    new File(root).mkdirs()
    val monitor = VersionedTable.propsLocks
      .computeIfAbsent(new File(root).getCanonicalPath, _ => new Object)
    monitor.synchronized {
      val raf = new java.io.RandomAccessFile(new File(root, "_props.lock"), "rw")
      try {
        val osLock = raf.getChannel.lock()
        try {
          val merged = (tableProperties(root) ++ props).filter { case (_, v) =>
            v != null && v.nonEmpty
          } -- props.collect { case (k, v) if v == null || v.isEmpty => k }
          val body = merged.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n")
          val tmp = File.createTempFile("_props", ".tmp", new File(root))
          java.nio.file.Files.write(tmp.toPath, body.getBytes("UTF-8"))
          java.nio.file.Files.move(tmp.toPath, new File(root, "_props").toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } finally osLock.release()
      } finally raf.close()
    }
  }

  /** Effective CDF switch for a DML commit: the explicit argument when the
    * caller passed one, else the table's `graft.cdf.enabled` property,
    * else OFF. Off by default is deliberate (Delta's
    * `delta.enableChangeDataFeed` semantics): staging row images is write
    * amplification every writer pays, so only tables with change-feed
    * subscribers opt in.
    */
  protected def resolveCdf(root: String, cdf: Option[Boolean]): Boolean = {
    val on = cdf.getOrElse(
      tableProperties(root).get(VersionedTable.CdfEnabledProp).contains("true"))
    // Migration tripwire (CDF flipped to opt-in in r15): a table that HAS
    // change images from earlier commits but is now committing DML without
    // staging any will strand its changeFeed consumers at the first
    // unstaged version. Warn ONCE per root — loudly, but without failing
    // the commit (the off switch may be deliberate).
    if (!on && new File(root, "_changes").isDirectory) {
      if (VersionedTable.cdfSkipWarned.add(new File(root).getCanonicalPath))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"table $root has change images from prior commits but CDF is now " +
            "OFF (graft.cdf.enabled unset/false): this DML commit stages no " +
            "row images, and changeFeed ranges crossing it will fail. Set " +
            "TBLPROPERTIES('graft.cdf.enabled'='true') to resume staging.")
    }
    on
  }

  /** Deletion-vector entries still LIVE under the new dir set: an entry
    * whose recorded dir bases all vanished (a COW rewrite replaced or
    * dropped every dir it could reference) matches nothing forever —
    * carrying it would keep the table on the dv read path (anti-join on
    * every read, DSv1's slower fallback) and inflate DESCRIBE DETAIL's
    * dv counters indefinitely. Driver-side set check, no I/O. Legacy
    * entries without recorded bases are kept (conservative).
    */
  protected def liveDvs(dvs: Seq[DvFile], newDirs: Seq[String]): Seq[DvFile] = {
    val bases = newDirs.map(d => new File(d).getName).toSet
    dvs.filter(d => d.bases.isEmpty || d.bases.exists(bases))
  }

  /** Rename a LOGICAL frame's anchor columns to their PHYSICAL names —
    * the single crossing every data-dir WRITE goes through. Non-anchor
    * columns (`__dir` and friends) pass through untouched. No-op (same
    * reference) for unmapped anchors.
    */
  protected def toPhysical(df: DataFrame,
      anchor: org.apache.spark.sql.types.StructType): DataFrame =
    if (!VersionedTable.isMapped(anchor)) df
    else {
      val byName = anchor.fields.map(f => f.name -> f).toMap
      df.select(df.columns.toIndexedSeq.map { c =>
        byName.get(c) match {
          case Some(f) => col(c).as(VersionedTable.physicalName(f))
          case None    => col(c)
        }
      }: _*)
    }

  /** Rename a PHYSICAL read frame's columns back to their LOGICAL names —
    * the single crossing every data-dir READ goes through. Non-anchor
    * columns pass through. No-op for unmapped anchors.
    */
  protected def toLogical(df: DataFrame,
      anchor: org.apache.spark.sql.types.StructType): DataFrame =
    if (!VersionedTable.isMapped(anchor)) df
    else {
      val byPhys = anchor.fields.map(f => VersionedTable.physicalName(f) -> f).toMap
      df.select(df.columns.toIndexedSeq.map { c =>
        byPhys.get(c) match {
          case Some(f) => col(c).as(f.name)
          case None    => col(c)
        }
      }: _*)
    }

  /** Remap a [[VersionedTable.DirFilter]]'s column names (used to turn
    * PHYSICAL-name filters pushed at a mapped scan back into the LOGICAL
    * names the manifest's stats/bloom lines speak).
    */
  protected def mapFilterCols(f: VersionedTable.DirFilter,
      m: Map[String, String]): VersionedTable.DirFilter = {
    import VersionedTable.{AnyOf, PointFilter, RangeFilter}
    f match {
      case RangeFilter(c, lo, hi) => RangeFilter(m.getOrElse(c, c), lo, hi)
      case PointFilter(c, v)      => PointFilter(m.getOrElse(c, c), v)
      case AnyOf(bs)              => AnyOf(bs.map(_.map(mapFilterCols(_, m))))
    }
  }

  /** On a table that has EVER been column-mapped (`graft.column.mapping`
    * in `_props`), fields WITHOUT a physical name (i.e. newly added by
    * this merge) get a fresh randomized one — `<name>_<token>` — so a
    * DROP + re-ADD of the same logical name binds to a brand-new physical
    * column and pre-drop files can never leak their old values into it.
    * Unmapped tables pass through untouched (physical = logical forever).
    */
  protected def withMintedPhysicalNames(root: String,
      schema: org.apache.spark.sql.types.StructType,
      existing: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType = {
    if (!tableProperties(root).get(VersionedTable.ColumnMappingProp)
        .contains("true")) schema
    else {
      // only fields NEW relative to the current anchor are minted —
      // pre-existing unmapped fields' files already carry their logical
      // name as the physical name, which must stay untouched
      val known = existing.fieldNames.toSet
      org.apache.spark.sql.types.StructType(schema.fields.map { f =>
        if (known(f.name) ||
            f.metadata.contains(VersionedTable.PhysicalNameKey)) f
        else {
          val token = UUID.randomUUID().toString.take(8)
          val b = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(VersionedTable.PhysicalNameKey, s"${f.name}_$token")
            .build()
          f.copy(metadata = b)
        }
      })
    }
  }

  /** Parse one snapshot manifest. */
  def snapshot(root: String, version: Int): Snapshot =
      graft.BenchProbe.time("vt.manifest_parse") {
    val body = store.get(root, version)
      .getOrElse(throw new IllegalArgumentException(s"no such version $version at $root"))
    var parent = -1; var op = ""; var rows = 0L; var ms = 0L
    var schemaJson: Option[String] = None
    var cdfDir: Option[String] = None
    var cols = Seq.empty[String]; val dirs = Seq.newBuilder[String]
    val stats = Seq.newBuilder[DirStat]
    val blooms = Seq.newBuilder[DirBloom]
    val dvs = Seq.newBuilder[DvFile]
    val txns = Map.newBuilder[String, Long]
    val fstatsRefs = Map.newBuilder[String, String]
    body.linesIterator.foreach { line =>
      line.split("=", 2) match {
        case Array("parent", v)       => parent = v.toInt
        case Array("operation", v)    => op = v
        case Array("rows", v)         => rows = v.toLong
        case Array("committed_ms", v) => ms = v.toLong
        case Array("schema", v)       => cols = v.split(",").toSeq.filter(_.nonEmpty)
        case Array("schema_json", v)  => schemaJson = Some(v)
        case Array("cdf", v)          => cdfDir = Some(v)
        case Array("dir", v)          => dirs += v
        case Array("txn", v)          =>
          // appId|batchId, split at the LAST '|' (appIds are caller-chosen);
          // one line per writer app — every manifest carries ALL apps' marks
          val i = v.lastIndexOf('|')
          if (i > 0) txns += (v.substring(0, i) -> v.substring(i + 1).toLong)
        case Array("stats", v)        => v.split("\\|") match {
          case Array(d, c, mn, mx) => stats += DirStat(d, c, mn.toDouble, mx.toDouble)
          case _                   => () // malformed stats line: ignore (stats are advisory)
        }
        case Array("fstats", v)       => v.split("\\|") match {
          // legacy INLINE file-grain stats (pre-sidecar manifests): still
          // honored so retrofitted tables keep their pruning
          case Array(d, f, c, mn, mx) =>
            stats += DirStat(d, c, mn.toDouble, mx.toDouble, Some(f))
          case _                       => () // advisory, like stats
        }
        // per-dir file-grain stats SIDECAR pointer: the manifest stays
        // O(dirs) no matter how many files a fat commit landed — the
        // file-grain lines live once in `_fstats/<dirbase>-<tok>.fstats`
        // and every descendant manifest carries one pointer line
        case Array("fstatsf", v)      => v.split("\\|") match {
          case Array(d, p) => fstatsRefs += (d -> p)
          case _           => () // advisory
        }
        case Array("bloom", v)        => v.split("\\|") match {
          case Array(d, c, p) => blooms += DirBloom(d, c, p)
          case _              => () // malformed bloom line: ignore (advisory)
        }
        // dv lines are NOT advisory: a deletion vector the reader misses
        // would resurrect deleted rows, so a malformed line fails loudly
        case Array("dv", v)           => v.split("\\|") match {
          case Array(p, n)    => dvs += DvFile(p, n.toLong)
          case Array(p, n, b) =>
            dvs += DvFile(p, n.toLong, b.split(",").toSeq.filter(_.nonEmpty))
          case bad            => throw new IllegalStateException(
            s"malformed dv line in manifest v$version: ${bad.mkString("|")}")
        }
        case _                        => () // version= line, comments, unknown keys
      }
    }
    Snapshot(version, parent, op, rows, cols, dirs.result(), ms, stats.result(),
      blooms.result(), txns.result(), schemaJson, cdfDir, dvs.result(),
      fstatsRefs.result())
  } // vt.manifest_parse


  /** Version `v`'s schema anchor (column-mapping metadata included) — the
    * logical shape as of that commit, one manifest read.
    */
  def anchorAt(spark: SparkSession, root: String, v: Int):
      org.apache.spark.sql.types.StructType =
    snapshotSchema(spark, root, snapshot(root, v))

  /** All snapshots, oldest first. */
  def history(root: String): Seq[Snapshot] = {
    val vs = store.versions(root).toSet
    vs.toSeq.sorted.map(snapshot(root, _))
  }

  // ---------- manifest-log checkpointing (history summaries) ----------

  private def checkpointDir(root: String) = new File(root, "_checkpoint")

  private def checkpointInterval(root: String): Int =
    tableProperties(root).get(VersionedTable.CheckpointIntervalProp)
      .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ > 0)
      .getOrElse(10)

  private def entryOf(s: Snapshot): VersionedTable.HistoryEntry =
    VersionedTable.HistoryEntry(s.version, s.parent, s.operation, s.rows,
      s.committedMs, s.dataDirs.size, s.cdfDir.isDefined)

  /** Newest `_checkpoint/v%05d` at or below `atMost`, parsed. */
  private def latestCheckpoint(root: String, atMost: Int):
      Option[(Int, Seq[VersionedTable.HistoryEntry])] = {
    val files = Option(checkpointDir(root).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.startsWith("v"))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("v").toInt).toOption
        .map(_ -> f))
      .filter(_._1 <= atMost)
    if (files.isEmpty) None
    else {
      val (v, f) = files.maxBy(_._1)
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try {
        val entries = src.getLines().flatMap { line =>
          line.split("\\|") match {
            case Array(ver, par, op, rows, ms, nd, cdf) => Some(
              VersionedTable.HistoryEntry(ver.toInt, par.toInt, op,
                rows.toLong, ms.toLong, nd.toInt, cdf == "1"))
            case _ => None // tolerate future fields / torn lines: cache only
          }
        }.toList
        Some(v -> entries)
      } finally src.close()
    }
  }

  /** The commit log's per-version summaries, oldest first — checkpointed
    * prefix + parsed tail: a 1 000-commit table's DESCRIBE HISTORY reads
    * ONE checkpoint file + O(interval) tail manifests instead of 1 000
    * full manifests (Delta's `_last_checkpoint` shape). Versions whose
    * manifests vacuum dropped below a checkpoint keep their summary —
    * history survives manifest retention.
    */
  def historySummary(root: String): Seq[VersionedTable.HistoryEntry] = {
    val latest = latestVersion(root).getOrElse(return Seq.empty)
    val cp = latestCheckpoint(root, latest)
    val from = cp.map(_._1).getOrElse(0)
    val existing = store.versions(root).toSet
    val tail = (from + 1 to latest).filter(existing)
      .map(v => entryOf(snapshot(root, v)))
    cp.map(_._2.filter(_.version <= from)).getOrElse(Seq.empty) ++ tail
  }

  /** Write the `_checkpoint/v%05d` rollup for `version` (prior checkpoint
    * + tail — O(interval) manifest parses). Best-effort cache: failures
    * are swallowed by the caller, a racing writer's duplicate is
    * byte-equivalent, and the atomic rename keeps readers off torn files.
    */
  private def writeCheckpoint(root: String, version: Int): Unit = {
    val cp = latestCheckpoint(root, version - 1)
    val from = cp.map(_._1).getOrElse(0)
    val existing = store.versions(root).toSet
    val entries = cp.map(_._2.filter(_.version <= from)).getOrElse(Seq.empty) ++
      (from + 1 to version).filter(existing).map(v => entryOf(snapshot(root, v)))
    val body = entries.map(e =>
      s"${e.version}|${e.parent}|${e.operation}|${e.rows}|${e.committedMs}|" +
        s"${e.nDirs}|${if (e.hasCdf) "1" else "0"}").mkString("\n")
    checkpointDir(root).mkdirs()
    val tmp = File.createTempFile("ckpt", ".tmp", checkpointDir(root))
    java.nio.file.Files.write(tmp.toPath, body.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new File(checkpointDir(root), f"v$version%05d").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** A snapshot's UNION schema — the anchor every read path conforms to.
    * The manifest's `schema_json` answers exactly and with zero data I/O;
    * legacy manifests without it fall back to ONE footer read of the
    * newest dir (for append-only histories the latest commit's footer IS
    * the union; for a legacy table whose newest dir was dropped by DML
    * this fallback can narrow — which is precisely why the manifest now
    * persists the schema).
    */
  def snapshotSchema(spark: SparkSession, root: String,
      snap: Snapshot): org.apache.spark.sql.types.StructType =
    snap.schemaJson
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(spark.read
        .parquet(new File(root, snap.dataDirs.last).getPath).schema)

  /** [[snapshotSchema]] for a version (default: latest). The lightweight
    * schema probe of the SQL catalog — one manifest read, no file listing.
    */
  def tableSchema(spark: SparkSession, root: String,
      asOf: Option[Int] = None): org.apache.spark.sql.types.StructType = {
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    snapshotSchema(spark, root, snapshot(root, v))
  }

  /** Commit `df` as the next version. `mode` is "append" (snapshot = parent
    * dirs + new dir), "overwrite" (snapshot = new dir only), or "optimize"
    * (overwrite DIRS semantics but declared content-preserving — Delta's
    * `dataChange=false`: change feeds cross it as an empty delta instead
    * of forcing a resync; reserved for layout ops whose row content is
    * identical to the parent snapshot). Returns the
    * committed version number; throws [[VersionedTable.CommitConflictException]]
    * if another writer claimed the target version first — detected both up
    * front (`expectedVersion`, the CAS form: pass `latestVersion(root) + 1`
    * as read at transaction start) and at the conditional put (defense in
    * depth against the read-to-publish window). A losing writer can never
    * damage the winner's commit: its data lives under its own unique dir,
    * which is deleted on conflict (or vacuumed later if this JVM dies first).
    *
    * `statsCols` names columns whose per-dir min/max land in the manifest
    * (`stats=<dir>|<col>|<min>|<max>` lines, values rendered exactly —
    * longs/timestamps as micros, doubles via `Double.toString` round-trip,
    * STRINGS as their order-preserving 6-byte prefix image,
    * [[VersionedTable.strImage]] — so symbol ranges skip too).
    * They power [[readPruned]]: manifest-level data skipping, the Delta
    * data-skipping analogue with the stats in the commit log instead of a
    * sidecar — a pruned scan touches the manifest and the SURVIVING dirs
    * only, never a listing, never a footer of a skipped dir. Cost at commit:
    * one small agg over the batch being written (it is in cache anyway).
    */
  def commit(df: DataFrame, root: String, mode: String = "append",
      expectedVersion: Option[Int] = None,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty,
      bloomFpp: Double = 0.01,
      txn: Option[(String, Long)] = None): Int = {
    require(mode == "append" || mode == "overwrite" || mode == "optimize",
      s"bad mode $mode")
    val parent = latestVersion(root)
    val version = parent.getOrElse(0) + 1
    expectedVersion.filter(_ != version)
      .foreach(e => throw new CommitConflictException(e))
    dataDir(root).mkdirs()

    // The snapshot's UNION schema is resolved BEFORE the data write: an
    // append on a column-mapped table must land its files under the
    // anchor's PHYSICAL names (and a batch ADDING columns to a once-mapped
    // table mints fresh randomized physical names, so a dropped column's
    // old values can never resurface under a re-added logical name).
    val parentSnapAll = parent.map(snapshot(root, _))
    val parentSnap = parentSnapAll.filter(_ => mode == "append")
    val snapSchema = VersionedTable.asNullable(parentSnap
      .map { ps =>
        val pa = snapshotSchema(df.sparkSession, root, ps)
        withMintedPhysicalNames(root,
          VersionedTable.mergeSchemas(pa, df.schema), pa)
      }
      .getOrElse(df.schema))
      .asInstanceOf[org.apache.spark.sql.types.StructType]

    // (1) data: an immutable dir unique to this ATTEMPT. Racing writers and
    // crashed retries each write their own dir; only the manifest decides
    // which one readers ever see.
    val newDir = f"data/v$version%05d-${UUID.randomUUID().toString.take(8)}"
    val dfPhys = toPhysical(df, snapSchema)
    if (commitIoDebug) graft.BenchProbe.time("vt.commit.write.noop") {
      // io/compute split for vt.commit.write: the noop sink executes the
      // batch's full compute plan with zero filesystem work (guide §1.4),
      // so `write - noop ≈ FileFormatWriter + fs`. Doubles the batch's
      // compute, so OFF unless asked for (GRAFT_COMMIT_IO_DEBUG=1), like
      // GRAFT_STREAM_DEBUG.
      dfPhys.write.format("noop").mode("overwrite").save()
    }
    graft.BenchProbe.time("vt.commit.write") {
      dfPhys.write.parquet(new File(root, newDir).getPath)
    }
    // Row count and per-file min/max hulls come from the parquet FOOTERS of
    // the files just written — O(files) metadata reads instead of a second
    // Spark job over the batch ([[FooterStats]], guide §1.2 "remove
    // passes"). FooterStats' exactness contract makes this a pure fast
    // path: anything it cannot prove exact (INT96 timestamps, NaN hulls,
    // dropped chunk stats, exotic types) returns None and the original
    // one-agg scan below runs instead. File-grain `fstats=` entries are
    // what keep pruning tight on a FAT append (one dir, many files) — a
    // 100 TB table's commit hulls never coarsen to the dir.
    val dataFiles = data.list(root, newDir).filter(e => e.isFile &&
      e.name.endsWith(".parquet") && !e.name.startsWith(".") &&
      !e.name.startsWith("_")).map(_.name)
    val physFor = snapSchema.fields
      .map(f => f.name -> VersionedTable.physicalName(f)).toMap
    val typeFor = snapSchema.fields.map(f => f.name -> f.dataType).toMap
    val footer = graft.BenchProbe.time("vt.commit.stats") {
      // the context's live conf, NOT newHadoopConf(): footer reads only
      // READ the conf, and copying the full session conf per commit is
      // measurable at streaming-sink commit rates
      FooterStats.read(df.sparkSession.sparkContext.hadoopConfiguration,
        new File(root, newDir), dataFiles, statsCols, physFor, typeFor)
    }
    // Scan-path read-back (bloom builder + stats fallback). Pins the
    // writer's schema: no footer inference, and a zero-partition batch —
    // which writes no part files at all — still reads as a schema-correct
    // empty frame. Stats/bloom aggregates speak LOGICAL names (the
    // manifest's space).
    lazy val committed = toLogical(df.sparkSession.read.schema(dfPhys.schema)
      .parquet(new File(root, newDir).getPath)
      .withColumn("__file", col("_metadata.file_name")), snapSchema)
    val (rows, fileStats) = footer match {
      case Some((n, fs)) =>
        (n, fs.map(s => DirStat(newDir, s.col, s.min, s.max, Some(s.file))))
      case None =>
        val statAggs = statsCols.flatMap { c =>
          val probe = committed.schema(c).dataType match {
            case TimestampType => unix_micros(col(c)) // micros < 2^53: double-exact
            case StringType    => col(c) // min/max string; image computed driver-side
            case _             => col(c).cast("double")
          }
          Seq(min(probe).as(s"__mn_$c"), max(probe).as(s"__mx_$c"))
        }
        val perFile = graft.BenchProbe.time("vt.commit.stats") { committed
          .groupBy(col("__file")).agg(count(lit(1)).as("__n"), statAggs: _*)
          .collect() }
        (perFile.map(_.getAs[Long]("__n")).sum,
          perFile.toSeq.flatMap { r =>
            statsCols.flatMap { c =>
              if (r.isNullAt(r.fieldIndex(s"__mn_$c"))) None // all-null file
              else Some(DirStat(newDir, c, toDouble(r.getAs[Any](s"__mn_$c")),
                toDouble(r.getAs[Any](s"__mx_$c")), Some(r.getAs[String]("__file"))))
            }
          })
    }
    val newStats = statsCols.flatMap { c =>
      val fs = fileStats.filter(_.col == c)
      if (fs.isEmpty) None // all-null or empty batch: no stats
      else Some(DirStat(newDir, c, fs.map(_.min).min, fs.map(_.max).max))
    } ++ fileStats

    // Per-dir bloom sidecars: equality-predicate skipping where min/max
    // stats can't help (a point key intersects every dir's range). Sidecars
    // are DATA-plane files named by the attempt-unique dir — racing writers
    // cannot collide, and nothing references a sidecar until the manifest
    // publishes the `bloom=` line, so the same commit protocol covers them.
    // Cost: one distributed bloom agg per column over the fresh dir. (r17
    // measured a single-pass all-columns Catalyst aggregate here: its
    // per-row interpreted update was ~2x stat.bloomFilter's tight RDD
    // fold, eating the saved scan even at two columns — kept as-is.)
    val newBlooms = bloomCols.map { c =>
      val bf = graft.BenchProbe.time("vt.commit.bloom") {
        committed.stat.bloomFilter(c, math.max(rows, 1L), bloomFpp)
      }
      val rel = s"_blooms/${new File(newDir).getName}_$c.bloom"
      val os = data.create(root, rel)
      try bf.writeTo(os) finally os.close()
      DirBloom(newDir, c, rel)
    }

    val parentDirs = parentSnap.map(_.dataDirs).getOrElse(Seq.empty)
    val dirs = parentDirs :+ newDir
    val allStats = parentSnap.map(_.dirStats).getOrElse(Seq.empty) ++ newStats
    val allBlooms = parentSnap.map(_.dirBlooms).getOrElse(Seq.empty) ++ newBlooms
    // Every manifest carries EVERY writer app's high-water mark (parent's
    // marks + this commit's own, Delta checkpoint SetTransaction-style) —
    // so the LATEST manifest alone answers idempotence queries and vacuum
    // can never destroy a mark by dropping old manifests. Carried through
    // overwrites too: replacing the data does not forget who wrote it.
    val allTxns = parentSnapAll.map(_.txns).getOrElse(Map.empty) ++ txn.toMap

    // (2) log: the conditional put is the commit point. An APPEND carries
    // the parent's deletion vectors (its dirs ride along unchanged, so
    // their dv'd positions stay dead); overwrite/optimize start fresh
    // (their dirs are newly written — optimize reads through [[read]],
    // which has already folded the dvs in).
    val allDvs = parentSnap.map(_.dvs).getOrElse(Seq.empty)
    try publish(root, version, parent.getOrElse(0), mode, rows,
      snapSchema.fieldNames.toSeq,
      dirs, allStats, allBlooms, allTxns, Some(snapSchema.json), None, allDvs,
      parentSnap.map(_.fstatsRefs).getOrElse(Map.empty))
    catch { case e: CommitConflictException =>
      // Lost the race: our dir and sidecars are unreferenced and can't hurt
      // anyone. Remove them now; if we crash before this line, vacuum reaps.
      data.deleteTree(root, newDir)
      newBlooms.foreach(b => data.deleteFile(root, b.path))
      throw e
    }
    version
  }

  /** Serialize a manifest and run it through the conditional put — the one
    * commit point shared by [[commit]] and [[optimize]]. Throws
    * [[VersionedTable.CommitConflictException]] on a lost race; the CALLER
    * owns cleanup of its unreferenced data dirs and sidecars.
    */
  private def publish(root: String, version: Int, parent: Int, mode: String,
      rows: Long, schemaCols: Seq[String], dirs: Seq[String],
      stats: Seq[DirStat], blooms: Seq[DirBloom],
      txns: Map[String, Long],
      schemaJson: Option[String] = None,
      cdfDir: Option[String] = None,
      dvs: Seq[DvFile] = Seq.empty,
      fstatsRefs: Map[String, String] = Map.empty): Unit = {
    // File-grain stats go to PER-DIR SIDECARS, never inline: an inline
    // fstats= line would be re-serialized by every descendant manifest
    // (appends carry the parent's stats wholesale), compounding manifest
    // size to O(total files) at streaming-sink commit rates. A sidecar is
    // written ONCE when the dir's stats are measured; every descendant
    // carries a single fstatsf= pointer per dir — manifests stay O(dirs).
    val (fileGrain, dirGrain) = stats.partition(_.file.isDefined)
    val newRefs = fileGrain.groupBy(_.dir).map { case (d, fs) =>
      val rel = s"_fstats/${new File(d).getName}-${UUID.randomUUID().toString.take(8)}.fstats"
      val os = data.create(root, rel)
      try {
        val w = new java.io.OutputStreamWriter(os, "UTF-8")
        fs.foreach(f => w.write(s"${f.file.get}|${f.col}|${f.min}|${f.max}\n"))
        w.flush()
      } finally os.close()
      d -> rel
    }
    val dirSet = dirs.toSet
    // carried pointers for still-live dirs; a dir re-measured THIS commit
    // takes its fresh sidecar
    val refs = fstatsRefs.filter { case (d, _) => dirSet(d) } ++ newRefs
    def dropNewSidecars(): Unit =
      newRefs.values.foreach(data.deleteFile(root, _))
    val body = new StringBuilder()
      .append(s"version=$version\n")
      .append(s"parent=$parent\n")
      .append(s"operation=$mode\n")
      .append(s"rows=$rows\n")
      .append(s"committed_ms=${nowMs()}\n")
      .append(s"schema=${schemaCols.mkString(",")}\n")
    // The snapshot's full UNION schema (StructType json, one line): the
    // schema anchor for readers. Without it the anchor falls back to the
    // NEWEST dir's footer — wrong after a delete/merge drops the newest
    // dir on an additively-evolved table (the last remaining dir can
    // predate the widest schema).
    schemaJson.foreach { j =>
      require(!j.contains("\n"), "schema json must be single-line")
      body.append(s"schema_json=$j\n")
    }
    // Row-level change images for this commit (DML only): the relative
    // dir holding (anchor columns + _change_type) — what changeFeed reads
    // instead of forcing subscribers into a wholesale resync.
    cdfDir.foreach(d => body.append(s"cdf=$d\n"))
    // Deletion vectors: this snapshot's live rows = dirs minus these
    // positions. Carried forward by every content-preserving commit;
    // reset by overwrite/optimize (whose fresh dirs are already folded).
    dvs.foreach { d =>
      val b = if (d.bases.isEmpty) "" else s"|${d.bases.mkString(",")}"
      body.append(s"dv=${d.path}|${d.rows}$b\n")
    }
    txns.toSeq.sortBy(_._1).foreach { case (appId, batchId) =>
      require(!appId.contains("\n"), "txn appId must be single-line")
      body.append(s"txn=$appId|$batchId\n")
    }
    dirs.foreach(d => body.append(s"dir=$d\n"))
    // dir-grain hulls drive dir admission; file-grain sidecar pointers
    // (fstatsf=) drop admission to FILE grain inside admitted dirs — the
    // Delta per-file-stats shape, so a fat append commit (one dir, many
    // files) still prunes tightly instead of coarsening to the dir hull
    dirGrain.foreach(s =>
      body.append(s"stats=${s.dir}|${s.col}|${s.min}|${s.max}\n"))
    refs.toSeq.sortBy(_._1).foreach { case (d, p) =>
      body.append(s"fstatsf=$d|$p\n") }
    blooms.foreach(b =>
      body.append(s"bloom=${b.dir}|${b.col}|${b.path}\n"))
    val won =
      try store.putIfAbsent(root, version, body.toString)
      catch { case e: Throwable => dropNewSidecars(); throw e }
    if (!won) {
      dropNewSidecars() // unreferenced by any manifest; reap immediately
      throw new CommitConflictException(version)
    }
    // every Nth commit rolls the history summary forward — a cheap,
    // best-effort cache (O(interval) tail parses + one small file);
    // losing it costs a longer DESCRIBE HISTORY walk, never correctness
    if (version % checkpointInterval(root) == 0)
      try writeCheckpoint(root, version)
      catch { case _: Throwable => () }
  }

  /** Read a snapshot (default: latest). Only the manifest's dirs are read —
    * orphan dirs from crashed commits and vacuumed history are invisible.
    */
  def read(spark: SparkSession, root: String, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, v)
    // a delete-all leaves a legitimately EMPTY snapshot: serve
    // schema-correct emptiness off the manifest anchor (legacy manifests
    // without a persisted schema keep the loud error — they have no
    // authoritative schema to serve)
    if (snap.dataDirs.isEmpty && snap.schemaJson.isDefined)
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        VersionedTable.logicalSchema(snapshotSchema(spark, root, snap)))
    require(snap.dataDirs.nonEmpty, s"version $v has no data dirs")
    val dirs = snap.dataDirs.map(d => new File(root, d).getPath)
    // The union schema (nulls for pre-evolution rows) comes from the
    // manifest when persisted — schema-PINNED read, zero footer I/O at
    // planning (at 100 TB a snapshot read costs ONE manifest instead of
    // O(dirs) footers). Legacy manifests fall back to mergeSchema, whose
    // footer union enforces the same additive discipline. Deletion
    // vectors (merge-on-read DML) fold in as one anti-join; a dv-free
    // snapshot pays nothing.
    snap.schemaJson match {
      case Some(_) =>
        val anchor = snapshotSchema(spark, root, snap)
        // column-mapped snapshot: files carry PHYSICAL names — read under
        // them (dv fold first: it needs _metadata off the raw scan), then
        // rename to the logical anchor. Unmapped: one schema-pinned read.
        if (VersionedTable.isMapped(anchor))
          toLogical(applyDvs(spark, root, snap.dvs, spark.read
            .schema(VersionedTable.physicalSchema(anchor)).parquet(dirs: _*)),
            anchor)
        else applyDvs(spark, root, snap.dvs,
          spark.read.schema(anchor).parquet(dirs: _*))
      case None =>
        applyDvs(spark, root, snap.dvs,
          spark.read.option("mergeSchema", "true").parquet(dirs: _*))
    }
  }

  /** Manifest-level data skipping: read snapshot `asOf` keeping only the
    * dirs whose recorded `[min, max]` for `c` intersects `[lo, hi]`
    * (bounds in the stats' numeric image: epoch micros for timestamps,
    * double otherwise). Dirs without stats for `c` are always read —
    * pruning is strictly conservative, so the result frame CONTAINS the
    * range rows plus possibly other rows from surviving dirs; callers
    * apply the row-level predicate on top, exactly as with parquet
    * footer stats. A pruned scan costs one manifest read + the surviving
    * dirs — skipped dirs are never listed, never footer-read.
    */
  def readPruned(spark: SparkSession, root: String, c: String,
      lo: Double, hi: Double, asOf: Option[Int] = None): DataFrame =
    readFiltered(spark, root, Seq(VersionedTable.RangeFilter(c, lo, hi)), asOf)

  /** Bloom-pruned point read: read snapshot `asOf` keeping only the dirs
    * whose bloom sidecar for `c` might contain `value` (integral or
    * string, matching `DataFrameStatFunctions.bloomFilter`'s domain).
    * Dirs without a sidecar are always read — strictly conservative, like
    * [[readPruned]]: the frame CONTAINS the matching rows plus possibly
    * bloom false positives and statless dirs, so callers apply the
    * equality predicate on top. Cost: one manifest read + one tiny
    * sidecar read per dir + the surviving dirs. This is the skipping tier
    * min/max range stats cannot provide: a point key intersects almost
    * every dir's [min, max], but a bloom answers "definitely absent".
    */
  def readPoint(spark: SparkSession, root: String, c: String,
      value: Any, asOf: Option[Int] = None): DataFrame =
    readFiltered(spark, root, Seq(VersionedTable.PointFilter(c, value)), asOf)

  /** Composed skipping: read snapshot `asOf` keeping only the dirs EVERY
    * filter admits — the conjunctive shape real PIT scans have (a time
    * RANGE ∧ a symbol POINT, the reference's `(symbol, time DESC)` index,
    * `sql/timescaledb_schema.sql:34-35`). Per dir, a [[VersionedTable.RangeFilter]]
    * consults the manifest min/max, a [[VersionedTable.PointFilter]] consults
    * BOTH tiers — min/max first (free — the manifest is already in hand;
    * for numeric probes a point outside a dir's range is definitely absent)
    * and the bloom sidecar only for dirs the range tier could not dismiss,
    * so sidecars of range-skipped dirs are never even opened. Strictly
    * conservative like its single-filter forms (missing stats/sidecar →
    * read the dir; callers apply the row predicate on top).
    *
    * Cost: one manifest read + one sidecar probe per range-surviving dir +
    * the surviving dirs. Skipped dirs are never listed or footer-read; the
    * only footer touched besides the survivors is the NEWEST dir's, once,
    * as the schema anchor (additive evolution makes the latest commit's
    * schema the union), which also restores columns a skipped dir would
    * have contributed under mergeSchema — the empty-keep and keep-only
    * frames carry the same union schema a full read would.
    */
  def readFiltered(spark: SparkSession, root: String,
      filters: Seq[VersionedTable.DirFilter], asOf: Option[Int] = None): DataFrame = {
    import VersionedTable.{AnyOf, DirFilter, PointFilter, RangeFilter}
    def validate(f: DirFilter): Unit = f match {
      case RangeFilter(c, lo, hi) => require(lo <= hi, s"bad range [$lo, $hi] on $c")
      case _: PointFilter         => ()
      case AnyOf(branches)        => branches.foreach(_.foreach(validate))
    }
    filters.foreach(validate)
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, v)
    require(snap.dataDirs.nonEmpty || snap.schemaJson.isDefined,
      s"version $v has no data dirs")
    val keep = admittedDirs(root, snap, filters)
    // Schema anchor: the manifest's persisted union schema (exact even
    // after DML dropped the newest dir); legacy fallback = ONE footer read
    // of the newest dir — never a footer per skipped dir.
    val anchor = snapshotSchema(spark, root, snap)
    if (keep.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        VersionedTable.logicalSchema(anchor))
    else if (snap.schemaJson.isDefined) {
      // schema-pinned keep read: anchor columns in anchor order, missing
      // columns null-filled by the parquet reader itself — zero footer I/O.
      // Deletion vectors fold in before the frame leaves (dv'd positions
      // of SKIPPED dirs never match anything — their files aren't read —
      // so pruning and merge-on-read compose for free). Column-mapped
      // snapshots read under PHYSICAL names, then rename.
      if (VersionedTable.isMapped(anchor))
        toLogical(applyDvs(spark, root, snap.dvs,
          spark.read.schema(VersionedTable.physicalSchema(anchor))
            .parquet(keep.map(d => new File(root, d).getPath): _*)), anchor)
      else applyDvs(spark, root, snap.dvs, spark.read.schema(anchor)
        .parquet(keep.map(d => new File(root, d).getPath): _*))
    }
    else {
      val kept = applyDvs(spark, root, snap.dvs,
        spark.read.option("mergeSchema", "true")
          .parquet(keep.map(d => new File(root, d).getPath): _*))
      val missing = anchor.filterNot(f => kept.columns.contains(f.name))
      if (missing.isEmpty) kept
      else kept.select(kept.columns.map(col) ++ missing.map(f =>
        lit(null).cast(f.dataType).as(f.name)): _*)
    }
  }

  /** Schema-pinned frame over a SUBSET of a snapshot's dirs — the keep-read
    * primitive [[readFiltered]] and the scoped-maintenance verbs share:
    * anchor columns in anchor order (missing columns null-filled by the
    * reader, zero footer I/O), deletion vectors folded, column-mapped
    * snapshots read under physical names and renamed back.
    */
  private def readDirs(spark: SparkSession, root: String,
      snap: Snapshot, dirs: Seq[String],
      anchor: org.apache.spark.sql.types.StructType): DataFrame =
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        VersionedTable.logicalSchema(anchor))
    else if (VersionedTable.isMapped(anchor))
      toLogical(applyDvs(spark, root, snap.dvs,
        spark.read.schema(VersionedTable.physicalSchema(anchor))
          .parquet(dirs.map(d => new File(root, d).getPath): _*)), anchor)
    else applyDvs(spark, root, snap.dvs, spark.read.schema(anchor)
      .parquet(dirs.map(d => new File(root, d).getPath): _*))

  /** The rows of exactly the dirs a PREDICATE admits at the manifest's
    * skipping tiers (stats hulls + bloom sidecars) — the predicate run
    * through the SAME translation the planning-time scan and the DML
    * verbs use, so "what would a scoped OPTIMIZE rewrite?" and "what does
    * the scan prune?" can never disagree. NOTE: dirs the stats cannot
    * dismiss are served WHOLE (admission is dir-grain, conservative);
    * callers wanting row-exact filtering compose `.filter(predicate)` on
    * top — this frame exists for maintenance scoping and bounds probes.
    */
  def readAdmitted(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, v)
    val anchor = snapshotSchema(spark, root, snap)
    readDirs(spark, root, snap,
      admittedDirs(root, snap, predicateFilters(spark, root, anchor, predicate)),
      anchor)
  }

  /** Planning-time-skipping scan: a frame over snapshot `asOf` backed by a
    * [[org.apache.spark.sql.graft.ManifestFileIndex]]. Where [[readFiltered]]
    * asks the caller to NAME the dir filters, this frame derives them from
    * whatever predicates Catalyst pushes at the scan — `scan(...).filter(...)`
    * or a SQL `WHERE` over `graft_versioned(root)` dismisses dirs from the
    * manifest's min/max stats and bloom sidecars with zero engine-specific
    * API at the call site, and the surviving predicates still reach the
    * parquet reader as row-group filters (the tiers compose). Nothing
    * moves to the executors but the surviving files.
    *
    * Schema anchor: the newest dir's footer (additive evolution makes the
    * latest commit's schema the union); older dirs missing a column serve
    * nulls for it, exactly like [[readFiltered]]'s keep-path.
    */
  def scan(spark: SparkSession, root: String, asOf: Option[Int] = None): DataFrame = {
    // Resolve the version ONCE and pin it for BOTH the dv set and the
    // FileIndex: resolving twice (here and inside scanIndex) lets a
    // commit land in between and pair version v's dvs with v+N's dirs —
    // a read corresponding to no committed snapshot.
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, v)
    val (index, anchor) = scanIndex(spark, root, Some(v))
    // merge-on-read: deletion vectors fold in ON TOP of the pruning frame
    // — anchor-column predicates still push through the anti-join into
    // the FileIndex, so planning-time skipping and dvs compose. A
    // column-mapped snapshot scans under PHYSICAL names (the FileIndex
    // translates pushed physical filters back to the manifest's logical
    // stats — see scanIndex) and renames on top; pushdown crosses the
    // rename Project because Catalyst rewrites through aliases.
    val raw = applyDvs(spark, root, snap.dvs,
      org.apache.spark.sql.graft.ManifestScan.frame(spark, index,
        if (VersionedTable.isMapped(anchor))
          VersionedTable.physicalSchema(anchor)
        else anchor))
    toLogical(raw, anchor)
  }

  /** The manifest-governed FileIndex + union schema behind [[scan]] —
    * shared with the `format("graft")` batch DataSource
    * ([[GraftTableProvider]]), which wraps the same index in a
    * `HadoopFsRelation` so `spark.read.format("graft").load(root)` prunes
    * identically.
    */
  def scanIndex(spark: SparkSession, root: String, asOf: Option[Int] = None):
      (org.apache.spark.sql.graft.ManifestFileIndex,
        org.apache.spark.sql.types.StructType) = {
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, v)
    require(snap.dataDirs.nonEmpty || snap.schemaJson.isDefined,
      s"version $v has no data dirs")
    val anchor = snapshotSchema(spark, root, snap)
    val rootPath = new org.apache.hadoop.fs.Path(new File(root).toURI)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirFiles = graft.BenchProbe.time("vt.scan_listing") {
      snap.dataDirs.map { d =>
        val p = new org.apache.hadoop.fs.Path(new File(root, d).toURI)
        d -> fs.listStatus(p).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
      }
    }
    // On a mapped snapshot the relation's pushed filters arrive under
    // PHYSICAL column names; the manifest's stats/bloom lines speak
    // LOGICAL — remap before the admission check (identity when unmapped).
    val physToLogical = anchor.fields
      .map(f => VersionedTable.physicalName(f) -> f.name)
      .filter { case (p, l) => p != l }.toMap
    def toLogicalFilters(filters: Seq[VersionedTable.DirFilter]) =
      if (physToLogical.isEmpty) filters
      else filters.map(mapFilterCols(_, physToLogical))
    val index = new org.apache.spark.sql.graft.ManifestFileIndex(
      rootPath, dirFiles,
      filters => admittedDirs(root, snap, toLogicalFilters(filters)),
      (dir, names, filters) =>
        admittedFiles(root, snap, dir, names, toLogicalFilters(filters)))
    (index, anchor)
  }

  /** The skipping kernel shared by [[readFiltered]] and the planning-time
    * [[org.apache.spark.sql.graft.ManifestFileIndex]]: the subset of a
    * snapshot's data dirs at least one row of which MIGHT satisfy every
    * filter. Per dir, a [[VersionedTable.RangeFilter]] consults the
    * manifest min/max; a [[VersionedTable.PointFilter]] consults min/max
    * first (numeric probes) then the bloom sidecar — sidecars of
    * range-dismissed dirs are never opened. Strictly conservative: a dir
    * with no recorded stats/sidecar for a filter's column always survives.
    */
  def admittedDirs(root: String, snap: Snapshot,
      filters: Seq[VersionedTable.DirFilter]): Seq[String] = {
    import VersionedTable.{AnyOf, DirFilter, PointFilter, RangeFilter}
    // dir-grain hulls only: file-grain entries refine INSIDE a dir
    // (admittedFiles); folding them here would corrupt the dir hull
    val statsFor = snap.dirStats.filter(_.file.isEmpty)
      .map(s => (s.dir, s.col) -> s).toMap
    val bloomFor = snap.dirBlooms.map(b => (b.dir, b.col) -> b).toMap
    def admits(d: String, f: DirFilter): Boolean = f match {
      case RangeFilter(c, lo, hi) =>
        statsFor.get((d, c)).forall(s => s.max >= lo && s.min <= hi)
      case PointFilter(c, value) =>
        val inRange = value match {
          // a numeric point is a degenerate range: min/max can dismiss the
          // dir before its sidecar is ever opened
          case n: Number => statsFor.get((d, c)).forall(s =>
            s.max >= n.doubleValue() && s.min <= n.doubleValue())
          // a string point probes the prefix-image stats the same way
          // (sound: the image is order-preserving, see [[strImage]])
          case v: String =>
            val img = VersionedTable.strImage(v)
            statsFor.get((d, c)).forall(s => s.max >= img && s.min <= img)
          case _ => true
        }
        inRange && bloomFor.get((d, c)).forall(b => bloomMightContain(root, b, value))
      case AnyOf(branches) =>
        // an empty disjunction admits nothing is the WRONG conservative
        // direction — translation never emits one, but guard anyway
        branches.isEmpty || branches.exists(_.forall(admits(d, _)))
    }
    snap.dataDirs.filter(d => filters.forall(admits(d, _)))
  }

  /** FILE-grain admission inside one already-admitted dir: the subset of
    * `fileNames` whose per-file hulls (`fstats=` lines) might satisfy
    * every filter. Strictly conservative, like [[admittedDirs]]: a file
    * with no recorded stat for a filter's column survives, and a dir with
    * no file-grain stats at all returns every file — legacy manifests and
    * analyze-only tables pay nothing and lose nothing. Point probes use
    * the min/max hull only (blooms are per-DIR); dismissing a file a
    * sidecar would have admitted is impossible because hull checks are
    * necessary conditions on their own.
    */
  def admittedFiles(root: String, snap: Snapshot, dir: String,
      fileNames: Seq[String],
      filters: Seq[VersionedTable.DirFilter]): Seq[String] = {
    import VersionedTable.{AnyOf, DirFilter, PointFilter, RangeFilter}
    if (filters.isEmpty) return fileNames
    val fstats = fileGrainStats(root, snap, dir)
    if (fstats.isEmpty) return fileNames
    val statsFor = fstats.map(s => (s.file.get, s.col) -> s).toMap
    def admits(f: String, flt: DirFilter): Boolean = flt match {
      case RangeFilter(c, lo, hi) =>
        statsFor.get((f, c)).forall(s => s.max >= lo && s.min <= hi)
      case PointFilter(c, value) => value match {
        case n: Number => statsFor.get((f, c)).forall(s =>
          s.max >= n.doubleValue() && s.min <= n.doubleValue())
        case v: String =>
          val img = VersionedTable.strImage(v)
          statsFor.get((f, c)).forall(s => s.max >= img && s.min <= img)
        case _ => true
      }
      case AnyOf(branches) =>
        branches.isEmpty || branches.exists(_.forall(admits(f, _)))
    }
    fileNames.filter(f => filters.forall(admits(f, _)))
  }

  /** One dir's file-grain stats: legacy INLINE `fstats=` entries (from
    * pre-sidecar manifests) plus the dir's `_fstats` SIDECAR if the
    * manifest points at one. Sidecars are immutable (attempt-unique
    * names), so loads cache process-wide; a lost/torn sidecar line just
    * yields fewer hulls — strictly conservative, the affected files
    * survive admission. At scan time only dirs that SURVIVED dir-grain
    * admission are ever resolved, so a pruned-away fat dir costs nothing.
    */
  def fileGrainStats(root: String, snap: Snapshot, dir: String): Seq[DirStat] = {
    val inline = snap.dirStats.filter(s => s.dir == dir && s.file.isDefined)
    val fromSidecar = snap.fstatsRefs.get(dir).map { rel =>
      if (VersionedTable.fstatsCache.size > 65536)
        VersionedTable.fstatsCache.clear() // crude bound; misses only re-read
      VersionedTable.fstatsCache.getOrElseUpdate(s"$root/$rel",
        data.open(root, rel) match {
          case None => Seq.empty[DirStat]
          case Some(is) =>
            val raw = try scala.io.Source.fromInputStream(is, "UTF-8")
              .getLines().toList finally is.close()
            raw.flatMap(_.split("\\|") match {
              case Array(f, c, mn, mx) =>
                scala.util.Try(
                  DirStat(dir, c, mn.toDouble, mx.toDouble, Some(f))).toOption
              case _ => None
            })
        })
    }.getOrElse(Seq.empty)
    inline ++ fromSidecar
  }

  /** Deserialize a bloom sidecar; a lost sidecar is None (conservative —
    * callers treat None as "read the dir").
    */
  private def loadBloom(root: String,
      b: DirBloom): Option[org.apache.spark.util.sketch.BloomFilter] = {
    data.open(root, b.path).map { is =>
      try org.apache.spark.util.sketch.BloomFilter.readFrom(is)
      finally is.close()
    }
  }

  private def bloomProbe(bf: org.apache.spark.util.sketch.BloomFilter,
      value: Any): Boolean = value match {
    case s: String => bf.mightContainString(s)
    case n: Number => bf.mightContainLong(n.longValue())
    case other     => bf.mightContain(other)
  }

  /** Probe a bloom sidecar; a lost sidecar is conservative (read the dir). */
  private def bloomMightContain(root: String, b: DirBloom, value: Any): Boolean =
    loadBloom(root, b).forall(bloomProbe(_, value))

  /** Idempotent commit targeting a SPECIFIC version — the exactly-once
    * streaming sink primitive. Micro-batch N maps deterministically to
    * version N+1; an at-least-once replay of batch N finds its version
    * already committed and becomes a no-op. Returns true iff this call
    * committed (false = the version already existed — replay absorbed).
    */
  def idempotentCommit(df: DataFrame, root: String, version: Int,
      mode: String = "append", statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01): Boolean = {
    if (store.get(root, version).isDefined) return false
    try {
      commit(df, root, mode, expectedVersion = Some(version),
        statsCols = statsCols, bloomCols = bloomCols, bloomFpp = bloomFpp)
      true
    }
    catch { case _: CommitConflictException => false }
  }

  /** Highest micro-batch id writer `appId` has committed to this table, or
    * None if it never has. O(1) metadata: every manifest carries every
    * app's mark forward (Delta checkpoint SetTransaction-style), so the
    * LATEST manifest alone answers — vacuum can drop any amount of history
    * without losing a mark, and idempotence needs no manifest walk.
    */
  def lastCommittedBatch(root: String, appId: String): Option[Long] =
    latestVersion(root).flatMap(v => snapshot(root, v).txns.get(appId))

  /** Transactional commit — Delta's `txn` action analogue, the primitive
    * under the `graft-versioned` streaming sink. Stamps the manifest with
    * `(appId, batchId)`; a replay of an already-committed batch is absorbed
    * (returns false), and a [[VersionedTable.CommitConflictException]] from
    * a FOREIGN writer racing the same version is retried after re-checking
    * the high-water mark — so interleaved writers with distinct appIds are
    * each exactly-once. Unlike [[idempotentCommit]]'s positional batch→
    * version mapping, this survives pre-seeded tables and any number of
    * interleaved foreign commits; and because every manifest carries every
    * app's mark forward, the check is O(1) on the latest manifest and no
    * vacuum schedule can destroy a mark.
    */
  def transactionalCommit(df: DataFrame, root: String, appId: String,
      batchId: Long, mode: String = "append",
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01,
      maxRetries: Int = 20): Boolean = {
    var attempt = 0
    while (true) {
      if (lastCommittedBatch(root, appId).exists(_ >= batchId)) return false
      try {
        commit(df, root, mode, statsCols = statsCols, bloomCols = bloomCols,
          bloomFpp = bloomFpp, txn = Some((appId, batchId)))
        return true
      } catch {
        case _: CommitConflictException if attempt < maxRetries => attempt += 1
      }
    }
    false // unreachable
  }

  /** Transactional MERGE — [[transactionalCommit]]'s exactly-once protocol
    * over the [[merge]] upsert: stamps `(appId, batchId)` on the merge
    * manifest; an at-least-once redelivery of an already-merged batch is
    * absorbed (returns false, table untouched), and a conflict from a
    * FOREIGN writer racing the version is retried after re-checking the
    * high-water mark. This is the streaming-upsert sink primitive: a
    * `foreachBatch` that calls this per micro-batch gets exactly-once
    * key-level upserts into the versioned table — the reference's
    * idempotent feature-store MERGE (`spark/streaming_feature_updates.py`)
    * with the transaction point in the commit log instead of a warehouse.
    */
  def transactionalMerge(source: DataFrame, root: String, appId: String,
      batchId: Long, keyCol: String, maxProbeKeys: Int = 10000,
      bloomFpp: Double = 0.01, maxRetries: Int = 20,
      cdf: Option[Boolean] = None): Boolean = {
    var attempt = 0
    while (true) {
      if (lastCommittedBatch(root, appId).exists(_ >= batchId)) return false
      try {
        merge(source.sparkSession, root, source, keyCol,
          maxProbeKeys = maxProbeKeys, bloomFpp = bloomFpp,
          txn = Some((appId, batchId)), cdf = cdf)
        return true
      } catch {
        case _: CommitConflictException if attempt < maxRetries => attempt += 1
      }
    }
    false // unreachable
  }

  /** [[transactionalMerge]] over the merge-on-read kernel ([[mergeMor]]):
    * the exactly-once streaming-upsert sink for high-frequency batches —
    * each micro-batch commits O(batch + matched rows) (one deletion
    * vector + one source dir), never rewriting the dirs the batch's keys
    * touch. The dv set grows with every batch; schedule [[purgeDeletes]]
    * (or OPTIMIZE) as the maintenance valve. Same redelivery absorption
    * and foreign-conflict retry as the copy-on-write form.
    */
  def transactionalMergeMor(source: DataFrame, root: String, appId: String,
      batchId: Long, keyCol: String, maxProbeKeys: Int = 10000,
      bloomFpp: Double = 0.01, maxRetries: Int = 20,
      cdf: Option[Boolean] = None): Boolean = {
    var attempt = 0
    while (true) {
      if (lastCommittedBatch(root, appId).exists(_ >= batchId)) return false
      try {
        mergeMor(source.sparkSession, root, source, keyCol,
          maxProbeKeys = maxProbeKeys, bloomFpp = bloomFpp,
          txn = Some((appId, batchId)), cdf = cdf)
        return true
      } catch {
        case _: CommitConflictException if attempt < maxRetries => attempt += 1
      }
    }
    false // unreachable
  }

  /** Latest version committed at or before `tsMs` (wall-clock time travel:
    * `read(spark, root, versionAsOf(root, ts))`). None if the table's first
    * commit is later than `tsMs`.
    */
  def versionAsOf(root: String, tsMs: Long): Option[Int] = {
    // summaries, not full manifests (O(tail) past a checkpoint) — but
    // only versions whose manifests still EXIST are pickable: a summary
    // outliving its vacuumed manifest names a version nobody can read
    val existing = store.versions(root).toSet
    val eligible = historySummary(root)
      .filter(e => e.committedMs <= tsMs && existing(e.version))
    if (eligible.isEmpty) None else Some(eligible.map(_.version).max)
  }

  /** Roll the table back: ONE new manifest whose dirs, stats, bloom
    * sidecars, and schema anchor are exactly version `v`'s — a pure
    * metadata commit (`operation=restore`, zero rows moved, zero data
    * I/O), the `RESTORE TABLE t TO VERSION AS OF v` verb. History is
    * preserved: the bad versions stay readable between `v` and the
    * restore (a RESTORE, not a reset), auditable until vacuumed. The
    * CURRENT tip's transaction high-water marks are carried forward, not
    * the target's — an idempotent streaming sink must never see its
    * last-committed batch id regress because somebody rolled the data
    * back. Non-append for subscribers: a restore replaces the snapshot
    * wholesale, so change-feed consumers resync exactly as with
    * overwrite. Cost at 100 TB: two manifest reads + one manifest write.
    */
  def restore(spark: SparkSession, root: String, v: Int): Int = {
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    require(v >= 1 && v <= parent, s"cannot restore to version $v (history is 1..$parent)")
    if (v == parent) return parent // restoring the tip is a no-op
    val target = snapshot(root, v)
    val missing = (target.dataDirs ++ target.dvs.map(_.path))
      .filterNot(d => data.exists(root, d))
    require(missing.isEmpty,
      s"cannot restore to version $v: dirs vacuumed [${missing.mkString(",")}]")
    val version = parent + 1
    // schema anchor pinned even when the target manifest predates
    // schema_json (one footer read of the target's newest dir, once)
    val anchorJson = target.schemaJson
      .getOrElse(snapshotSchema(spark, root, target).json)
    publish(root, version, parent, "restore", 0L, target.schemaCols,
      target.dataDirs, target.dirStats, target.dirBlooms,
      snapshot(root, parent).txns, Some(anchorJson), None, target.dvs,
      target.fstatsRefs)
    version
  }

  /** Widen the table's schema by `newFields` (ALTER TABLE ADD COLUMNS):
    * ONE metadata-only commit (operation `evolve`, zero data moved) whose
    * manifest carries the widened union anchor. Every read path is
    * already anchor-pinned, so existing rows serve NULL for the new
    * columns immediately — the same additive-evolution discipline an
    * append with a wider frame gets, made available as a DDL verb.
    * Change subscriptions cross an evolve version as an empty delta
    * (nothing was added), like `analyze`. New fields are forced nullable:
    * history cannot retroactively satisfy a NOT NULL.
    */
  def addColumns(spark: SparkSession, root: String,
      newFields: Seq[org.apache.spark.sql.types.StructField]): Int = {
    require(newFields.nonEmpty, "no columns to add")
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, parent)
    val anchor = snapshotSchema(spark, root, snap)
    val clash = newFields.map(_.name).filter(n =>
      anchor.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(clash.isEmpty, s"columns already exist: ${clash.mkString(",")}")
    // once-mapped tables mint RANDOMIZED physical names for added
    // columns — a re-ADD after DROP must never read the dropped column's
    // old values out of pre-drop files
    val widened = withMintedPhysicalNames(root, VersionedTable.asNullable(
      org.apache.spark.sql.types.StructType(
        anchor.fields ++ newFields.map(_.copy(nullable = true))))
      .asInstanceOf[org.apache.spark.sql.types.StructType], anchor)
    val version = parent + 1
    publish(root, version, parent, "evolve", 0L, widened.fieldNames.toSeq,
      snap.dataDirs, snap.dirStats, snap.dirBlooms, snap.txns,
      Some(widened.json), None, snap.dvs, snap.fstatsRefs)
    version
  }

  /** `ALTER TABLE t RENAME COLUMN old TO new` — pure metadata, zero data
    * movement: the column's PHYSICAL (on-disk) name is frozen at whatever
    * it already was (the logical name, for a never-mapped column) and the
    * manifest's anchor re-binds the LOGICAL name through
    * [[VersionedTable.PhysicalNameKey]] field metadata — Delta's column
    * mapping, re-expressed over this manifest grammar. Stats/bloom lines
    * (which speak logical names) are rewritten in the same manifest, so
    * planning-time skipping keeps biting under the new name. Time travel
    * is untouched: every older manifest pins its own anchor. The
    * reference's contract checker allows renames that preserve the wire
    * shape (`src/kafka/schema_compatibility.py:22-151`) — the mapping is
    * exactly that: the wire (physical) shape never changes.
    */
  def renameColumn(spark: SparkSession, root: String,
      oldName: String, newName: String): Int = {
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, parent)
    val anchor = snapshotSchema(spark, root, snap)
    require(anchor.fieldNames.contains(oldName), s"no such column: $oldName")
    require(!anchor.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column already exists: $newName")
    val renamed = org.apache.spark.sql.types.StructType(anchor.fields.map { f =>
      if (f.name != oldName) f
      else {
        val phys = VersionedTable.physicalName(f)
        // renaming BACK to the physical name needs no mapping entry —
        // keeps a rename/rename-back round trip metadata-clean
        val b =
          if (phys == newName)
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .remove(VersionedTable.PhysicalNameKey).build()
          else new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(VersionedTable.PhysicalNameKey, phys).build()
        f.copy(name = newName, metadata = b)
      }
    })
    val version = parent + 1
    // File-grain SIDECARS speak the logical names of their write time, and
    // parent manifests share them — so a rename rewrites any sidecar that
    // mentions the column under a fresh attempt-unique name (old files
    // stay valid for time travel). O(#refs) small metadata files, only on
    // the rare rename commit; the fresh entries ride `stats` and publish
    // re-sidecars them, replacing the carried ref per dir.
    val renamedFstats = snap.fstatsRefs.keys.toSeq.sorted.flatMap { d =>
      val fs = fileGrainStats(root, snap, d).filterNot(_.col == oldName)
      val hit = fileGrainStats(root, snap, d).filter(_.col == oldName)
      if (hit.isEmpty) Seq.empty
      else fs ++ hit.map(_.copy(col = newName))
    }
    publish(root, version, parent, "rename", 0L, renamed.fieldNames.toSeq,
      snap.dataDirs,
      snap.dirStats.map(st => if (st.col == oldName) st.copy(col = newName) else st)
        ++ renamedFstats,
      snap.dirBlooms.map(b => if (b.col == oldName) b.copy(col = newName) else b),
      snap.txns, Some(renamed.json), None, snap.dvs, snap.fstatsRefs)
    // once mapped, always mapped: later ADD COLUMNS mint fresh physical
    // names (see withMintedPhysicalNames)
    setTableProperties(root, Map(VersionedTable.ColumnMappingProp -> "true"))
    version
  }

  /** `ALTER TABLE t DROP COLUMN(S)` — metadata-only: the fields leave the
    * anchor (and their stats/bloom lines leave the manifest); data files
    * stay byte-identical, their dropped physical columns simply never
    * selected again. Marks the table column-mapped so a later re-ADD of
    * the same logical name binds to a FRESH physical column (old values
    * cannot resurface). Time travel to pre-drop versions still serves the
    * column.
    */
  def dropColumns(spark: SparkSession, root: String,
      names: Seq[String]): Int = {
    require(names.nonEmpty, "no columns to drop")
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, parent)
    val anchor = snapshotSchema(spark, root, snap)
    val missing = names.filterNot(anchor.fieldNames.contains)
    require(missing.isEmpty, s"no such columns: ${missing.mkString(",")}")
    require(anchor.fields.length > names.length,
      "cannot drop every column of a table")
    val dropSet = names.toSet
    val narrowed = org.apache.spark.sql.types.StructType(
      anchor.fields.filterNot(f => dropSet(f.name)))
    val version = parent + 1
    publish(root, version, parent, "drop", 0L, narrowed.fieldNames.toSeq,
      snap.dataDirs,
      snap.dirStats.filterNot(st => dropSet(st.col)),
      snap.dirBlooms.filterNot(b => dropSet(b.col)),
      snap.txns, Some(narrowed.json), None, snap.dvs, snap.fstatsRefs)
    setTableProperties(root, Map(VersionedTable.ColumnMappingProp -> "true"))
    version
  }

  /** SHALLOW CLONE: birth a NEW table at `dstRoot` from `srcRoot`'s
    * snapshot `asOf` (default: latest) without moving a byte of data
    * through the engine. Every data file (and bloom sidecar) is
    * HARDLINKED into the clone's root — O(files) inode metadata ops,
    * zero data I/O — and ONE manifest (version 1, operation `clone`)
    * carries the snapshot's dirs/stats/blooms/schema over verbatim. On an
    * object store the link step maps onto server-side copy (S3
    * CopyObject / GCS rewrite): still no bytes through the engine.
    *
    * Because each table then OWNS its file names, the two histories are
    * fully independent: vacuum or copy-on-write DML on either side can
    * never invalidate the other (unlinking one name leaves the shared
    * inode alive under the other) — the documented operational hazard of
    * pointer-based shallow clones, where vacuuming the source breaks
    * every clone, is structurally impossible here. Txn high-water marks
    * and CDF images do NOT carry over: the clone is a new table with
    * fresh history and no subscribers. Its version 1 feeds change
    * subscriptions exactly like a born-by-append table's first commit.
    */
  def cloneTo(spark: SparkSession, srcRoot: String, dstRoot: String,
      asOf: Option[Int] = None): Int = {
    val tip = latestVersion(srcRoot)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $srcRoot"))
    val v = asOf.getOrElse(tip)
    require(v >= 1 && v <= tip, s"cannot clone version $v (history is 1..$tip)")
    require(latestVersion(dstRoot).isEmpty,
      s"clone destination is not an empty table: $dstRoot")
    val snap = snapshot(srcRoot, v)
    val missing = (snap.dataDirs ++ snap.dvs.map(_.path))
      .filterNot(d => data.exists(srcRoot, d))
    require(missing.isEmpty,
      s"cannot clone version $v: dirs vacuumed [${missing.mkString(",")}]")
    // dv files ride the same link step: their `__file` identities are
    // table-RELATIVE ("dirBase/fileName"), so they keep matching the
    // linked data files in the clone's root
    (snap.dataDirs ++ snap.dirBlooms.map(_.path) ++ snap.dvs.map(_.path)
      ++ snap.fstatsRefs.values.toSeq)
      .foreach(rel => data.cloneTree(srcRoot, rel, dstRoot, rel))
    // schema anchor pinned even when the source manifest predates
    // schema_json (one footer read of the snapshot's newest dir, once)
    val anchorJson = snap.schemaJson
      .getOrElse(snapshotSchema(spark, srcRoot, snap).json)
    // Table properties travel with the clone (Delta CLONE copies source
    // table properties). Correctness-bearing: `graft.column.mapping` —
    // the clone's hardlinked files still physically carry every dropped
    // column's values, so a re-ADD on the clone MUST mint a fresh
    // physical name exactly as it would on the source; without the
    // marker, withMintedPhysicalNames binds physical=logical and the
    // dropped values resurface.
    val srcProps = tableProperties(srcRoot)
    if (srcProps.nonEmpty) setTableProperties(dstRoot, srcProps)
    // rows = per-commit delta convention; like restore, a metadata verb
    // reports 0 rather than paying a count scan
    publish(dstRoot, 1, 0, "clone", 0L, snap.schemaCols, snap.dataDirs,
      snap.dirStats, snap.dirBlooms, Map.empty, Some(anchorJson), None,
      snap.dvs, snap.fstatsRefs)
    1
  }

  /** Compact the latest snapshot into one fresh dir — a content-preserving
    * `optimize` commit (the OPTIMIZE analogue for a table fragmented by
    * many small appends). History stays readable until vacuumed; the new
    * version reads O(1) dirs instead of O(appends); change subscriptions
    * cross it as an empty delta (dataChange=false), never a resync.
    */
  def compact(spark: SparkSession, root: String,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01): Int =
    commit(read(spark, root), root, "optimize",
      statsCols = statsCols, bloomCols = bloomCols, bloomFpp = bloomFpp)

  /** ANALYZE for the versioned table: backfill data-skipping metadata —
    * per-dir min/max for `statsCols`, bloom sidecars for `bloomCols` — onto
    * the CURRENT snapshot's existing dirs, publishing a new manifest that
    * references the SAME data (operation `analyze`, zero rows moved). The
    * retrofit path for a table whose history predates its skipping needs:
    * [[readPruned]]/[[readPoint]]/[[readFiltered]] start biting immediately,
    * with no rewrite — where [[optimize]] re-clusters the physical layout,
    * `analyze` only measures it. Change-feed consumers skip analyze
    * versions as additive no-ops (nothing was added), so a subscription is
    * never broken by a metadata backfill.
    *
    * Cost: ONE union-tagged agg job over the snapshot for all dirs' stats
    * (each dir's files scanned once, stats columns only) + one bloom agg
    * per (dir, bloomCol). Metadata-plane throughout: no data is copied.
    */
  def analyze(spark: SparkSession, root: String,
      statsCols: Seq[String],
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01): Int = {
    require(statsCols.nonEmpty || bloomCols.nonEmpty, "nothing to analyze")
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    val snap = snapshot(root, parent)
    // One job: every dir's rows tagged with their dir, grouped once.
    // Mapped tables read under PHYSICAL names and rename (analyze's
    // statsCols/bloomCols arrive logical, like every caller-facing name).
    val anchorA = snapshotSchema(spark, root, snap)
    def dirRead(d: String): DataFrame = {
      val raw = (if (VersionedTable.isMapped(anchorA))
        spark.read.schema(VersionedTable.physicalSchema(anchorA))
          .parquet(new File(root, d).getPath)
      else spark.read.parquet(new File(root, d).getPath))
        .withColumn("__file", col("_metadata.file_name"))
      if (VersionedTable.isMapped(anchorA)) toLogical(raw, anchorA) else raw
    }
    // FOOTER fast path first, per dir (same exactness contract as commit's
    // — see [[FooterStats]]): stats + per-dir row counts come from O(files)
    // metadata reads instead of the union-tagged agg job; any dir footers
    // cannot prove exact drops the WHOLE call back to the scan below.
    val physFor = anchorA.fields
      .map(f => f.name -> VersionedTable.physicalName(f)).toMap
    val typeFor = anchorA.fields.map(f => f.name -> f.dataType).toMap
    val footerByDir: Option[Map[String, (Long, Seq[FooterStats.FileStat])]] =
      snap.dataDirs.foldLeft(
        Option(Map.empty[String, (Long, Seq[FooterStats.FileStat])])) { (acc, d) =>
        acc.flatMap { m =>
          val files = data.list(root, d).filter(e => e.isFile &&
            e.name.endsWith(".parquet") && !e.name.startsWith(".") &&
            !e.name.startsWith("_")).map(_.name)
          FooterStats.read(spark.sparkContext.hadoopConfiguration,
            new File(root, d), files, statsCols, physFor, typeFor)
            .map(r => m + (d -> r))
        }
      }
    // (fileStats, per-dir row counts) — footer-derived, or the original
    // union-tagged agg at FILE grain (the ANALYZE retrofit gives an
    // existing fat-dir table file-grain pruning with no rewrite, same
    // fstats= discipline as fresh commits)
    val (fileStats, rowsByDir) = footerByDir match {
      case Some(byDir) =>
        (snap.dataDirs.flatMap(d => byDir(d)._2.map(s =>
          DirStat(d, s.col, s.min, s.max, Some(s.file)))),
          byDir.map { case (d, (n, _)) => d -> n })
      case None =>
        val tagged = snap.dataDirs.map { d =>
          dirRead(d)
            .select((statsCols ++ bloomCols).distinct.map(col) :+ col("__file"): _*)
            .withColumn("__dir", lit(d))
        }.reduce(_ unionByName _)
        val statAggs = statsCols.flatMap { c =>
          val probe = tagged.schema(c).dataType match {
            case TimestampType => unix_micros(col(c))
            case StringType    => col(c) // min/max string; image computed driver-side
            case _             => col(c).cast("double")
          }
          Seq(min(probe).as(s"__mn_$c"), max(probe).as(s"__mx_$c"))
        }
        val grouped = tagged.groupBy(col("__dir"), col("__file"))
          .agg(count(lit(1)).as("__n"), statAggs: _*).collect()
        (grouped.toSeq.flatMap { r =>
          val d = r.getAs[String]("__dir")
          statsCols.flatMap { c =>
            if (r.isNullAt(r.fieldIndex(s"__mn_$c"))) None
            else Some(DirStat(d, c, toDouble(r.getAs[Any](s"__mn_$c")),
              toDouble(r.getAs[Any](s"__mx_$c")), Some(r.getAs[String]("__file"))))
          }
        }, grouped.toSeq.groupBy(_.getAs[String]("__dir"))
          .map { case (d, rs) => d -> rs.map(_.getAs[Long]("__n")).sum })
    }
    val stats = fileStats.groupBy(s => (s.dir, s.col)).map { case ((d, c), fs) =>
      DirStat(d, c, fs.map(_.min).min, fs.map(_.max).max)
    }.toSeq ++ fileStats
    val token = UUID.randomUUID().toString.take(8)
    val blooms = snap.dataDirs.flatMap { d =>
      val n = rowsByDir.getOrElse(d, 0L).max(1L)
      lazy val dirDf = dirRead(d) // bloom-only; a stats-only analyze never scans
      bloomCols.map { c =>
        val bf = dirDf.stat.bloomFilter(c, math.max(n, 1L), bloomFpp)
        // attempt-unique sidecar name: an analyze losing its race must not
        // clobber a winner's sidecars (they are keyed dir+col in the
        // manifest, so the fresh name is invisible until publish)
        val rel = s"_blooms/${new File(d).getName}-$token-_$c.bloom"
        val os = data.create(root, rel)
        try bf.writeTo(os) finally os.close()
        DirBloom(d, c, rel)
      }
    }
    try {
      // ADDITIVE backfill: the parent's skipping metadata for columns NOT
      // named in this call is carried forward — an analyze("b") on a table
      // already indexed on "a" must never degrade a's pruning. Re-analyzed
      // columns take the fresh measurements wholesale.
      val keptStats = snap.dirStats.filterNot(s => statsCols.contains(s.col))
      // sidecar-held file-grain stats for OTHER columns must survive the
      // per-dir sidecar replacement the fresh measurements trigger
      val keptSidecarFstats = snap.fstatsRefs.keys.toSeq.sorted.flatMap(d =>
        fileGrainStats(root, snap, d)
          .filterNot(s => statsCols.contains(s.col) || s.file.isEmpty)
          .filterNot(keptStats.contains))
      val keptBlooms = snap.dirBlooms.filterNot(b => bloomCols.contains(b.col))
      publish(root, version, parent, "analyze", snap.rows, snap.schemaCols,
        snap.dataDirs, keptStats ++ keptSidecarFstats ++ stats,
        keptBlooms ++ blooms, snap.txns,
        snap.schemaJson, None, snap.dvs, snap.fstatsRefs)
      version
    } catch { case e: CommitConflictException =>
      blooms.foreach(b => data.deleteFile(root, b.path))
      throw e
    }
  }

  /** `OPTIMIZE ... ZORDER BY` for the versioned table: rewrite the latest
    * snapshot as `nDirs` data dirs CLUSTERED on the Morton interleave of two
    * dimensions ([[graft.operators.ZOrder]]), each dir covering one
    * contiguous z-range, published atomically as ONE overwrite manifest
    * carrying per-dir min/max for `statsCols` (and optional bloom sidecars).
    * A single-dir [[compact]] gives [[readPruned]]/[[readFiltered]] nothing
    * to skip, and a linear sort clusters one dimension at the cost of the
    * other; after a Z rewrite BOTH dimensions' stats are tight in every dir,
    * so point/range probes on either — or both, the PIT shape — prune to
    * O(matching dirs). This is the object-store analogue of the reference's
    * `(symbol, time DESC)` composite index + per-day chunks
    * (`sql/timescaledb_schema.sql:34-35`), produced by the standard
    * lakehouse OPTIMIZE job.
    *
    * `dimA`/`dimB` are NUMERIC long-valued expressions over the table's
    * columns (e.g. `unix_micros(col("time"))`, `col("symbol").cast("long")`)
    * with contractual inclusive domain maxima — deterministic scaling, no
    * sampled quantiles (see [[graft.operators.ZOrder.scaleTo16]]); they
    * drive the layout only and are not materialized. Cost: ONE shuffle of
    * the snapshot (hash on the dir assignment — the code's top bits — so no
    * sampling pass) + a local sort per dir + one small grouped agg for the
    * stats; the standard OPTIMIZE shape at 100 TB.
    */
  def optimize(spark: SparkSession, root: String,
      dimA: org.apache.spark.sql.Column, maxA: Long,
      dimB: org.apache.spark.sql.Column, maxB: Long,
      nDirs: Int,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01): Int =
    optimizeZorder(spark, root, Seq(dimA -> maxA, dimB -> maxB), nDirs,
      statsCols, bloomCols, bloomFpp)

  /** N-dimensional `OPTIMIZE ... ZORDER BY`: [[optimize]] generalized to
    * any number of `(dimension, inclusiveDomainMax)` pairs — the layout
    * covers the reference's COMPOSITE index sets (`(symbol, time)` today,
    * `(symbol, time, trade_id)` dedup probes,
    * `sql/timescaledb_schema.sql:24,34-37`) with the same single-shuffle
    * cost. Each dimension scales to 16 bits ([[graft.operators.ZOrder
    * .scaleTo16]]) and interleaves at stride N ([[graft.operators.ZOrder
    * .mortonN]]; 2-dim calls produce bit-identical codes to the original
    * Morton-16 path), so every dimension's stats stay tight in every dir
    * and a probe on ANY subset of the dims prunes. Wide interleaves
    * (N > 3) coarsen each dimension to `62/N` bits — granularity, not
    * soundness, is what narrows.
    */
  def optimizeZorder(spark: SparkSession, root: String,
      dims: Seq[(org.apache.spark.sql.Column, Long)],
      nDirs: Int,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01,
      where: Option[org.apache.spark.sql.Column] = None,
      scopeDirs: Option[Set[String]] = None): Int = {
    import graft.operators.ZOrder
    import org.apache.spark.sql.functions.shiftright
    require(nDirs > 0 && (nDirs & (nDirs - 1)) == 0,
      s"nDirs must be a power of two, got $nDirs")
    require(dims.nonEmpty, "need at least one ZORDER dimension")
    val codeBits = ZOrder.mortonBits(dims.size)
    require((1 << java.lang.Integer.numberOfTrailingZeros(nDirs)) == nDirs &&
      java.lang.Integer.numberOfTrailingZeros(nDirs) <= codeBits,
      s"nDirs=$nDirs exceeds the ${dims.size}-dim code space ($codeBits bits)")
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    // Scoped form (`OPTIMIZE t WHERE p ZORDER BY ...`): rewrite ONLY the
    // dirs the predicate's manifest translation admits — the SAME
    // stats/bloom admission the scan and the DML verbs use — and carry
    // every dismissed dir BY NAME, its files, stats and blooms untouched.
    // Routine maintenance at 100 TB re-clusters the hot range at O(that
    // range), never O(table); the unscoped form keeps the full-snapshot
    // Delta OPTIMIZE shape.
    val snapP = snapshot(root, parent)
    val anchorP = snapshotSchema(spark, root, snapP)
    // A scope can arrive as a predicate (`OPTIMIZE t WHERE p`) or as a
    // NAMED dir set (a maintenance policy's drift decision, which was
    // made from manifest metadata and has no Column to offer). Named
    // scopes are intersected with the live dirs — a policy computed
    // against an older snapshot must not resurrect a dir DML replaced.
    val scopeSet = scopeDirs match {
      case Some(ds) => snapP.dataDirs.toSet intersect ds
      case None => where match {
        case None    => snapP.dataDirs.toSet
        case Some(p) =>
          admittedDirs(root, snapP,
            predicateFilters(spark, root, anchorP, p)).toSet
      }
    }
    val scoped = where.isDefined || scopeDirs.isDefined
    if (scoped && scopeSet.isEmpty) return parent // proven no-op
    val current =
      if (!scoped) read(spark, root)
      else readDirs(spark, root, snapP, snapP.dataDirs.filter(scopeSet), anchorP)
    val shift = codeBits - java.lang.Integer.numberOfTrailingZeros(nDirs)
    val zcode = ZOrder.mortonN(dims.map { case (c, mx) => ZOrder.scaleTo16(c, mx) })
    val laid = current
      .withColumn("__zcode", zcode)
      .withColumn("__zdir", shiftright(col("__zcode"), shift))

    // (1) data: one partitioned write — dir-per-z-bucket, rows z-sorted
    // within each for row-group locality — into an attempt-unique staging
    // tree; nothing references it until the manifest publishes.
    val token = UUID.randomUUID().toString.take(8)
    val staging = new File(root, s"data/.optimize-$token")
    // Scoped rewrites on a column-mapped table land files under PHYSICAL
    // names (the carried dirs keep theirs, so the manifest's mapped
    // anchor must govern the new dirs too); the full rewrite keeps its
    // logical-named files and drops the mapping wholesale — every mapped
    // dir is gone after it.
    val laidOut = laid.repartition(nDirs, col("__zdir"))
      .sortWithinPartitions("__zdir", "__zcode")
      .drop("__zcode")
    (if (scoped) toPhysical(laidOut, anchorP) else laidOut)
      .write.partitionBy("__zdir").parquet(staging.getPath)
    // Promote each z-bucket to a first-class data dir through the
    // DataStore seam (local: one rename; object model: copy+delete —
    // legal either way because nothing references the bucket until the
    // manifest publishes it; buckets with no rows simply don't exist).
    val stagingRel = s"data/.optimize-$token"
    val buckets = data.list(root, stagingRel)
      .filter(e => !e.isFile && e.name.startsWith("__zdir="))
      .map(e => e.name.stripPrefix("__zdir=").toLong -> e.name)
      .sortBy(_._1)
    val dirOf = buckets.map { case (k, srcName) =>
      val rel = f"data/v$version%05d-$token-z$k%04d"
      data.promoteDir(root, s"$stagingRel/$srcName", rel)
      k -> rel
    }.toMap
    def cleanup(): Unit = {
      dirOf.values.foreach(d => data.deleteTree(root, d))
      data.deleteTree(root, stagingRel)
    }
    data.deleteTree(root, stagingRel)

    try {
      // (2) stats: from the promoted dirs' parquet FOOTERS when provably
      // exact ([[FooterStats]]' contract), folding file hulls to the dir
      // grain — which also skips a SECOND execution of the z-code pipeline
      // (the fallback agg re-scans the scoped data to recompute __zdir per
      // row). Fallback: the original ONE grouped agg over the laid frame.
      val physForZ =
        if (scoped) anchorP.fields
          .map(f => f.name -> VersionedTable.physicalName(f)).toMap
        else Map.empty[String, String]
      val typeForZ = current.schema.fields.map(f => f.name -> f.dataType).toMap
      val footerByDir: Option[Map[String, (Long, Seq[FooterStats.FileStat])]] =
        dirOf.values.toSeq.sorted.foldLeft(
          Option(Map.empty[String, (Long, Seq[FooterStats.FileStat])])) { (acc, d) =>
          acc.flatMap { m =>
            val files = data.list(root, d).filter(e => e.isFile &&
              e.name.endsWith(".parquet") && !e.name.startsWith(".") &&
              !e.name.startsWith("_")).map(_.name)
            FooterStats.read(spark.sparkContext.hadoopConfiguration,
              new File(root, d), files, statsCols, physForZ, typeForZ)
              .map(r => m + (d -> r))
          }
        }
      val (rows, stats, nOf) = footerByDir match {
        case Some(byDir) =>
          (byDir.values.map(_._1).sum,
            byDir.toSeq.sortBy(_._1).flatMap { case (d, (_, fs)) =>
              statsCols.flatMap { c =>
                val cs = fs.filter(_.col == c)
                if (cs.isEmpty) None
                else Some(DirStat(d, c, cs.map(_.min).min, cs.map(_.max).max))
              }
            },
            (d: String) => byDir.get(d).map(_._1).getOrElse(1L))
        case None =>
          val statAggs = statsCols.flatMap { c =>
            val probe = current.schema(c).dataType match {
              case TimestampType => unix_micros(col(c))
              case StringType    => col(c) // min/max string; image computed driver-side
              case _             => col(c).cast("double")
            }
            Seq(min(probe).as(s"__mn_$c"), max(probe).as(s"__mx_$c"))
          }
          val grouped = laid.groupBy(col("__zdir"))
            .agg(count(lit(1)).as("__n"), statAggs: _*).collect()
          (grouped.map(_.getAs[Long]("__n")).sum,
            grouped.toSeq.flatMap { r =>
              val d = dirOf(r.getAs[Long]("__zdir"))
              statsCols.flatMap { c =>
                if (r.isNullAt(r.fieldIndex(s"__mn_$c"))) None
                else Some(DirStat(d, c, toDouble(r.getAs[Any](s"__mn_$c")),
                  toDouble(r.getAs[Any](s"__mx_$c"))))
              }
            },
            (d: String) => grouped.find(r => dirOf(r.getAs[Long]("__zdir")) == d)
              .map(_.getAs[Long]("__n")).getOrElse(1L))
      }
      // (3) bloom sidecars per promoted dir (data-plane, attempt-named).
      val blooms = dirOf.toSeq.sortBy(_._1).flatMap { case (_, d) =>
        val dirRaw = spark.read.parquet(new File(root, d).getPath)
        val dirDf =
          if (scoped && VersionedTable.isMapped(anchorP))
            toLogical(dirRaw, anchorP)
          else dirRaw
        bloomCols.map { c =>
          val bf = dirDf.stat.bloomFilter(c, math.max(nOf(d), 1L), bloomFpp)
          val rel = s"_blooms/${new File(d).getName}_$c.bloom"
          val os = data.create(root, rel)
          try bf.writeTo(os) finally os.close()
          DirBloom(d, c, rel)
        }
      }
      // (4) the commit point. Operation `optimize` = content-preserving
      // re-layout (dataChange=false): subscriptions cross it untouched.
      val newDirs = dirOf.toSeq.sortBy(_._1).map(_._2)
      if (!scoped) {
        publish(root, version, parent, "optimize", rows, current.columns.toSeq,
          newDirs, stats, blooms,
          snapP.txns, // layout ops never forget writer marks
          Some(VersionedTable.asNullable(current.schema).json))
        version
      } else {
        // scoped: dismissed dirs carried by name with their stats/blooms
        // verbatim (byte-identical files — the survivor contract); the
        // anchor (and any column mapping) is the snapshot's own; dv
        // entries referencing only rewritten dirs fold away, those still
        // covering carried dirs ride along. rows=0 like every other
        // content-preserving maintenance commit (purgeDeletes, restore):
        // publishing the rewritten SUBSET's count would make the same
        // `optimize` verb report different row semantics scoped vs not.
        // Publishes through the REBASING path: a disjoint concurrent
        // append cannot starve routine maintenance.
        publishScopedRewrite(root, parent, snapP, scopeSet, newDirs,
          stats, blooms, anchorP.json, anchorP.fieldNames.toSeq)
      }
    } catch {
      case e: Throwable =>
        cleanup()
        deleteAttemptBlooms(root, token)
        throw e
    }
  }

  /** Scoped compaction — `OPTIMIZE t WHERE p` without re-clustering: the
    * dirs the predicate admits collapse into ONE fresh dir (their
    * deletion vectors folded away in the rewrite), every dismissed dir is
    * carried by name with its stats/bloom lines verbatim — files
    * byte-identical, so routine small-file compaction of the hot range
    * prices at O(admitted dirs), never O(table). Publishes the
    * content-preserving `optimize` op: change-feed subscriptions cross it
    * as an empty delta. Proven-empty scope = no-op, no version burned
    * (returns the current version). The per-chunk maintenance analogue of
    * the reference's chunk-scoped compression policies
    * (`sql/timescaledb_schema.sql:28-31,60-65`).
    */
  def compactWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01): Int = {
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, parent)
    val anchor = snapshotSchema(spark, root, snap)
    val scopeSet = admittedDirs(root, snap,
      predicateFilters(spark, root, anchor, predicate)).toSet
    compactDirs(spark, root, parent, snap, anchor, scopeSet,
      statsCols, bloomCols, bloomFpp)
  }

  /** The fragmented-dirs AUTO-SCOPE: collapse every data dir whose
    * on-disk footprint is below `maxBytes` into ONE fresh dir, carrying
    * the healthy dirs by name — the routine answer to "a streaming sink
    * appended 8 600 small commits today" that never rewrites the big
    * clustered dirs. Dir sizing is O(#dirs) filesystem metadata (the
    * DESCRIBE DETAIL walk), no data reads. No-op (current version
    * returned, nothing committed) below `minDirs` fragments — one small
    * dir is not fragmentation.
    */
  def compactSmallDirs(spark: SparkSession, root: String,
      maxBytes: Long = 32L << 20, minDirs: Int = 2,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty, bloomFpp: Double = 0.01): Int = {
    require(minDirs >= 2, "compacting fewer than 2 dirs moves data for nothing")
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, parent)
    val anchor = snapshotSchema(spark, root, snap)
    val small = snap.dataDirs.filter(d => data.sizeOfDir(root, d) < maxBytes)
    if (small.size < minDirs) return parent
    compactDirs(spark, root, parent, snap, anchor, small.toSet,
      statsCols, bloomCols, bloomFpp)
  }

  /** Shared scoped-compaction kernel: fold `scopeSet`'s dirs (dvs applied)
    * into one fresh dir, carry the rest by name, publish the
    * content-preserving `optimize` op. Empty scope = no-op.
    */
  private def compactDirs(spark: SparkSession, root: String, parent: Int,
      snap: Snapshot, anchor: org.apache.spark.sql.types.StructType,
      scopeSet: Set[String], statsCols: Seq[String],
      bloomCols: Seq[String], bloomFpp: Double): Int = {
    if (scopeSet.isEmpty) return parent // skipping tiers proved a no-op
    val version = parent + 1
    val df = readDirs(spark, root, snap, snap.dataDirs.filter(scopeSet), anchor)
    val (dirRel, _, stats, blooms) =
      stageDir(df, root, version, statsCols, bloomCols, bloomFpp, anchor)
    try {
      // rows=0: content-preserving scoped rewrite, same convention as
      // purgeDeletes — history `rows` means "rows this commit changed".
      // The rebasing publish absorbs disjoint concurrent appends.
      publishScopedRewrite(root, parent, snap, scopeSet, Seq(dirRel),
        stats, blooms, anchor.json, anchor.fieldNames.toSeq)
    } catch { case e: Throwable =>
      data.deleteTree(root, dirRel)
      blooms.foreach(b => data.deleteFile(root, b.path))
      throw e
    }
  }

  /** The commit point for a content-preserving SCOPED rewrite (`optimize`
    * op, rows=0): `scopeSet`'s dirs are replaced by `newDirs`, every other
    * live dir is carried by name. Unlike a data commit, losing the
    * conditional put here must not mean starting the whole rewrite over —
    * on a 100 TB table with streaming appends landing every few seconds,
    * maintenance that aborts on ANY interleaved commit never lands at all.
    * Because the op is content-preserving over a NAMED dir set, a lost
    * race is mechanically rebasable exactly when the winner's commits are
    * provably disjoint from the scope:
    *
    *   - every scoped dir is still live at the new tip (dirs are immutable
    *     by name, so presence == byte-identical — no DML rewrote them),
    *   - the deletion vectors touching scoped dirs are IDENTICAL to the
    *     ones this rewrite folded in (a new dv on a scoped dir means a
    *     concurrent MOR delete this rewrite's output would resurrect),
    *   - the schema anchor is unchanged (a rename/drop re-keys the stats
    *     and bloom lines this publish carries).
    *
    * When all three hold, re-publish at the new tip carrying the WINNER's
    * dirs (its appends ride along untouched); otherwise abort loudly with
    * the conflict — the caller cleans up the staged dirs, and re-issuing
    * the maintenance op re-reads a fresh snapshot. Delta Lake's OPTIMIZE
    * resolves conflicts the same way (disjoint-file commits rebase,
    * overlapping ones fail). Bounded retries: each rebase is one manifest
    * read + one conditional put, never a data rewrite.
    */
  private[sources] def publishScopedRewrite(root: String, firstParent: Int,
      firstSnap: Snapshot, scopeSet: Set[String], newDirs: Seq[String],
      newStats: Seq[DirStat], newBlooms: Seq[DirBloom],
      anchorJson: String, anchorCols: Seq[String],
      foldedDvPaths: Set[String] = Set.empty,
      maxRebase: Int = 5): Int = {
    val scopeBases = scopeSet.map(d => new File(d).getName)
    // a dv with no recorded candidate dirs could cover anything: treat it
    // as scope-relevant (conservative — forces the loud abort)
    def scopedDvs(s: Snapshot): Set[(String, Long)] =
      s.dvs.filter(dv => dv.bases.isEmpty || dv.bases.exists(scopeBases))
        .map(dv => (dv.path, dv.rows)).toSet
    var parent = firstParent
    var snap = firstSnap
    var rebases = 0
    while (true) {
      val carried = snap.dataDirs.filterNot(scopeSet)
      val carriedSet = carried.toSet
      val allDirs = carried ++ newDirs
      try {
        // `foldedDvPaths` = dvs this rewrite already APPLIED into its
        // output (a purge folds every one) — they must not survive the
        // publish; dvs a rebase WINNER added on unscoped dirs ride along
        publish(root, parent + 1, parent, "optimize", 0L, anchorCols,
          allDirs,
          snap.dirStats.filter(s => carriedSet(s.dir)) ++ newStats,
          snap.dirBlooms.filter(b => carriedSet(b.dir)) ++ newBlooms,
          snap.txns, Some(anchorJson), None,
          liveDvs(snap.dvs.filterNot(dv => foldedDvPaths(dv.path)), allDirs),
          snap.fstatsRefs)
        if (rebases > 0) VersionedTable.rebaseCount.addAndGet(rebases.toLong)
        return parent + 1
      } catch { case e: CommitConflictException =>
        rebases += 1
        if (rebases > maxRebase) throw e
        val tip = latestVersion(root).getOrElse(throw e)
        val tipSnap = snapshot(root, tip)
        val live = tipSnap.dataDirs.toSet
        if (!scopeSet.forall(live))
          throw new VersionedTable.ConcurrentScopeException(root,
            s"a concurrent commit rewrote scoped dir(s) " +
              s"${scopeSet.filterNot(live).toSeq.sorted.mkString(", ")} — " +
              "re-issue the maintenance op against the new snapshot")
        if (scopedDvs(tipSnap) != scopedDvs(firstSnap))
          throw new VersionedTable.ConcurrentScopeException(root,
            "a concurrent commit changed deletion vectors on scoped dirs — " +
              "re-issue the maintenance op against the new snapshot")
        if (tipSnap.schemaJson != firstSnap.schemaJson)
          throw new VersionedTable.ConcurrentScopeException(root,
            "a concurrent commit changed the schema anchor — " +
              "re-issue the maintenance op against the new snapshot")
        parent = tip
        snap = tipSnap
      }
    }
    -1 // unreachable
  }

  /** Delete this attempt's bloom sidecars (conflict cleanup). */
  private def deleteAttemptBlooms(root: String, token: String): Unit =
    data.list(root, "_blooms")
      .filter(e => e.isFile && e.name.contains(s"-$token-"))
      .foreach(e => data.deleteFile(root, s"_blooms/${e.name}"))

  /** Write `df` as a fresh attempt-unique data dir with its manifest
    * metadata (row count, min/max stats, bloom sidecars). Nothing
    * references the dir until the caller publishes; on a lost race the
    * caller deletes it. The staging primitive of the DML paths.
    */
  private def stageDir(df: DataFrame, root: String, version: Int,
      statsCols: Seq[String], bloomCols: Seq[String], bloomFpp: Double,
      anchor: org.apache.spark.sql.types.StructType = null):
      (String, Long, Seq[DirStat], Seq[DirBloom]) = {
    dataDir(root).mkdirs()
    val dirRel = f"data/v$version%05d-${UUID.randomUUID().toString.take(8)}"
    // column-mapped tables land files under PHYSICAL names (anchor =
    // the snapshot schema whose mapping governs this dir)
    val dfPhys = if (anchor == null) df else toPhysical(df, anchor)
    if (commitIoDebug) graft.BenchProbe.time("vt.commit.write.noop") {
      // see the identical block in [[commit]] — env-gated io/compute split
      dfPhys.write.format("noop").mode("overwrite").save()
    }
    graft.BenchProbe.time("vt.commit.write") {
      dfPhys.write.parquet(new File(root, dirRel).getPath)
    }
    // Footer-derived stats first (exact or not at all — see FooterStats and
    // the same block in [[commit]]); the scan below is the fallback.
    val anchorSchema = if (anchor == null) df.schema else anchor
    val physFor = anchorSchema.fields
      .map(f => f.name -> VersionedTable.physicalName(f)).toMap
    val typeFor = anchorSchema.fields.map(f => f.name -> f.dataType).toMap
    val dataFiles = data.list(root, dirRel).filter(e => e.isFile &&
      e.name.endsWith(".parquet") && !e.name.startsWith(".") &&
      !e.name.startsWith("_")).map(_.name)
    val footer = graft.BenchProbe.time("vt.commit.stats") {
      // the context's live conf, NOT newHadoopConf(): footer reads only
      // READ the conf, and copying the full session conf per commit is
      // measurable at streaming-sink commit rates
      FooterStats.read(df.sparkSession.sparkContext.hadoopConfiguration,
        new File(root, dirRel), dataFiles, statsCols, physFor, typeFor)
    }
    // schema-pinned read-back, like commit's: no footer inference, and a
    // zero-partition write (no part files) reads as schema-correct empty;
    // stats/bloom aggregates speak LOGICAL names
    lazy val committed = {
      val committedPhysF = df.sparkSession.read.schema(dfPhys.schema)
        .parquet(new File(root, dirRel).getPath)
        .withColumn("__file", col("_metadata.file_name"))
      if (anchor == null) committedPhysF else toLogical(committedPhysF, anchor)
    }
    val (rows, fileStats) = footer match {
      case Some((n, fs)) =>
        (n, fs.map(s => DirStat(dirRel, s.col, s.min, s.max, Some(s.file))))
      case None =>
        val statAggs = statsCols.flatMap { c =>
          val probe = committed.schema(c).dataType match {
            case TimestampType => unix_micros(col(c))
            case StringType    => col(c) // min/max string; image computed driver-side
            case _             => col(c).cast("double")
          }
          Seq(min(probe).as(s"__mn_$c"), max(probe).as(s"__mx_$c"))
        }
        // grouped by file, folded to the dir hull driver-side — same
        // per-file discipline as commit's (see the fstats= note there)
        val perFile = graft.BenchProbe.time("vt.commit.stats") {
          committed.groupBy(col("__file"))
            .agg(count(lit(1)).as("__n"), statAggs: _*).collect() }
        (perFile.map(_.getAs[Long]("__n")).sum,
          perFile.toSeq.flatMap { r =>
            statsCols.flatMap { c =>
              if (r.isNullAt(r.fieldIndex(s"__mn_$c"))) None
              else Some(DirStat(dirRel, c, toDouble(r.getAs[Any](s"__mn_$c")),
                toDouble(r.getAs[Any](s"__mx_$c")), Some(r.getAs[String]("__file"))))
            }
          })
    }
    val stats = statsCols.flatMap { c =>
      val fs = fileStats.filter(_.col == c)
      if (fs.isEmpty) None
      else Some(DirStat(dirRel, c, fs.map(_.min).min, fs.map(_.max).max))
    } ++ fileStats
    val blooms = bloomCols.map { c =>
      val bf = graft.BenchProbe.time("vt.commit.bloom") {
        committed.stat.bloomFilter(c, math.max(rows, 1L), bloomFpp)
      }
      val rel = s"_blooms/${new File(dirRel).getName}_$c.bloom"
      val os = data.create(root, rel)
      try bf.writeTo(os) finally os.close()
      DirBloom(dirRel, c, rel)
    }
    (dirRel, rows, stats, blooms)
  }

  /** Per-dir indexing discipline recorded in the parent snapshot — a
    * rewritten dir inherits exactly the stats/bloom columns its
    * predecessor carried, so DML never silently degrades skipping.
    */
  private def dirMetaCols(snap: Snapshot, d: String): (Seq[String], Seq[String]) =
    (snap.dirStats.filter(_.dir == d).map(_.col).distinct,
      snap.dirBlooms.filter(_.dir == d).map(_.col).distinct)

  /** Conform `df` to the snapshot's union schema `anchor`: every anchor
    * column present, anchor order, null-filled where the frame predates
    * the column. DML paths conform BEFORE classifying/rewriting, so
    * predicates and assignments over additively-evolved columns see every
    * dir (a dir older than an assigned column gets the assignment applied
    * on its null-filled image, not silently dropped).
    */
  private def conformTo(df: DataFrame,
      anchor: org.apache.spark.sql.types.StructType): DataFrame =
    df.select(anchor.map(f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)): _*)

  /** The manifest [[VersionedTable.DirFilter]]s a predicate would push at
    * a scan of this snapshot — translated against a FILELESS twin of the
    * scan relation (same anchor schema, empty file index), so DML
    * planning costs zero file listings: at 100 TB a DELETE's candidate
    * bounding reads ONE manifest, never O(files) metadata. The logical
    * optimizer still constant-folds the predicate before translation,
    * exactly as on the real scan.
    */
  private def predicateFilters(spark: SparkSession, root: String,
      anchor: org.apache.spark.sql.types.StructType,
      predicate: org.apache.spark.sql.Column): Seq[VersionedTable.DirFilter] = {
    val rootPath = new org.apache.hadoop.fs.Path(new File(root).toURI)
    val index = new org.apache.spark.sql.graft.ManifestFileIndex(
      rootPath, Seq.empty, _ => Seq.empty)
    val frame = org.apache.spark.sql.graft.ManifestScan.frame(spark, index, anchor)
    org.apache.spark.sql.graft.ManifestScan
      .translatedFilters(frame.filter(predicate))
  }

  /** The min/max probe matching the manifest stats grammar: micros for
    * timestamps, raw strings (image computed driver-side via
    * [[VersionedTable.strImage]]), double otherwise.
    */
  private def statProbe(dt: org.apache.spark.sql.types.DataType,
      c: String): org.apache.spark.sql.Column = dt match {
    case TimestampType => unix_micros(col(c))
    case StringType    => col(c)
    case _             => col(c).cast("double")
  }

  /** The table-relative identity of the data file a row came from —
    * "dirBase/fileName", the last two segments of `_metadata.file_path`.
    * This is the [[VersionedTable.DvFile]] `__file` grammar: no absolute
    * paths in dv files, so the identity survives a SHALLOW CLONE (links
    * preserve relative names) and a table move. Resolvable only on a
    * FILE-SOURCE frame (`_metadata` is the parquet reader's).
    */
  private def dvFileKey: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{concat_ws, element_at, split}
    val parts = split(col("_metadata.file_path"), "/")
    concat_ws("/", element_at(parts, -2), element_at(parts, -1))
  }

  /** One frame over a snapshot's deletion-vector files (schema-pinned —
    * [[VersionedTable.dvSchema]], no footer reads).
    */
  private def dvFrame(spark: SparkSession, root: String,
      dvs: Seq[DvFile]): DataFrame =
    spark.read.schema(VersionedTable.dvSchema)
      .parquet(dvs.map(d => new File(root, d.path).getPath): _*)

  /** Fold a snapshot's deletion vectors into a file-source frame: one
    * LEFT ANTI join on (file identity, `_metadata.row_index`). Below
    * [[VersionedTable.dvBroadcastMaxRows]] total positions the dv set
    * broadcasts — a narrow per-row hash probe, no shuffle of the table;
    * above it the join falls back to a shuffled anti-join (correct at any
    * size, and the signal to run [[purgeDeletes]]). A snapshot without
    * dvs pays NOTHING: the frame passes through untouched.
    */
  private def applyDvs(spark: SparkSession, root: String, dvs: Seq[DvFile],
      df: DataFrame): DataFrame =
    if (dvs.isEmpty) df
    else {
      val out = df.columns.toSeq
      val keyed = df
        .withColumn("__dv_file", dvFileKey)
        .withColumn("__dv_pos", col("_metadata.row_index"))
      val dv = dvFrame(spark, root, dvs)
      val side =
        if (dvs.map(_.rows).sum <= VersionedTable.dvBroadcastMaxRows) broadcast(dv)
        else dv
      keyed.join(side,
        keyed("__dv_file") === side("__file") && keyed("__dv_pos") === side("__pos"),
        "left_anti")
        .select(out.map(col): _*)
    }

  /** ONE frame over `dirs`, each row conformed to `anchor` and tagged with
    * its dir's BASENAME (`__dir`) — the input the DML paths classify and
    * rewrite with O(1) Spark jobs instead of a serial per-dir loop. A
    * filter on `__dir` constant-folds per union branch, so a downstream
    * rewrite restricted to the partially-matched dirs reads only them.
    * Every read is schema-PINNED on the anchor: no footer-inference job
    * per dir, and a dir predating an anchor column serves it null-filled
    * (parquet's missing-column contract) — the union schema for free.
    *
    * `dvs` (the snapshot's deletion vectors) are folded in per-branch —
    * DML over a merge-on-read table classifies LIVE rows only. With
    * `keepDvCols` the frame keeps each row's `__dv_file`/`__dv_pos`
    * identity — what the MOR verbs persist as new deletion vectors.
    */
  private def taggedUnion(spark: SparkSession, root: String, dirs: Seq[String],
      anchor: org.apache.spark.sql.types.StructType,
      dvs: Seq[DvFile] = Seq.empty,
      keepDvCols: Boolean = false): DataFrame = {
    val needDv = dvs.nonEmpty || keepDvCols
    // mapped anchors: read files under PHYSICAL names, tag (the dv
    // identity columns need _metadata off the raw scan), then rename —
    // every DML kernel downstream stays purely logical
    val readSchema =
      if (VersionedTable.isMapped(anchor)) VersionedTable.physicalSchema(anchor)
      else anchor
    val unioned = dirs.map { d =>
      val base = spark.read.schema(readSchema)
        .parquet(new File(root, d).getPath)
        .withColumn("__dir", lit(new File(d).getName))
      // dv identity columns FIRST (_metadata resolves only off the raw
      // file scan, not through the rename projection), rename after
      val keyed =
        if (!needDv) base
        else base.withColumn("__dv_file", dvFileKey)
          .withColumn("__dv_pos", col("_metadata.row_index"))
      toLogical(keyed, anchor)
    }.reduce(_ union _)
    val live =
      if (dvs.isEmpty) unioned
      else {
        val dv = dvFrame(spark, root, dvs)
        val side =
          if (dvs.map(_.rows).sum <= VersionedTable.dvBroadcastMaxRows) broadcast(dv)
          else dv
        unioned.join(side,
          unioned("__dv_file") === side("__file") && unioned("__dv_pos") === side("__pos"),
          "left_anti")
      }
    if (keepDvCols || dvs.isEmpty) live else live.drop("__dv_file", "__dv_pos")
  }

  /** Stage every partially-matched dir's replacement in ONE Spark write
    * job: `rewrite` (rows conformed to `anchor`, tagged with `__dir`
    * basenames) lands as a single `partitionBy("__dir")` write into an
    * attempt-unique staging tree, and each partition dir is promoted —
    * same-filesystem rename — to a first-class data dir. Every rewritten
    * dir inherits its predecessor's stats/bloom discipline: min/max come
    * from ONE grouped agg over the promoted files, bloom sidecars are
    * re-derived per inherited (dir, column). Nothing references the new
    * dirs until the caller's manifest publishes; on ANY failure in here
    * the promotions are rolled back before rethrowing, and the caller
    * deletes them (plus sidecars) if its publish loses the race.
    *
    * Returns (oldDirRel -> newDirRel, stats, blooms). Cost for K touched
    * dirs: 1 write job + 1 stats agg job + one bloom agg per inherited
    * (dir, bloomCol) — never O(K) count/rewrite jobs.
    */
  private def stageRewrites(spark: SparkSession, rewrite: DataFrame,
      root: String, version: Int, snap: Snapshot,
      oldByBase: Map[String, String],
      anchor: org.apache.spark.sql.types.StructType, bloomFpp: Double):
      (Map[String, String], Seq[DirStat], Seq[DirBloom]) = {
    val token = UUID.randomUUID().toString.take(8)
    val staging = new File(root, s"data/.rewrite-$token")
    val promoted = Seq.newBuilder[String]
    val sidecars = Seq.newBuilder[String]
    try {
      // (1) ONE job writes every replacement dir (dir-per-partition).
      toPhysical(rewrite, anchor).write.partitionBy("__dir")
        .parquet(staging.getPath)
      val stagingRel = s"data/.rewrite-$token"
      val parts = data.list(root, stagingRel)
        .filter(e => !e.isFile && e.name.startsWith("__dir="))
        .map(e => e.name.stripPrefix("__dir=") -> e.name)
        .sortBy(_._1)
      val newByOld = parts.zipWithIndex.map { case ((base, srcName), i) =>
        val rel = f"data/v$version%05d-$token-rw$i%03d"
        data.promoteDir(root, s"$stagingRel/$srcName", rel)
        promoted += rel
        oldByBase.getOrElse(base,
          throw new IllegalStateException(s"unexpected partition $base")) -> rel
      }.toMap
      if (newByOld.isEmpty) return (Map.empty, Seq.empty, Seq.empty)

      // (2) inherited disciplines, and ONE grouped agg for all dirs' stats.
      val metaOf = newByOld.map { case (old, rel) => rel -> dirMetaCols(snap, old) }
      val statsColsAll = metaOf.values.flatMap(_._1).toSeq.distinct
      val bloomColsAll = metaOf.values.flatMap(_._2).toSeq.distinct
      val needAgg = statsColsAll.nonEmpty || bloomColsAll.nonEmpty
      val rbSchema =
        if (VersionedTable.isMapped(anchor)) VersionedTable.physicalSchema(anchor)
        else anchor
      val taggedNew =
        if (!needAgg) null
        else newByOld.values.toSeq.sorted.map { rel =>
          toLogical(spark.read.schema(rbSchema)
            .parquet(new File(root, rel).getPath), anchor)
            .withColumn("__dir", lit(rel))
        }.reduce(_ union _)
      val statAggs = statsColsAll.flatMap(c => Seq(
        min(statProbe(anchor(c).dataType, c)).as(s"__mn_$c"),
        max(statProbe(anchor(c).dataType, c)).as(s"__mx_$c")))
      val grouped =
        if (!needAgg) Array.empty[org.apache.spark.sql.Row]
        else taggedNew.groupBy(col("__dir"))
          .agg(count(lit(1)).as("__n"), statAggs: _*).collect()
      val stats = grouped.toSeq.flatMap { r =>
        val rel = r.getAs[String]("__dir")
        metaOf(rel)._1.flatMap { c =>
          if (r.isNullAt(r.fieldIndex(s"__mn_$c"))) None
          else Some(DirStat(rel, c, toDouble(r.getAs[Any](s"__mn_$c")),
            toDouble(r.getAs[Any](s"__mx_$c"))))
        }
      }
      // (3) sidecars per inherited (dir, bloomCol).
      val blooms = metaOf.toSeq.sortBy(_._1).flatMap { case (rel, (_, bcols)) =>
        val n = grouped.find(_.getAs[String]("__dir") == rel)
          .map(_.getAs[Long]("__n")).getOrElse(1L)
        val dirDf = toLogical(spark.read.schema(rbSchema)
          .parquet(new File(root, rel).getPath), anchor)
        bcols.map { c =>
          val bf = dirDf.stat.bloomFilter(c, math.max(n, 1L), bloomFpp)
          val path = s"_blooms/${new File(rel).getName}_$c.bloom"
          val os = data.create(root, path)
          try bf.writeTo(os) finally os.close()
          sidecars += path
          DirBloom(rel, c, path)
        }
      }
      (newByOld, stats, blooms)
    } catch { case e: Throwable =>
      promoted.result().foreach(d => data.deleteTree(root, d))
      sidecars.result().foreach(p => data.deleteFile(root, p))
      throw e
    } finally data.deleteTree(root, s"data/.rewrite-$token")
  }

  /** Stage a DML commit's row-level change images as their own parquet
    * dir (`_changes/v%05d-<token>`, Delta's `_change_data` shape): the
    * anchor columns + `_change_type` ∈ {insert, update_preimage,
    * update_postimage, delete}. Nothing references the dir until the
    * caller's manifest publishes a `cdf=` line; a failed/lost-race commit
    * deletes it. ONE write job, O(changed rows) — the price of serving
    * subscribers O(delta) instead of forcing an O(table) resync per DML
    * commit ([[VersionedTableOps.changeFeed]]).
    */
  private def stageChanges(changes: DataFrame, root: String, version: Int,
      anchor: org.apache.spark.sql.types.StructType = null): String = {
    val token = UUID.randomUUID().toString.take(8)
    val rel = f"_changes/v$version%05d-$token"
    // change images persist under PHYSICAL names, exactly like data dirs
    // (_change_type has no mapping and passes through) — one uniform
    // on-disk namespace per table, stable across renames
    val out = if (anchor == null) changes else toPhysical(changes, anchor)
    out.write.parquet(new File(root, rel).getPath)
    rel
  }

  /** Stage a merge-on-read commit's deletion vector as its own parquet
    * dir (`_dv/v%05d-<token>`, schema [[VersionedTable.dvSchema]]) from a
    * frame carrying `__dv_file`/`__dv_pos` row identities (a
    * [[taggedUnion]] with `keepDvCols`). Nothing references the dir until
    * the caller's manifest publishes a `dv=` line; a failed/lost-race
    * commit deletes it. ONE write job, O(matched rows).
    */
  private def stageDv(hits: DataFrame, root: String, version: Int): String = {
    val token = UUID.randomUUID().toString.take(8)
    val rel = f"_dv/v$version%05d-$token"
    hits.select(col("__dv_file").as("__file"), col("__dv_pos").as("__pos"))
      .write.parquet(new File(root, rel).getPath)
    rel
  }

  /** Copy-on-write row-level DELETE — `DELETE FROM t WHERE p`, the Delta
    * shape re-expressed over the commit log. The predicate is translated
    * into [[VersionedTable.DirFilter]]s by the SAME machinery the
    * planning-time scan uses ([[org.apache.spark.sql.graft.ManifestScan
    * .translatedFilters]]): dirs the manifest's min/max stats and bloom
    * sidecars dismiss provably hold no matching row and are CARRIED
    * FORWARD untouched — their files are never opened. Each surviving
    * candidate dir is probed with one count; dirs with no actual matches
    * carry forward too, fully-matched dirs are dropped from the manifest
    * (their files stay on disk for time travel until vacuum), and only
    * partially-matched dirs are rewritten (keep-rows staged to a fresh
    * attempt-unique dir inheriting the dir's stats/bloom columns). ONE
    * manifest publishes the result atomically; `operation=delete` is
    * non-append, so change-feed consumers fail loudly and resync, exactly
    * as with overwrite.
    *
    * SQL semantics: a row is deleted iff `predicate` evaluates TRUE —
    * NULL keeps the row. Returns the number of rows deleted; when no row
    * matches, NOTHING is committed and 0 is returned (a no-op DELETE does
    * not burn a version). Cost at 100 TB: one manifest read + one count
    * per candidate dir + a rewrite per PARTIALLY-matched dir — O(touched
    * data), never O(table).
    */
  def delete(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      cdf: Option[Boolean] = None): Long = {
    val doCdf = resolveCdf(root, cdf)
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    val snap = snapshot(root, parent)
    val anchor = snapshotSchema(spark, root, snap)
    val dirFilters = predicateFilters(spark, root, anchor, predicate)
    val candidates = admittedDirs(root, snap, dirFilters)
    if (candidates.isEmpty) return 0L // skipping tiers proved a no-op
    val hit = coalesce(predicate, lit(false))
    val oldByBase = candidates.map(d => new File(d).getName -> d).toMap
    val tagged = taggedUnion(spark, root, candidates, anchor, snap.dvs)

    // ONE classify job over every candidate dir: per-dir total + matches.
    val classified = tagged.groupBy(col("__dir"))
      .agg(count(lit(1)).as("__n"),
        sum(when(hit, 1L).otherwise(0L)).as("__m")).collect()
    def counts(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("__dir"), r.getAs[Long]("__n"), r.getAs[Long]("__m"))
    val deleted = classified.map(counts(_)._3).sum
    if (deleted == 0L) return 0L // pure no-op: no version burned
    val fullBases = classified.map(counts).collect {
      case (b, n, m) if m == n => b
    }.toSet
    val partialBases = classified.map(counts).collect {
      case (b, n, m) if m > 0 && m < n => b
    }.toSeq.sorted

    // ONE rewrite job for ALL partially-matched dirs (the __dir filter
    // constant-folds per union branch — fully/un-matched dirs never read).
    val (newByOld, newStats, newBlooms) =
      if (partialBases.isEmpty)
        (Map.empty[String, String], Seq.empty[DirStat], Seq.empty[DirBloom])
      else stageRewrites(spark,
        tagged.filter(col("__dir").isin(partialBases: _*)).filter(!hit),
        root, version, snap,
        oldByBase.filter { case (b, _) => partialBases.contains(b) },
        anchor, bloomFpp = 0.01)
    // row-level CDF: the deleted rows themselves (one extra read of the
    // dirs actually holding matches — fully-matched dirs contribute all
    // their rows, partial dirs their hit rows)
    val hitBases = classified.map(counts).collect {
      case (b, _, m) if m > 0 => b
    }.toSeq.sorted
    val cdfRel =
      if (!doCdf) None
      else Some(stageChanges(
        tagged.filter(col("__dir").isin(hitBases: _*)).filter(hit)
          .select(anchor.map(f => col(f.name)): _*)
          .withColumn("_change_type", lit("delete")),
        root, version, anchor))
    try {
      val dropped = fullBases.map(oldByBase)
      val newDirs = snap.dataDirs.flatMap { d =>
        if (dropped(d)) None else Some(newByOld.getOrElse(d, d))
      }
      val keepSet = newDirs.toSet
      // manifest rows= records the commit's DELTA, like append's batch size:
      // for a delete, the rows removed
      publish(root, version, parent, "delete", deleted,
        anchor.fieldNames.toSeq, newDirs,
        snap.dirStats.filter(s => keepSet(s.dir)) ++ newStats,
        snap.dirBlooms.filter(b => keepSet(b.dir)) ++ newBlooms,
        snap.txns, Some(anchor.json), cdfRel, liveDvs(snap.dvs, newDirs),
        snap.fstatsRefs)
      deleted
    } catch { case e: Throwable =>
      newByOld.values.foreach(d => data.deleteTree(root, d))
      newBlooms.foreach(b => data.deleteFile(root, b.path))
      cdfRel.foreach(d => data.deleteTree(root, d))
      throw e
    }
  }

  /** Copy-on-write row-level UPDATE — `UPDATE t SET c = expr WHERE p`,
    * completing the DML verb set over the same kernel as [[delete]]: the
    * predicate's translated [[VersionedTable.DirFilter]]s bound the
    * candidate dirs (stats/bloom-dismissed dirs carried by name, never
    * opened), each candidate is probed with one count, and only dirs
    * actually holding matched rows are rewritten — matched rows get the
    * assignments applied (each cast back to the column's existing type:
    * UPDATE never mutates the schema), unmatched rows pass through
    * byte-identical. ONE manifest publishes atomically
    * (`operation=update`, non-append → change-feed consumers resync);
    * rewritten dirs re-derive their inherited stats/bloom columns, so an
    * update that moves a column's range keeps skipping truthful.
    *
    * SQL semantics: a row is updated iff `predicate` is TRUE (NULL leaves
    * it untouched); assignments may reference any of the row's old
    * columns, evaluated against the PRE-update row. Returns rows updated;
    * a no-match update commits nothing. Cost: manifest + one count per
    * candidate dir + a rewrite per matched dir — O(touched data).
    */
  def update(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column],
      cdf: Option[Boolean] = None): Long = {
    val doCdf = resolveCdf(root, cdf)
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    val snap = snapshot(root, parent)
    require(assignments.nonEmpty, "no assignments")
    val anchor = snapshotSchema(spark, root, snap)
    val unknown = assignments.keySet.diff(anchor.fieldNames.toSet)
    require(unknown.isEmpty,
      s"assignments target unknown columns: ${unknown.mkString(",")}")
    val dirFilters = predicateFilters(spark, root, anchor, predicate)
    val candidates = admittedDirs(root, snap, dirFilters)
    if (candidates.isEmpty) return 0L
    val hit = coalesce(predicate, lit(false))
    val oldByBase = candidates.map(d => new File(d).getName -> d).toMap
    // Rows conform to the snapshot's UNION schema before anything else, so
    // an assignment to an additively-added column lands in EVERY matched
    // dir — a dir predating the column is rewritten with it null-filled
    // then assigned, never silently without it.
    val tagged = taggedUnion(spark, root, candidates, anchor, snap.dvs)

    // ONE classify job: per-dir match counts.
    val classified = tagged.groupBy(col("__dir"))
      .agg(sum(when(hit, 1L).otherwise(0L)).as("__m")).collect()
    val updated = classified.map(_.getAs[Long]("__m")).sum
    if (updated == 0L) return 0L // pure no-op: no version burned
    val matchedBases = classified
      .filter(_.getAs[Long]("__m") > 0L).map(_.getAs[String]("__dir")).toSeq.sorted

    // ONE rewrite job for ALL matched dirs: assignments applied to matched
    // rows (cast back to the column's anchor type — UPDATE never mutates
    // the schema), unmatched rows pass through untouched.
    val rewriteCols = anchor.map { f =>
      assignments.get(f.name) match {
        case Some(a) => when(hit, a.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None    => col(f.name)
      }
    } :+ col("__dir")
    val (newByOld, newStats, newBlooms) = stageRewrites(spark,
      tagged.filter(col("__dir").isin(matchedBases: _*))
        .select(rewriteCols: _*),
      root, version, snap,
      oldByBase.filter { case (b, _) => matchedBases.contains(b) },
      anchor, bloomFpp = 0.01)
    // row-level CDF: each matched row yields its pre- and post-image in
    // ONE pass (inline over a two-struct array — no second read per image)
    val cdfRel =
      if (!doCdf) None
      else {
        val pre = struct(anchor.map(f => col(f.name)) :+
          lit("update_preimage").as("_change_type"): _*)
        val post = struct(anchor.map { f =>
          assignments.get(f.name) match {
            case Some(a) => a.cast(f.dataType).as(f.name)
            case None    => col(f.name)
          }
        } :+ lit("update_postimage").as("_change_type"): _*)
        Some(stageChanges(
          tagged.filter(col("__dir").isin(matchedBases: _*)).filter(hit)
            .select(inline(array(pre, post))),
          root, version, anchor))
      }
    try {
      val newDirs = snap.dataDirs.map(d => newByOld.getOrElse(d, d))
      val keepSet = newDirs.toSet
      // manifest rows= records the commit's DELTA: rows updated
      publish(root, version, parent, "update", updated,
        anchor.fieldNames.toSeq, newDirs,
        snap.dirStats.filter(s => keepSet(s.dir)) ++ newStats,
        snap.dirBlooms.filter(b => keepSet(b.dir)) ++ newBlooms,
        snap.txns, Some(anchor.json), cdfRel, liveDvs(snap.dvs, newDirs),
        snap.fstatsRefs)
      updated
    } catch { case e: Throwable =>
      newByOld.values.foreach(d => data.deleteTree(root, d))
      newBlooms.foreach(b => data.deleteFile(root, b.path))
      cdfRel.foreach(d => data.deleteTree(root, d))
      throw e
    }
  }

  /** Copy-on-write MERGE — whole-row upsert by key, the Delta
    * `MERGE WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
    * shape over the commit log: every table row whose `keyCol` appears in
    * `source` is replaced by the source row; source rows with unseen keys
    * are inserts. `source` must be key-unique (checked — an ambiguous
    * source is refused loudly, like Delta's multiple-source-rows-match
    * error) and carry the table's columns.
    *
    * Touched-dir bounding composes the two skipping tiers without ever
    * shuffling the table: the source keys' [min, max] hull prunes on the
    * manifest's min/max stats, then — when the source's distinct keys fit
    * `maxProbeKeys` — each surviving dir's bloom sidecar is probed per
    * key, dismissing dirs that share the hull but none of the keys. Each
    * remaining dir is probed with one broadcast semi-join count; only
    * dirs actually holding matched keys are rewritten (anti-join against
    * the source keys, staged fresh, inheriting the dir's stats/bloom
    * columns). The source lands as its own new dir indexed with the
    * UNION of the parent snapshot's stats/bloom disciplines. ONE manifest
    * publishes atomically; `operation=merge` is non-append (change-feed
    * consumers resync). Returns the new version.
    *
    * Cost at 100 TB: manifest + sidecar probes + one broadcast semi-join
    * per candidate dir + rewrites of dirs that truly hold matched keys +
    * O(source) for the insert dir — O(touched data + delta), never
    * O(table); the table is never shuffled.
    */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      keyCol: String, maxProbeKeys: Int = 10000,
      bloomFpp: Double = 0.01, txn: Option[(String, Long)] = None,
      cdf: Option[Boolean] = None): Int = {
    val doCdf = resolveCdf(root, cdf)
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    val snap = snapshot(root, parent)
    require(snap.schemaCols.toSet == source.columns.toSet,
      s"source columns ${source.columns.mkString(",")} must match table schema " +
        snap.schemaCols.mkString(","))
    val anchor = snapshotSchema(spark, root, snap)
    val src = conformTo(source, anchor).cache()
    try {
      // Key hull in the STATS' numeric image (micros for timestamps,
      // STRINGS via their order-preserving prefix image — commit's exact
      // formula, see [[VersionedTable.strImage]] — double otherwise): a
      // hull in a different unit would dismiss dirs that DO hold matched
      // keys. String min/max travel as raw strings and take the image
      // driver-side, so string-keyed merges with small sources get the
      // same tier-1 dismissals numeric keys do; prefix ties only ever
      // ADMIT extra dirs (conservative), and the bloom tier still probes
      // the survivors.
      val keyProbe = src.schema(keyCol).dataType match {
        case TimestampType                             => unix_micros(col(keyCol))
        case _: org.apache.spark.sql.types.NumericType => col(keyCol).cast("double")
        case StringType                                => col(keyCol)
        case _                                         => lit(null).cast("double")
      }
      val srcAgg = src.agg(count(lit(1)), countDistinct(col(keyCol)),
        min(keyProbe), max(keyProbe)).head()
      val (srcRows, srcKeys) = (srcAgg.getLong(0), srcAgg.getLong(1))
      require(srcRows == srcKeys,
        s"merge source is not key-unique on $keyCol: $srcRows rows, $srcKeys keys")
      require(srcRows > 0, "empty merge source")

      // Tier 1: the key hull vs manifest min/max (numeric, timestamp AND
      // string keys — toDouble renders strings as their prefix image).
      val hull =
        if (srcAgg.isNullAt(2)) Seq.empty
        else Seq(VersionedTable.RangeFilter(keyCol,
          toDouble(srcAgg.get(2)), toDouble(srcAgg.get(3))))
      var candidates = admittedDirs(root, snap, hull)
      // Tier 2: per-key bloom probes, budget-capped (sidecars are tiny and
      // driver-local; dirs without a sidecar on keyCol always survive).
      val bloomFor = snap.dirBlooms.filter(_.col == keyCol).map(b => b.dir -> b).toMap
      if (srcKeys <= maxProbeKeys && bloomFor.nonEmpty) {
        val keys = src.select(col(keyCol)).collect().map(_.get(0))
        candidates = candidates.filter { d =>
          bloomFor.get(d).forall { b =>
            // load the sidecar ONCE, probe every key in memory
            loadBloom(root, b).forall(bf => keys.exists(k => bloomProbe(bf, k)))
          }
        }
      }

      val srcKeyFrame = broadcast(src.select(col(keyCol)))
      val cleanupDirs = Seq.newBuilder[String]
      val cleanupBlooms = Seq.newBuilder[DirBloom]
      try {
        // ONE classify job over every candidate dir: a broadcast left join
        // against the (key-unique) source keys marks matched rows without
        // multiplying them, then one grouped agg yields per-dir totals and
        // match counts — never a semi-join + count pair per dir.
        // row-level CDF: matched table rows are pre-images, source rows
        // split into post-images (key present in the table) and inserts —
        // O(matched + source), staged as the commit's _changes dir
        def insertOnlyCdf(): Option[String] =
          if (!doCdf) None
          else Some(stageChanges(
            src.select(anchor.map(f => col(f.name)): _*)
              .withColumn("_change_type", lit("insert")),
            root, version, anchor))
        val (newByOld, rwStats, rwBlooms, fullDropped, cdfRel) =
          if (candidates.isEmpty)
            (Map.empty[String, String], Seq.empty[DirStat],
              Seq.empty[DirBloom], Set.empty[String], insertOnlyCdf())
          else {
            val oldByBase = candidates.map(d => new File(d).getName -> d).toMap
            val tagged = taggedUnion(spark, root, candidates, anchor, snap.dvs)
            val classified = tagged.join(
              broadcast(src.select(col(keyCol)).withColumn("__hit", lit(1))),
              Seq(keyCol), "left")
              .groupBy(col("__dir"))
              .agg(count(lit(1)).as("__n"), count(col("__hit")).as("__k"))
              .collect()
            def counts(r: org.apache.spark.sql.Row) =
              (r.getAs[String]("__dir"), r.getAs[Long]("__n"), r.getAs[Long]("__k"))
            val fullBases = classified.map(counts).collect {
              case (b, n, k) if k == n => b
            }.toSet
            val partialBases = classified.map(counts).collect {
              case (b, n, k) if k > 0 && k < n => b
            }.toSeq.sorted
            // ONE rewrite job: all partially-matched dirs' keep-rows (the
            // anti-join against the broadcast source keys), dir-per-partition.
            val (rew, st, bl) =
              if (partialBases.isEmpty)
                (Map.empty[String, String], Seq.empty[DirStat], Seq.empty[DirBloom])
              else stageRewrites(spark,
                tagged.filter(col("__dir").isin(partialBases: _*))
                  .join(srcKeyFrame, Seq(keyCol), "left_anti")
                  .select(anchor.map(f => col(f.name)) :+ col("__dir"): _*),
                root, version, snap,
                oldByBase.filter { case (b, _) => partialBases.contains(b) },
                anchor, bloomFpp)
            cleanupDirs ++= rew.values
            cleanupBlooms ++= bl
            val hitBases = classified.map(counts).collect {
              case (b, _, k) if k > 0 => b
            }.toSeq.sorted
            val cdfStaged =
              if (!doCdf) None
              else if (hitBases.isEmpty) insertOnlyCdf()
              else {
                val matchedTable = tagged
                  .filter(col("__dir").isin(hitBases: _*))
                  .join(srcKeyFrame, Seq(keyCol), "leftsemi")
                  .select(anchor.map(f => col(f.name)): _*)
                val matchedKeys = matchedTable.select(col(keyCol)).distinct()
                val srcFlagged = src
                  .join(broadcast(matchedKeys.withColumn("__m", lit(1))),
                    Seq(keyCol), "left")
                  .withColumn("_change_type",
                    when(col("__m").isNotNull, "update_postimage")
                      .otherwise("insert"))
                  .select(anchor.map(f => col(f.name)) :+ col("_change_type"): _*)
                Some(stageChanges(
                  matchedTable
                    .withColumn("_change_type", lit("update_preimage"))
                    .unionByName(srcFlagged),
                  root, version, anchor))
              }
            (rew, st, bl, fullBases.map(oldByBase), cdfStaged)
          }
        cdfRel.foreach(cleanupDirs += _)
        // The source lands as its own dir under the TABLE's indexing
        // discipline (union of the parent's per-dir stats/bloom columns).
        val tableStatsCols = snap.dirStats.map(_.col).distinct
        val tableBloomCols = snap.dirBlooms.map(_.col).distinct
        val srcStaged = stageDir(src, root, version,
          tableStatsCols, tableBloomCols, bloomFpp, anchor)
        cleanupDirs += srcStaged._1
        cleanupBlooms ++= srcStaged._4
        val newDirs = snap.dataDirs.flatMap { d =>
          if (fullDropped(d)) None else Some(newByOld.getOrElse(d, d))
        } :+ srcStaged._1
        val keepSet = newDirs.toSet
        // manifest rows= records the commit's DELTA (append convention):
        // for a merge, the source rows it landed
        publish(root, version, parent, "merge",
          srcRows, anchor.fieldNames.toSeq, newDirs,
          snap.dirStats.filter(s => keepSet(s.dir)) ++ rwStats ++ srcStaged._3,
          snap.dirBlooms.filter(b => keepSet(b.dir)) ++ rwBlooms ++ srcStaged._4,
          snap.txns ++ txn.toMap, Some(anchor.json), cdfRel,
          liveDvs(snap.dvs, newDirs), snap.fstatsRefs)
        version
      } catch { case e: Throwable =>
        cleanupDirs.result().foreach(d =>
          data.deleteTree(root, d))
        cleanupBlooms.result().foreach(b => data.deleteFile(root, b.path))
        throw e
      }
    } finally src.unpersist()
  }

  /** Merge-on-read DELETE — [[delete]]'s semantics at O(deleted rows)
    * commit cost: instead of rewriting every partially-matched dir
    * (copy-on-write, O(touched dirs) data moved), the matched rows'
    * positions are persisted as a DELETION VECTOR (`dv=` manifest line,
    * [[VersionedTable.DvFile]]) and every data dir is CARRIED FORWARD
    * untouched. Readers fold the dv set in as one anti-join
    * ([[applyDvs]]); time travel is exact per version (each manifest
    * lists exactly the dvs committed at or before it). This is the Delta
    * deletion-vector / Iceberg positional-delete shape: the right verb
    * when deletes are small and scattered — a GDPR-style key delete on a
    * 100 TB table commits O(matched rows), not O(every touched dir's
    * data). The read-side price accumulates with the dv set;
    * [[purgeDeletes]] (or any OPTIMIZE/compaction) folds it back to zero.
    *
    * Same SQL semantics and CDF images as [[delete]]: a row is deleted
    * iff `predicate` is TRUE (NULL keeps it); subscribers get the deleted
    * rows as `_change_type=delete`; a no-match DELETE commits nothing.
    * Candidate dirs are bounded by the same stats/bloom translation, and
    * rows already dv'd by earlier MOR commits can never match twice (the
    * classify frame is live-rows-only). Returns rows deleted.
    */
  def deleteMor(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      cdf: Option[Boolean] = None): Long = {
    val doCdf = resolveCdf(root, cdf)
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    val snap = snapshot(root, parent)
    val anchor = snapshotSchema(spark, root, snap)
    val dirFilters = predicateFilters(spark, root, anchor, predicate)
    val candidates = admittedDirs(root, snap, dirFilters)
    if (candidates.isEmpty) return 0L // skipping tiers proved a no-op
    val hit = coalesce(predicate, lit(false))
    val hits = taggedUnion(spark, root, candidates, anchor, snap.dvs,
      keepDvCols = true).filter(hit).cache()
    try {
      val deleted = hits.count()
      if (deleted == 0L) return 0L // pure no-op: no version burned
      val dvRel = stageDv(hits, root, version)
      val cdfRel =
        if (!doCdf) None
        else Some(stageChanges(
          hits.select(anchor.map(f => col(f.name)): _*)
            .withColumn("_change_type", lit("delete")),
          root, version, anchor))
      try {
        // dirs/stats/blooms carried VERBATIM: nothing physical changed.
        // Stats stay conservative (upper bounds over live rows).
        publish(root, version, parent, "delete", deleted,
          anchor.fieldNames.toSeq, snap.dataDirs, snap.dirStats,
          snap.dirBlooms, snap.txns, Some(anchor.json), cdfRel,
          snap.dvs :+ DvFile(dvRel, deleted,
            candidates.map(d => new File(d).getName)), snap.fstatsRefs)
        deleted
      } catch { case e: Throwable =>
        data.deleteTree(root, dvRel)
        cdfRel.foreach(d => data.deleteTree(root, d))
        throw e
      }
    } finally hits.unpersist()
  }

  /** Merge-on-read UPDATE — [[update]]'s semantics at O(updated rows)
    * commit cost: matched rows' positions land in a deletion vector, the
    * post-assignment images land as ONE fresh append-style dir (indexed
    * under the table's stats/bloom discipline), and every existing dir is
    * carried forward untouched. Assignments are evaluated against the
    * PRE-update row and cast back to the column's anchor type, exactly
    * like the copy-on-write twin; the CDF dir carries the same
    * pre/post-image pairs. Returns rows updated; a no-match UPDATE
    * commits nothing.
    */
  def updateMor(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column],
      cdf: Option[Boolean] = None): Long = {
    val doCdf = resolveCdf(root, cdf)
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    val snap = snapshot(root, parent)
    require(assignments.nonEmpty, "no assignments")
    val anchor = snapshotSchema(spark, root, snap)
    val unknown = assignments.keySet.diff(anchor.fieldNames.toSet)
    require(unknown.isEmpty,
      s"assignments target unknown columns: ${unknown.mkString(",")}")
    val dirFilters = predicateFilters(spark, root, anchor, predicate)
    val candidates = admittedDirs(root, snap, dirFilters)
    if (candidates.isEmpty) return 0L
    val hit = coalesce(predicate, lit(false))
    val hits = taggedUnion(spark, root, candidates, anchor, snap.dvs,
      keepDvCols = true).filter(hit).cache()
    try {
      val updated = hits.count()
      if (updated == 0L) return 0L
      val dvRel = stageDv(hits, root, version)
      // post-images as one fresh dir under the TABLE's indexing
      // discipline (union of the parent's per-dir stats/bloom columns)
      val post = hits.select(anchor.map { f =>
        assignments.get(f.name) match {
          case Some(a) => a.cast(f.dataType).as(f.name)
          case None    => col(f.name)
        }
      }: _*)
      val tableStatsCols = snap.dirStats.map(_.col).distinct
      val tableBloomCols = snap.dirBlooms.map(_.col).distinct
      val staged = stageDir(post, root, version,
        tableStatsCols, tableBloomCols, bloomFpp = 0.01, anchor = anchor)
      val cdfRel =
        if (!doCdf) None
        else {
          val pre = struct(anchor.map(f => col(f.name)) :+
            lit("update_preimage").as("_change_type"): _*)
          val postImg = struct(anchor.map { f =>
            assignments.get(f.name) match {
              case Some(a) => a.cast(f.dataType).as(f.name)
              case None    => col(f.name)
            }
          } :+ lit("update_postimage").as("_change_type"): _*)
          Some(stageChanges(hits.select(inline(array(pre, postImg))),
            root, version, anchor))
        }
      try {
        publish(root, version, parent, "update", updated,
          anchor.fieldNames.toSeq, snap.dataDirs :+ staged._1,
          snap.dirStats ++ staged._3, snap.dirBlooms ++ staged._4,
          snap.txns, Some(anchor.json), cdfRel,
          snap.dvs :+ DvFile(dvRel, updated,
            candidates.map(d => new File(d).getName)), snap.fstatsRefs)
        updated
      } catch { case e: Throwable =>
        data.deleteTree(root, dvRel)
        data.deleteTree(root, staged._1)
        staged._4.foreach(b => data.deleteFile(root, b.path))
        cdfRel.foreach(d => data.deleteTree(root, d))
        throw e
      }
    } finally hits.unpersist()
  }

  /** Merge-on-read MERGE — [[merge]]'s whole-row upsert contract at
    * O(source + matched rows) commit cost: matched table rows' positions
    * land in a deletion vector, the source lands as ONE fresh dir (its
    * rows are the post-images and the inserts), and NO existing dir is
    * rewritten or dropped — where the copy-on-write twin rewrites every
    * partially-matched dir, this commits O(delta) regardless of how many
    * dirs the keys touch. The continuous-upsert shape: a streaming silver
    * table maintained by per-batch merges pays O(batch) per commit, and
    * its CDF subscribers the same. Same candidate bounding (key hull +
    * bloom probes), key-uniqueness check, CDF images, and txn stamping as
    * [[merge]]. Returns the new version.
    */
  def mergeMor(spark: SparkSession, root: String, source: DataFrame,
      keyCol: String, maxProbeKeys: Int = 10000,
      bloomFpp: Double = 0.01, txn: Option[(String, Long)] = None,
      cdf: Option[Boolean] = None): Int = {
    val doCdf = resolveCdf(root, cdf)
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val version = parent + 1
    val snap = snapshot(root, parent)
    require(snap.schemaCols.toSet == source.columns.toSet,
      s"source columns ${source.columns.mkString(",")} must match table schema " +
        snap.schemaCols.mkString(","))
    val anchor = snapshotSchema(spark, root, snap)
    val src = conformTo(source, anchor).cache()
    try {
      val keyProbe = src.schema(keyCol).dataType match {
        case TimestampType                             => unix_micros(col(keyCol))
        case _: org.apache.spark.sql.types.NumericType => col(keyCol).cast("double")
        case StringType                                => col(keyCol)
        case _                                         => lit(null).cast("double")
      }
      val srcAgg = src.agg(count(lit(1)), countDistinct(col(keyCol)),
        min(keyProbe), max(keyProbe)).head()
      val (srcRows, srcKeys) = (srcAgg.getLong(0), srcAgg.getLong(1))
      require(srcRows == srcKeys,
        s"merge source is not key-unique on $keyCol: $srcRows rows, $srcKeys keys")
      require(srcRows > 0, "empty merge source")
      val hull =
        if (srcAgg.isNullAt(2)) Seq.empty
        else Seq(VersionedTable.RangeFilter(keyCol,
          toDouble(srcAgg.get(2)), toDouble(srcAgg.get(3))))
      var candidates = admittedDirs(root, snap, hull)
      val bloomFor = snap.dirBlooms.filter(_.col == keyCol).map(b => b.dir -> b).toMap
      if (srcKeys <= maxProbeKeys && bloomFor.nonEmpty) {
        val keys = src.select(col(keyCol)).collect().map(_.get(0))
        candidates = candidates.filter { d =>
          bloomFor.get(d).forall { b =>
            loadBloom(root, b).forall(bf => keys.exists(k => bloomProbe(bf, k)))
          }
        }
      }
      // matched LIVE table rows, with their row identities: the dv set
      // and the CDF pre-images in one cached frame
      val matched =
        if (candidates.isEmpty) None
        else Some(taggedUnion(spark, root, candidates, anchor, snap.dvs,
          keepDvCols = true)
          .join(broadcast(src.select(col(keyCol))), Seq(keyCol), "leftsemi")
          .cache())
      try {
        val m = matched.map(_.count()).getOrElse(0L)
        val dv = if (m == 0L) None
          else Some(DvFile(stageDv(matched.get, root, version), m,
            candidates.map(d => new File(d).getName)))
        val cdfRel =
          if (!doCdf) None
          else if (m == 0L)
            Some(stageChanges(
              src.select(anchor.map(f => col(f.name)): _*)
                .withColumn("_change_type", lit("insert")),
              root, version, anchor))
          else {
            val matchedTable = matched.get
              .select(anchor.map(f => col(f.name)): _*)
            val matchedKeys = matchedTable.select(col(keyCol)).distinct()
            val srcFlagged = src
              .join(broadcast(matchedKeys.withColumn("__m", lit(1))),
                Seq(keyCol), "left")
              .withColumn("_change_type",
                when(col("__m").isNotNull, "update_postimage")
                  .otherwise("insert"))
              .select(anchor.map(f => col(f.name)) :+ col("_change_type"): _*)
            Some(stageChanges(
              matchedTable
                .withColumn("_change_type", lit("update_preimage"))
                .unionByName(srcFlagged),
              root, version, anchor))
          }
        val tableStatsCols = snap.dirStats.map(_.col).distinct
        val tableBloomCols = snap.dirBlooms.map(_.col).distinct
        val srcStaged = stageDir(src, root, version,
          tableStatsCols, tableBloomCols, bloomFpp, anchor)
        try {
          publish(root, version, parent, "merge", srcRows,
            anchor.fieldNames.toSeq, snap.dataDirs :+ srcStaged._1,
            snap.dirStats ++ srcStaged._3, snap.dirBlooms ++ srcStaged._4,
            snap.txns ++ txn.toMap, Some(anchor.json), cdfRel,
            snap.dvs ++ dv, snap.fstatsRefs)
          version
        } catch { case e: Throwable =>
          data.deleteTree(root, srcStaged._1)
          srcStaged._4.foreach(b => data.deleteFile(root, b.path))
          dv.foreach(d => data.deleteTree(root, d.path))
          cdfRel.foreach(d => data.deleteTree(root, d))
          throw e
        }
      } finally matched.foreach(_.unpersist())
    } finally src.unpersist()
  }

  /** Fold every deletion vector back into the data: rewrite ONLY the dirs
    * the dv set actually touches (live rows staged fresh via the shared
    * [[stageRewrites]] kernel, inheriting each dir's stats/bloom
    * discipline), drop dirs with zero live rows, and publish ONE
    * `operation=optimize` manifest with an EMPTY dv list. Content is
    * preserved by construction — the new snapshot's live rows equal the
    * parent's — so change subscriptions cross the purge as an empty delta
    * (dataChange=false), never a resync. Untouched dirs are carried by
    * name. Returns the new version, or None when the table has no dvs
    * (no version burned).
    *
    * This is the maintenance valve for merge-on-read tables: MOR DML
    * keeps commits O(delta) and lets the read-side anti-join cost
    * accumulate; purge pays O(dv'd dirs) ONCE to reset it. Cost at
    * 100 TB: one small distinct over the dv files + one rewrite job over
    * the touched dirs — never O(table) unless every dir is dv'd.
    */
  def purgeDeletes(spark: SparkSession, root: String,
      bloomFpp: Double = 0.01): Option[Int] = {
    val parent = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = snapshot(root, parent)
    if (snap.dvs.isEmpty) return None
    val version = parent + 1
    val anchor = snapshotSchema(spark, root, snap)
    // dirs the dv set touches: distinct dir-prefix of the dv'd file
    // identities, intersected with the snapshot (stale entries for dirs a
    // later COW rewrite dropped admit nothing and cost nothing)
    val dvBases = dvFrame(spark, root, snap.dvs)
      .select(org.apache.spark.sql.functions
        .split(col("__file"), "/").getItem(0).as("__d"))
      .distinct().collect().map(_.getString(0)).toSet
    val affected = snap.dataDirs.filter(d => dvBases(new File(d).getName))
    if (affected.isEmpty) {
      // EVERY dv entry is stale (later COW DML rewrote or dropped all
      // dv'd dirs but carried the entries verbatim): there is nothing to
      // rewrite, and the purge is exactly the commit that clears the
      // dead state — publish the snapshot's dirs by name with an EMPTY
      // dv list. Content-preserving by construction: stale entries match
      // no live file identity, so dropping them changes no row.
      publish(root, version, parent, "optimize", 0L,
        anchor.fieldNames.toSeq, snap.dataDirs, snap.dirStats,
        snap.dirBlooms, snap.txns, Some(anchor.json), None, Seq.empty,
        snap.fstatsRefs)
      return Some(version)
    }
    val oldByBase = affected.map(d => new File(d).getName -> d).toMap
    val live = taggedUnion(spark, root, affected, anchor, snap.dvs)
    val (newByOld, newStats, newBlooms) =
      stageRewrites(spark, live, root, version, snap, oldByBase, anchor, bloomFpp)
    try {
      val affectedSet = affected.toSet
      // an affected dir with ZERO live rows emits no rewrite partition —
      // it is dropped from the manifest (files stay for time travel).
      // rows = per-commit delta convention: a purge adds nothing. The
      // purge is the same content-preserving scoped-rewrite shape as
      // OPTIMIZE WHERE, so it publishes through the same REBASING path —
      // a purge racing a streaming append re-lands carrying the winner's
      // dirs instead of starting the dv-fold rewrite over (the folded dvs
      // die with their scoped dirs; a dv the winner added on an UNSCOPED
      // dir rides along, and one on a scoped dir aborts loudly).
      val rewritten = snap.dataDirs.flatMap(d =>
        if (affectedSet(d)) newByOld.get(d) else None)
      Some(publishScopedRewrite(root, parent, snap, affectedSet, rewritten,
        newStats, newBlooms, anchor.json, anchor.fieldNames.toSeq,
        foldedDvPaths = snap.dvs.map(_.path).toSet))
    } catch { case e: Throwable =>
      newByOld.values.foreach(d => data.deleteTree(root, d))
      newBlooms.foreach(b => data.deleteFile(root, b.path))
      throw e
    }
  }

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
    // `analyze`/`evolve` versions reference the SAME dirs (backfilled
    // skipping metadata / a widened schema anchor); `optimize` replaces
    // the layout with IDENTICAL content (Delta's dataChange=false);
    // `rename`/`drop` move only the schema anchor (zero rows, files
    // byte-identical — the range-final anchor below serves every slice
    // under the final logical names via stable physical identity) —
    // additive no-ops for a consumer, never a reason to break a
    // subscription. `clone` is only ever a table's version 1 (its birth):
    // the whole snapshot IS the delta, same as a born-by-append table.
    // Anything else non-append is a wholesale replacement.
    snaps.filter(s => !Set("append", "analyze", "clone", "evolve", "optimize",
        "rename", "drop").contains(s.operation)) match {
      case bad if bad.nonEmpty =>
        throw new IllegalArgumentException(
          s"change feed crosses non-append versions ${bad.map(_.version).mkString(",")}: " +
            "an overwrite replaces the snapshot; re-derive consumers from it")
      case _ => ()
    }
    // PER-VERSION deltas, not a range-level dir-set difference: an
    // optimize inside the range swaps every dir name while adding zero
    // rows, so the range's delta is the union of each APPEND's own added
    // dirs (an append's original dirs stay readable until vacuumed even
    // after a later optimize drops them from the tip snapshot).
    val added = snaps.flatMap { s =>
      s.operation match {
        case "append" | "clone" =>
          val prev =
            if (s.version == 1) Set.empty[String]
            else snapshot(root, s.version - 1).dataDirs.toSet
          s.dataDirs.filterNot(prev)
        case _ => Seq.empty // analyze/evolve/optimize: content-preserving
      }
    }
    if (added.isEmpty) {
      // a pure-metadata range (analyze only): the delta is legitimately
      // empty — serve schema-correct emptiness on the snapshot's anchor
      val anchor = snapshotSchema(spark, root, snaps.last)
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        VersionedTable.logicalSchema(anchor))
    }
    // Same additive-evolution discipline as read(): a range spanning a
    // schema-widening commit must surface the union schema (the final
    // snapshot's anchor), not let one arbitrary footer win and silently
    // drop the new columns from the feed. Manifest-pinned when persisted;
    // legacy fallback = footer mergeSchema. Column-mapped anchors read
    // under PHYSICAL names (stable across renames — a pre-rename dir
    // serves the renamed column by its physical identity) and rename.
    val paths = added.map(d => new File(root, d).getPath)
    snaps.last.schemaJson match {
      case Some(_) =>
        val anchor = snapshotSchema(spark, root, snaps.last)
        if (VersionedTable.isMapped(anchor))
          toLogical(spark.read
            .schema(VersionedTable.physicalSchema(anchor)).parquet(paths: _*),
            anchor)
        else spark.read.schema(anchor).parquet(paths: _*)
      case None =>
        spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** Row-level change feed — [[changes]] generalized across DML commits:
    * every row changed in `(fromVersion, toVersion]` with its
    * `_change_type` (insert / update_preimage / update_postimage /
    * delete) and `_commit_version` — the Delta CDF contract
    * (`readChangeFeed`). Appends serve their added dirs as inserts with
    * ZERO extra storage; delete/update/merge commits serve the change
    * images the DML kernel persisted at commit (`cdf=` manifest line,
    * `_changes/` dir — O(changed rows)); analyze/no-op versions are
    * empty. A subscriber of an upserted silver table therefore consumes
    * O(changed rows) per commit instead of resyncing O(table) per batch —
    * the reference's real-time loop is exactly this shape (upserts feeding
    * continuous aggregates, `enhanced_anomaly_detection.py:176-201` +
    * refresh policies `sql/timescaledb_schema.sql:233-238`).
    *
    * Still LOUDLY refused: `overwrite`/`restore` in the range (wholesale
    * snapshot replacement has no row-level delta — re-derive and
    * resubscribe), and pre-CDF DML commits (no persisted images). Every
    * slice conforms to the range's FINAL schema anchor (additive
    * evolution null-fills).
    */
  def changeFeed(spark: SparkSession, root: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion >= 0 && toVersion > fromVersion,
      s"bad change range ($fromVersion, $toVersion]")
    val snaps = (fromVersion + 1 to toVersion).map(snapshot(root, _))
    snaps.filter(s => s.operation == "overwrite" || s.operation == "restore") match {
      case bad if bad.nonEmpty =>
        throw new IllegalArgumentException(
          s"change feed crosses non-additive versions ${bad.map(_.version).mkString(",")} " +
            s"(${bad.map(_.operation).distinct.mkString(",")}): a wholesale replacement " +
            "has no row-level delta; re-derive consumers from the snapshot")
      case _ => ()
    }
    val legacyDml = snaps.filter(s =>
      Set("delete", "update", "merge").contains(s.operation) && s.cdfDir.isEmpty)
    require(legacyDml.isEmpty,
      s"versions ${legacyDml.map(_.version).mkString(",")} are pre-CDF DML commits " +
        "(no persisted change images); re-derive consumers from the snapshot")
    val anchor = snapshotSchema(spark, root, snaps.last)
    val mapped = VersionedTable.isMapped(anchor)
    def conform(df: DataFrame): DataFrame =
      df.select(anchor.map { f =>
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      } :+ col("_change_type"): _*)
    val parts = snaps.flatMap { s =>
      s.operation match {
        case "append" | "clone" => // clone = a table's birth commit
          val prev =
            if (s.version == 1) Set.empty[String]
            else snapshot(root, s.version - 1).dataDirs.toSet
          val added = s.dataDirs.filterNot(prev)
          if (added.isEmpty) None
          else {
            val paths = added.map(d => new File(root, d).getPath)
            // mapped range: every slice reads under the range-FINAL
            // physical schema — physical identity is stable across
            // renames, so a pre-rename dir serves the renamed column
            // correctly under its final logical name
            val df =
              if (mapped) toLogical(spark.read
                .schema(VersionedTable.physicalSchema(anchor))
                .parquet(paths: _*), anchor)
              else s.schemaJson match {
                case Some(_) => spark.read
                  .schema(snapshotSchema(spark, root, s)).parquet(paths: _*)
                case None =>
                  spark.read.option("mergeSchema", "true").parquet(paths: _*)
              }
            Some(conform(df.withColumn("_change_type", lit("insert")))
              .withColumn("_commit_version", lit(s.version.toLong)))
          }
        case "delete" | "update" | "merge" =>
          // change images persist under PHYSICAL names; rename through
          // the final anchor (stale physical columns of since-dropped
          // fields pass through unrenamed and conform() drops them)
          val raw = spark.read.parquet(new File(root, s.cdfDir.get).getPath)
          val df = if (mapped) toLogical(raw, anchor) else raw
          Some(conform(df).withColumn("_commit_version", lit(s.version.toLong)))
        case _ => None // analyze/evolve/rename/drop etc.: zero rows changed
      }
    }
    if (parts.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(
          VersionedTable.logicalSchema(anchor).fields ++ Seq(
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType, nullable = false))))
    else parts.reduce(_ unionByName _)
  }

  /** Delete data dirs referenced ONLY by versions older than the retained
    * window (last `retainLast` versions) and their manifests, plus
    * UNREFERENCED orphan dirs (crashed or lost-race commits) older than
    * `orphanGraceMs`. The grace window is what makes vacuum safe to run
    * concurrently with writers: an in-flight commit's freshly-written dir
    * is unreferenced until its manifest publishes, and must not be reaped
    * out from under it — only an orphan that has sat unclaimed longer than
    * any plausible commit is dead. Dirs a below-cutoff manifest references
    * are deleted regardless of age (their only readers are gone with their
    * manifests). Returns the dir names actually deleted.
    */
  def vacuum(root: String, retainLast: Int = 2,
      orphanGraceMs: Long = 10 * 60 * 1000L,
      dryRun: Boolean = false): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    require(orphanGraceMs >= 0, "grace window must be non-negative")
    val latest = latestVersion(root).getOrElse(return Seq.empty)
    val cutoff = latest - retainLast + 1
    val committed = store.versions(root).toSet
    def dirsOf(vs: Iterable[Int]): Set[String] =
      vs.filter(committed.contains).flatMap(snapshot(root, _).dataDirs).toSet
    val retainedDirs = dirsOf(cutoff to latest)
    val expiredDirs = dirsOf(1 until cutoff) -- retainedDirs
    val now = nowMs()
    val live = data.list(root, "data")
      .filterNot(_.isFile).map(e => "data/" + e.name)
    val doomed = live.filterNot(retainedDirs.contains).filter { d =>
      expiredDirs.contains(d) ||
        data.modifiedMs(root, d) <= now - orphanGraceMs
    }
    // Deletion-vector files follow the DATA-dir lifecycle, not the CDF
    // one: a dv written at version k is CARRIED by every later manifest
    // until a purge/optimize folds it away, so liveness = referenced by a
    // retained manifest (never the name's version prefix). Unreferenced
    // dv dirs (lost races, purged-away sets below the cutoff) reap under
    // the same orphan grace discipline as data dirs.
    def dvsOf(vs: Iterable[Int]): Set[String] =
      vs.filter(committed.contains).flatMap(snapshot(root, _).dvs.map(_.path)).toSet
    val retainedDvs = dvsOf(cutoff to latest)
    val expiredDvs = dvsOf(1 until cutoff) -- retainedDvs
    val liveDvs = data.list(root, "_dv")
      .filterNot(_.isFile).map(e => "_dv/" + e.name)
    val doomedDvs = liveDvs.filterNot(retainedDvs.contains).filter { d =>
      expiredDvs.contains(d) ||
        data.modifiedMs(root, d) <= now - orphanGraceMs
    }
    // DRY RUN: the operator-safety form — report exactly what a real run
    // would reap, touch nothing (no dirs, no sidecars, no manifests)
    if (dryRun) return (doomed ++ doomedDvs).sorted
    val deleted = doomed.filter { d =>
      data.deleteTree(root, d)
      !data.exists(root, d) // report only what actually died
    }
    // A dead dir's bloom sidecars die with it (they are named by the dir —
    // commit writes `<dir>_<col>.bloom`, analyze `<dir>-<token>-_<col>.bloom`
    // — so orphaned sidecars are exactly the ones whose dir-name prefix is
    // gone; dir names can't prefix each other within a version, each carries
    // its own random token).
    deleted.foreach { d =>
      val prefix = new File(d).getName
      data.list(root, "_blooms").filter(_.name.startsWith(prefix))
        .foreach(e => data.deleteFile(root, s"_blooms/${e.name}"))
      // fstats sidecars are dir-named like blooms and die the same death
      data.list(root, "_fstats").filter(_.name.startsWith(prefix))
        .foreach(e => data.deleteFile(root, s"_fstats/${e.name}"))
    }
    // History outlives manifest retention BY CONTRACT: roll a summary
    // checkpoint at the current tip BEFORE any manifest dies, so versions
    // between the last periodic checkpoint and the cutoff keep their
    // DESCRIBE HISTORY rows. Strict (not the commit path's best-effort):
    // failing the vacuum loudly beats silently losing history.
    if (cutoff > 1) writeCheckpoint(root, latest)
    (1 until cutoff).foreach(store.delete(root, _))
    // checkpoint GC: only the NEWEST summary rollup is ever read (it
    // subsumes all older ones — including the history of manifests this
    // vacuum just dropped), so superseded checkpoint files die here
    val cps = Option(checkpointDir(root).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.startsWith("v"))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("v").toInt).toOption
        .map(_ -> f))
    if (cps.size > 1) cps.sortBy(_._1).dropRight(1).foreach(_._2.delete())
    // CDF change dirs die with their manifests: below the cutoff nobody
    // can address them (changeFeed ranges need both end manifests)
    data.list(root, "_changes").filterNot(_.isFile)
      .foreach { e =>
        // name = v%05d-<token>
        val v = e.name.stripPrefix("v").takeWhile(_.isDigit)
        if (v.nonEmpty && v.toInt < cutoff)
          data.deleteTree(root, s"_changes/${e.name}")
      }
    val deletedDvs = doomedDvs.filter { d =>
      data.deleteTree(root, d)
      !data.exists(root, d)
    }
    (deleted ++ deletedDvs).sorted
  }

  /** Wall-clock-true VACUUM retention (`VACUUM t RETAIN n HOURS`): every
    * version COMMITTED inside the window survives, judged on the
    * manifests' actual `committed_ms` stamps — not a version-count proxy
    * — and the latest always survives. The timestamp walk rides
    * [[historySummary]] (checkpoint + O(tail) manifest parses), so a
    * streaming sink's 8 600-commits/day table prices this at one small
    * file read, never O(versions). Delegates to the version-form
    * [[vacuum]] once the window resolves to a cutoff.
    */
  def vacuumRetain(root: String, retainMs: Long,
      orphanGraceMs: Long = 10 * 60 * 1000L,
      dryRun: Boolean = false): Seq[String] = {
    require(retainMs >= 0, "retention window must be non-negative")
    val latest = latestVersion(root).getOrElse(return Seq.empty)
    val cutoffMs = nowMs() - retainMs
    val inWindow = historySummary(root)
      .filter(_.committedMs >= cutoffMs).map(_.version)
    val oldestKept = if (inWindow.isEmpty) latest else math.min(inWindow.min, latest)
    vacuum(root, latest - oldestKept + 1, orphanGraceMs, dryRun)
  }
}

object VersionedTable extends VersionedTableOps(CommitStore.local) {

  /** Table property that turns on row-level CDF image staging for every
    * DML commit against the table (set via `_props` /
    * `TBLPROPERTIES('graft.cdf.enabled'='true')`). Default OFF.
    */
  val CdfEnabledProp = "graft.cdf.enabled"

  /** StructField metadata key carrying a column's PHYSICAL (on-disk
    * parquet) name when it differs from the logical name — the manifest's
    * column-mapping seam (Delta's `delta.columnMapping.physicalName`
    * shape). Physical names are assigned at column creation and NEVER
    * change; RENAME COLUMN moves only the logical name, DROP COLUMN only
    * removes the field from the anchor — data files stay byte-identical.
    */
  val PhysicalNameKey = "graft.physicalName"

  /** `_props` marker set by the first rename/drop: once a table has ever
    * been mapped, columns added later get RANDOMIZED physical names so a
    * DROP followed by a re-ADD of the same logical name can never
    * resurrect the dropped column's old values from pre-drop files.
    */
  val ColumnMappingProp = "graft.column.mapping"

  /** `_props` key: write a `_checkpoint/v%05d` history rollup every N
    * commits (default 10). The checkpoint is a CACHE of per-version
    * summaries — losing one costs a longer walk, never correctness.
    */
  val CheckpointIntervalProp = "graft.checkpoint.interval"

  /** Per-root monitors serializing `_props` read-merge-writes within this
    * JVM (the OS file lock covers cross-process writers).
    */
  private[sources] val propsLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Roots already given the one-time "DML skipped CDF on a table with
    * prior change images" migration warning.
    */
  private[sources] val cdfSkipWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Process-wide cache of parsed `_fstats` sidecars, keyed by absolute
    * path. Sound because sidecar files are IMMUTABLE (attempt-unique
    * names, never rewritten in place) — a replaced dir gets a NEW sidecar
    * under a new name. Bounded crudely: cleared when it grows past the
    * size any one scan plausibly needs live.
    */
  private[sources] val fstatsCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[DirStat]]

  /** One commit's summary as recorded in a history checkpoint — all that
    * DESCRIBE HISTORY / `graft_table_history` / wall-clock time travel
    * need, so none of them has to parse O(versions) full manifests.
    */
  final case class HistoryEntry(version: Int, parent: Int, operation: String,
      rows: Long, committedMs: Long, nDirs: Int, hasCdf: Boolean)

  /** A field's on-disk parquet column name (logical name unless mapped). */
  def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** Does any field of this anchor carry a logical→physical mapping?
    * Unmapped tables (the overwhelmingly common case) take exactly the
    * pre-mapping code paths — zero plan or I/O change.
    */
  def isMapped(schema: org.apache.spark.sql.types.StructType): Boolean =
    schema.fields.exists(_.metadata.contains(PhysicalNameKey))

  /** The anchor with every field under its PHYSICAL name (clean metadata)
    * — the schema data-dir reads and writes use.
    */
  def physicalSchema(anchor: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(anchor.fields.map(f =>
      org.apache.spark.sql.types.StructField(physicalName(f), f.dataType, f.nullable)))

  /** The anchor with mapping metadata stripped — what user-facing frames
    * and catalog schemas report (the mapping is storage detail).
    */
  def logicalSchema(anchor: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(anchor.fields.map { f =>
      if (!f.metadata.contains(PhysicalNameKey)) f
      else {
        val b = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).remove(PhysicalNameKey).build()
        f.copy(metadata = b)
      }
    })

  final case class Snapshot(
      version: Int,
      parent: Int,
      operation: String,
      rows: Long,
      schemaCols: Seq[String],
      dataDirs: Seq[String],
      committedMs: Long = 0L,
      dirStats: Seq[DirStat] = Seq.empty,
      dirBlooms: Seq[DirBloom] = Seq.empty,
      txns: Map[String, Long] = Map.empty,
      schemaJson: Option[String] = None,
      cdfDir: Option[String] = None,
      dvs: Seq[DvFile] = Seq.empty,
      fstatsRefs: Map[String, String] = Map.empty)

  /** One deletion-vector file, as recorded in the manifest
    * (`dv=<relative-path>|<rows>`): a parquet dir under `_dv/` whose rows
    * name deleted positions — `__file` = "dirBase/fileName" (the data
    * file's table-relative identity, stable across clones and table
    * moves), `__pos` = the row's `_metadata.row_index` within that file.
    * A snapshot's LIVE rows are its dirs' rows MINUS the union of its dv
    * files — the merge-on-read contract (Delta deletion vectors /
    * Iceberg positional deletes, re-expressed over the commit log).
    * `rows` (the file's entry count) prices the read-side anti-join:
    * below [[VersionedTable.dvBroadcastMaxRows]] the dv set broadcasts.
    */
  final case class DvFile(path: String, rows: Long,
      bases: Seq[String] = Seq.empty)

  /** Deletion-vector file schema: see [[DvFile]]. */
  val dvSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__file",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("__pos",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** Above this many total deleted positions the read-side anti-join
    * stops broadcasting the dv set and falls back to a shuffled anti-join
    * — correct at any size, but a signal the table wants
    * [[VersionedTableOps.purgeDeletes]] (or OPTIMIZE, which folds dvs
    * away as part of re-layout).
    */
  val dvBroadcastMaxRows: Long = 4000000L

  /** Per-dir min/max of one column, as recorded in the manifest. Values are
    * numeric images: timestamps as epoch micros, numerics as doubles —
    * comparison-faithful for pruning (micros stay below 2^53, so the double
    * image is exact); pruning is conservative either way (a dir is skipped
    * only when its whole range misses the predicate).
    */
  final case class DirStat(dir: String, col: String, min: Double, max: Double,
      file: Option[String] = None)

  /** Per-dir bloom sidecar pointer for one column, as recorded in the
    * manifest (`bloom=<dir>|<col>|<relative-path>`). The sidecar holds a
    * serialized Spark `BloomFilter` over the dir's values; probing it
    * answers "definitely absent" for equality predicates, which min/max
    * range stats cannot (a point key intersects every dir's range).
    */
  final case class DirBloom(dir: String, col: String, path: String)

  /** One conjunct of a composed-skipping read (see
    * [[VersionedTableOps.readFiltered]]): each admits or dismisses a whole
    * data dir from the manifest's stats/sidecars before any data I/O.
    */
  sealed trait DirFilter

  /** `col BETWEEN lo AND hi` in the stats' numeric image (epoch micros for
    * timestamps, double otherwise) — consults manifest min/max.
    */
  final case class RangeFilter(col: String, lo: Double, hi: Double) extends DirFilter

  /** `col = value` (integral or string, the bloom domain) — consults the
    * min/max tier first for numeric probes, then the bloom sidecar.
    */
  final case class PointFilter(col: String, value: Any) extends DirFilter

  /** Disjunction of conjunctions — `(a ∧ b) ∨ (c ∧ d)`: a dir survives if
    * ANY branch's filters all admit it. The shape `symbol IN ('A','B')`
    * and general OR predicates translate to; each branch's point filters
    * still ride the bloom tier, so a multi-key probe skips every dir
    * holding none of the keys.
    */
  final case class AnyOf(branches: Seq[Seq[DirFilter]]) extends DirFilter

  /** Order-preserving numeric image of a string: its first 6 UTF-8 bytes
    * big-endian, zero-padded — an integer < 2^48, exact in a Double. This
    * is how STRING `statsCols` ride the numeric min/max stats tier (the
    * Delta string-stats analogue, truncated like Delta's 32-char prefix):
    * byte-wise UTF-8 order is exactly Spark's binary string collation
    * (`UTF8String.compareTo`), and prefix truncation is monotone
    * NON-STRICT — `x <= y  ⇒  image(x) <= image(y)` — so every range or
    * point dismissal against image stats is conservative: a dismissed dir
    * provably holds no matching row; dirs sharing a 6-byte prefix with the
    * probe merely survive. Ties beyond 6 bytes are the bloom sidecars' and
    * the row-level predicate's job.
    */
  /** Additive schema union: parent fields first (keeping their types), then
    * the batch's NEW fields appended — the same discipline mergeSchema
    * applies at read time, decided once at commit time and persisted.
    */
  def mergeSchemas(parent: org.apache.spark.sql.types.StructType,
      batch: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      parent.fields ++ batch.fields.filterNot(f => parent.fieldNames.contains(f.name)))

  /** Deep-nullable image of a schema — what a parquet round-trip reports
    * (a snapshot spans many files; any may hold nulls for any column, and
    * additive evolution null-fills older dirs). The persisted manifest
    * schema is normalized through this so the anchor a manifest serves is
    * bit-identical to the anchor a footer read would have served.
    */
  def asNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
      case a: ArrayType => a.copy(elementType = asNullable(a.elementType), containsNull = true)
      case m: MapType => m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  def strImage(s: String): Double = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L); i += 1 }
    v.toDouble
  }

  final class CommitConflictException(version: Int)
    extends RuntimeException(
      s"commit conflict: version $version was committed concurrently; " +
        "re-read latestVersion and retry")

  /** A scoped maintenance rewrite lost its conditional put to a commit
    * that TOUCHED the scope (DML rewrote a scoped dir, a dv landed on one,
    * or the schema anchor moved) — not rebasable, by design loud.
    */
  final class ConcurrentScopeException(root: String, why: String)
    extends RuntimeException(s"scoped rewrite on $root conflicts: $why")

  /** Total scoped-rewrite rebases this process performed — observability
    * for the maintenance-vs-writer race (asserted by the race tests).
    */
  val rebaseCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Depth-first delete handling nested dirs (e.g. a crashed Spark write's
    * `_temporary` tree). Returns true iff `f` no longer exists.
    */
  private[sources] def deleteRecursively(f: File): Boolean = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete() || !f.exists()
  }

  /** Mirror `src`'s file tree at `dst` via hardlinks (zero bytes copied;
    * the clone primitive). Falls back to a byte copy where the filesystem
    * refuses links (cross-device, or no link support) — correctness never
    * depends on the link succeeding, only cost does.
    */
  private[graft] def linkTree(src: File, dst: File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).toSeq.flatten
        .foreach(f => linkTree(f, new File(dst, f.getName)))
    } else {
      Option(dst.getParentFile).foreach(_.mkdirs())
      try java.nio.file.Files.createLink(dst.toPath, src.toPath)
      catch {
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          java.nio.file.Files.copy(src.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
      }
    }
  }
}
