package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming source over a [[VersionedTable]]'s change feed —
  * the subscription form of [[ChangeFeedCursor]]: instead of a consumer
  * polling `processNew`, a downstream aggregate just `readStream`s the
  * commit log, the way the reference's second-stage OHLC streams its raw
  * Delta directory (`spark/streaming_feature_updates.py:102`, Delta's
  * `startingVersion` semantics).
  *
  * {{{
  *   spark.readStream
  *     .format("graft-changefeed")            // or the provider class name
  *     .option("root", tableRoot)
  *     .option("startingVersion", "0")        // exclusive; default 0 = table birth
  *     .option("maxVersionsPerTrigger", "10") // optional rate cap per batch
  *     .load()
  * }}}
  *
  * Offsets ARE commit versions: `getOffset` reports the latest committed
  * version (one small listing — never a data scan), and each micro-batch
  * reads exactly the `(startVersion, endVersion]` delta through
  * [[VersionedTableOps.changes]] — O(delta) dirs, so a subscriber that
  * fell N versions behind catches up in ONE batch, not N. The streaming
  * engine's offset WAL is the cursor: exactly-once end-to-end with any
  * idempotent sink (checkpointed `foreachBatch` MERGE, or a downstream
  * [[VersionedTableOps.idempotentCommit]] keyed by batch id — the same
  * discipline as the cursor's at-least-once + idempotent-apply contract).
  *
  * An overwrite commit in an unconsumed range is not an additive delta;
  * the batch fails loudly (from `changes`) rather than emitting retracted
  * rows — the consumer re-derives from the snapshot and resubscribes with
  * `startingVersion` = the overwrite version, mirroring
  * [[ChangeFeedCursor.resync]] and Delta-without-`ignoreChanges`. A
  * subscriber so far behind that vacuum dropped its range fails the same
  * loud way with the same remedy.
  *
  * Scale shape: the driver-side planning cost per batch is one manifest
  * read; data cost is the delta's files only. At 100 TB the subscription
  * never touches table history — exactly the cursor's contract, now
  * wire-compatible with every Structured Streaming sink, trigger, and
  * checkpoint mechanism.
  */
final class ChangeFeedSource(
    sqlContext: SQLContext,
    root: String,
    startingVersion: Int,
    maxVersionsPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long],
    providedSchema: Option[StructType],
    readChangeFeed: Boolean = false,
    schemaTrackingLocation: Option[String] = None)
  extends Source with SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession

  // --- schema tracking (Delta's schemaTrackingLocation shape) -----------
  // With `option("schemaTrackingLocation", dir)` the subscription PERSISTS
  // its logical anchor (WITH the column-mapping metadata — physical
  // identity is what makes old batches conformable) and can cross
  // RENAME/DROP COLUMN commits: on first contact with a reshape version
  // the source rolls the tracked anchor forward and fails ONE restartable
  // time; the restarted query re-pins on the tracked anchor and every
  // batch — including a recovery replay of pre-rename ranges — serves
  // under the NEW logical names via stable physical identity (a rename
  // moves no bytes, so the physical column addresses the same data in
  // every era's files). Without the option the pre-r16 contract stands:
  // refuse the reshape loudly with the resubscribe remedy.
  private val tracked: Option[(Int, StructType)] =
    schemaTrackingLocation.map { loc =>
      ChangeFeedSource.readTracked(loc).getOrElse {
        val v = VersionedTable.latestVersion(root).getOrElse(
          throw new IllegalArgumentException(s"empty versioned table at $root"))
        val anchor = VersionedTable.anchorAt(spark, root, v)
        ChangeFeedSource.writeTracked(loc, v, anchor)
        (v, anchor)
      }
    }

  /** The pinned LOGICAL anchor (mapping metadata retained in tracked
    * mode — needed to conform batches by physical identity).
    */
  private val pinnedAnchor: StructType = tracked match {
    case Some((_, anchor)) => anchor
    case None => providedSchema.getOrElse(VersionedTable.read(spark, root).schema)
  }

  // Schema resolution happens once, at source construction (the table must
  // have at least one commit by then — same contract as Delta's source).
  // CDF mode (`option("readChangeFeed", "true")`) appends the Delta CDF
  // meta columns: each batch serves row-level change images across DML
  // commits (VersionedTable.changeFeed) instead of refusing them —
  // subscribers of an upserted table consume O(changed rows) per commit.
  override val schema: StructType = {
    val base = VersionedTable.logicalSchema(pinnedAnchor)
    if (!readChangeFeed) base
    else if (base.fieldNames.contains("_change_type")) base // already meta'd
    else org.apache.spark.sql.types.StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))
  }

  private def toVersion(o: OffsetV2): Int = o match {
    case l: LongOffset       => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other               => other.json.trim.toInt
  }

  override def getOffset: Option[Offset] =
    VersionedTable.latestVersion(root).filter(_ > startingVersion)
      .map(v => LongOffset(v.toLong))

  // --- admission control (SupportsAdmissionControl / AvailableNow) -------
  // With SupportsTriggerAvailableNow the engine drains MULTIPLE rate-capped
  // micro-batches up to the target pinned at query start, instead of
  // falling back to one catch-all batch; `maxVersionsPerTrigger` bounds
  // each batch's commit range (Delta's maxFilesPerTrigger analogue — the
  // knob that keeps a far-behind subscriber's catch-up batches bounded).
  // Restart safety is structural: the engine hands the start position in
  // (from its offset WAL), so the source needs no position state of its own.

  /** Pinned at AvailableNow query start: commits landing DURING the run
    * are left for the next run (the AvailableNow contract).
    */
  @volatile private var availableNowTarget: Option[Option[Int]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(VersionedTable.latestVersion(root))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Dirs version `v`'s delta would read — appends: the data dirs added
    * over the parent; DML commits in CDF mode: the persisted change-image
    * dir. Driver-side manifest metadata only.
    */
  private def addedDirs(v: Int): Seq[String] = {
    val snap = VersionedTable.snapshot(root, v)
    // content-preserving versions (metadata backfill / schema widening /
    // layout rewrite) are empty deltas — an optimize must not be priced
    // as if the whole re-laid-out table were new data
    if (Set("analyze", "evolve", "optimize").contains(snap.operation)) Seq.empty
    else if (readChangeFeed &&
        Set("delete", "update", "merge").contains(snap.operation))
      snap.cdfDir.toSeq
    else {
      val prev =
        if (v <= 1) Set.empty[String]
        else VersionedTable.snapshot(root, v - 1).dataDirs.toSet
      snap.dataDirs.filterNot(prev)
    }
  }

  /** On-disk bytes of one data dir (one listing; no data read). */
  private def dirBytes(d: String): Long =
    Option(new java.io.File(root, d).listFiles()).toSeq.flatten
      .filter(_.isFile).map(_.length).sum

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(start).map(toVersion).getOrElse(startingVersion)
    val latest = availableNowTarget match {
      case Some(pinned) => pinned.getOrElse(startingVersion) // pinned (possibly empty) table
      case None         => VersionedTable.latestVersion(root).getOrElse(startingVersion)
    }
    val base = from.max(startingVersion)
    val countCapped = maxVersionsPerTrigger
      .map(n => math.min(base + n, latest)).getOrElse(latest)
    // Bytes-based admission (Delta's maxBytesPerTrigger analogue): the
    // version cap alone can't bound a batch — ONE fat commit is still a
    // monster — so versions admit while their deltas' on-disk bytes fit
    // the cap. The FIRST version always admits (progress guarantee, like
    // Delta: a single over-cap commit becomes its own batch); sizing costs
    // one manifest read + one dir listing per considered version, never a
    // data scan. A vacuumed parent manifest prices the delta as infinite —
    // the batch shrinks to that version alone and getBatch's loud
    // resync contract takes it from there.
    val to = maxBytesPerTrigger match {
      case None => countCapped
      case Some(cap) =>
        var v = base
        var bytes = 0L
        var done = false
        while (!done && v < countCapped) {
          val b =
            try addedDirs(v + 1).map(dirBytes).sum
            catch { case _: IllegalArgumentException => Long.MaxValue / 4 }
          if (v == base || bytes + b <= cap) { bytes += b; v += 1 }
          else done = true
        }
        v
    }
    if (to > from && to > startingVersion) LongOffset(to.toLong) else null
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val from = start.map(toVersion).getOrElse(startingVersion)
    val to = toVersion(end)
    // Recovery can replay a degenerate range (start == end) when restoring
    // a fully-committed batch; serve it as an empty frame, not an error.
    // A rename/drop mid-subscription would silently null-fill or drop
    // columns under the subscriber's PINNED schema (aligned by name
    // below) — without schema tracking, refuse loudly with the
    // resubscribe remedy, the same contract Delta applies to streaming
    // reads across column-mapping changes without a schemaTrackingLocation.
    // WITH tracking: roll the persisted anchor forward and fail ONE
    // restartable time; the restarted source (already re-pinned on the
    // new anchor) serves this very range again via physical identity.
    if (to > from) {
      val snaps = (from + 1 to to).map(VersionedTable.snapshot(root, _))
      val reshaped = snaps
        .filter(s => s.operation == "rename" || s.operation == "drop")
      tracked match {
        case None =>
          // untracked: additive evolution (`evolve`) keeps serving the
          // pinned projection — new columns appear on resubscribe, Delta's
          // default contract; only the DESTRUCTIVE reshapes refuse
          require(reshaped.isEmpty,
            s"versions ${reshaped.map(_.version).mkString(",")} rename/drop columns " +
              "mid-subscription; resubscribe to pick up the new schema (or set " +
              "option 'schemaTrackingLocation' to cross column-mapping changes)")
        case Some((tv, _)) =>
          // tracked: ADDITIVE changes roll the anchor too — a widened
          // table starts serving its new columns after the same ONE
          // restartable failure as a rename (pre-evolve files null-fill
          // them, the batch-read anchor-pinned semantics), instead of
          // freezing the stale projection until someone resubscribes
          val rolling = reshaped ++ snaps.filter(_.operation == "evolve")
          if (rolling.nonEmpty && rolling.map(_.version).max > tv) {
            val newAnchor = VersionedTable.anchorAt(spark, root, to)
            ChangeFeedSource.writeTracked(schemaTrackingLocation.get, to, newAnchor)
            throw new IllegalStateException(
              s"[GRAFT_SCHEMA_CHANGED] versions ${rolling.map(_.version).mkString(",")} " +
                s"change the schema; the tracked schema at ${schemaTrackingLocation.get} " +
                s"has been rolled forward to version $to — restart the stream to " +
                "continue under the new columns")
          } // else: reshape already absorbed into the tracked anchor
      }
    }
    val batch = graft.BenchProbe.time("cfs.get_batch") {
      if (to <= from)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else if (readChangeFeed) VersionedTable.changeFeed(spark, root, from, to)
      else VersionedTable.changes(spark, root, from, to)
    }
    // A streaming query's schema is PINNED at subscription. Additive
    // evolution mid-subscription must not kill the consumer: project every
    // delta onto the pinned schema (pre-evolution deltas null-fill columns
    // the subscriber knows about; post-evolution deltas drop columns it
    // doesn't — they become visible by resubscribing, Delta's contract).
    // Tracked mode aligns by PHYSICAL identity instead of name: the batch
    // carries the range-final logical names, which may predate the
    // tracked anchor's (a recovery replay of a pre-rename range) — the
    // frozen physical name is the join key that cannot drift.
    val aligned = tracked match {
      case None =>
        batch.select(schema.map { f =>
          if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
      case Some(_) =>
        val anchorTo =
          if (to > from) VersionedTable.anchorAt(spark, root, to) else pinnedAnchor
        val srcByPhys = anchorTo.fields
          .map(f => VersionedTable.physicalName(f) -> f.name).toMap
        val physByPinned = pinnedAnchor.fields
          .map(f => f.name -> VersionedTable.physicalName(f)).toMap
        batch.select(schema.map { f =>
          // ONLY the CDF meta columns may match by name — they have no
          // physical identity. For anchor columns the physical name is the
          // sole join key: a pinned column absent from the range-final
          // anchor was DROPPED there (possibly re-added later under the
          // same logical name but a NEW physical name), and falling back
          // to by-name would serve the dropped column's old values under
          // the re-added column — the resurrection column mapping exists
          // to prevent. Null-fill instead.
          val srcName =
            if (ChangeFeedSource.MetaCols(f.name)) Some(f.name)
            else physByPinned.get(f.name).flatMap(srcByPhys.get)
          srcName.filter(batch.columns.contains) match {
            case Some(n) => col(n).cast(f.dataType).as(f.name)
            case None    => lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
    }
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(aligned)
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangeFeedSource[$root, starting>$startingVersion]"
}

object ChangeFeedSource {

  /** The CDF-only columns that legitimately align by NAME in tracked mode
    * (they carry no `graft.physicalName` — they are synthesized per batch,
    * never stored in a data file).
    */
  val MetaCols: Set[String] =
    Set("_change_type", "_commit_version", "_commit_timestamp")

  /** The persisted tracked anchor: `<loc>/latest`, line 1 = the version
    * whose anchor this is, line 2 = the anchor's StructType json WITH the
    * column-mapping metadata (`graft.physicalName`) — the metadata IS the
    * tracking (physical identity is how old batches conform to new
    * names). Torn-file-safe via temp+atomic-rename; a racing writer's
    * duplicate is byte-equivalent (anchors are deterministic per version).
    */
  def readTracked(loc: String): Option[(Int, StructType)] = {
    val f = new java.io.File(loc, "latest")
    if (!f.isFile) None
    else {
      val lines = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").split("\n", 2)
      Some((lines(0).trim.toInt,
        org.apache.spark.sql.types.DataType.fromJson(lines(1))
          .asInstanceOf[StructType]))
    }
  }

  def writeTracked(loc: String, version: Int, anchor: StructType): Unit = {
    val dir = new java.io.File(loc)
    dir.mkdirs()
    val tmp = java.io.File.createTempFile("track", ".tmp", dir)
    java.nio.file.Files.write(tmp.toPath,
      s"$version\n${anchor.json}".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, new java.io.File(dir, "latest").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}

/** `format("graft-changefeed")` registration (via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister);
  * the fully-qualified class name works too.
  */
final class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changefeed"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("root",
      throw new IllegalArgumentException(
        "graft-changefeed requires option 'root' (the versioned table path)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    // tracked-mode restarts re-pin on the PERSISTED anchor (this is how a
    // restart after [GRAFT_SCHEMA_CHANGED] picks up the new names)
    val trackedBase = parameters.get("schemaTrackingLocation")
      .flatMap(ChangeFeedSource.readTracked)
      .map { case (_, a) => VersionedTable.logicalSchema(a) }
    val base = trackedBase.orElse(schema).getOrElse(
      VersionedTable.read(sqlContext.sparkSession, rootOf(parameters)).schema)
    val full =
      if (!parameters.get("readChangeFeed").exists(_.toBoolean) ||
          base.fieldNames.contains("_change_type")) base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)))
    (shortName(), full)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val maxPer = parameters.get("maxVersionsPerTrigger").map(_.toInt)
    maxPer.foreach(n => require(n > 0, s"maxVersionsPerTrigger must be > 0, got $n"))
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    maxBytes.foreach(n => require(n > 0, s"maxBytesPerTrigger must be > 0, got $n"))
    new ChangeFeedSource(sqlContext, rootOf(parameters),
      parameters.getOrElse("startingVersion", "0").toInt, maxPer, maxBytes, schema,
      readChangeFeed = parameters.get("readChangeFeed").exists(_.toBoolean),
      schemaTrackingLocation = parameters.get("schemaTrackingLocation"))
  }
}
