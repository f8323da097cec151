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
    readChangeFeed: Boolean = false) extends Source with SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession

  // Schema resolution happens once, at source construction (the table must
  // have at least one commit by then — same contract as Delta's source).
  // CDF mode (`option("readChangeFeed", "true")`) appends the Delta CDF
  // meta columns: each batch serves row-level change images across DML
  // commits (VersionedTable.changeFeed) instead of refusing them —
  // subscribers of an upserted table consume O(changed rows) per commit.
  override val schema: StructType = {
    val base = providedSchema.getOrElse(VersionedTable.read(spark, root).schema)
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
    // below) — refuse loudly with the resubscribe remedy instead, the
    // same contract Delta applies to streaming reads across column-
    // mapping changes. Batch changeFeed() handles such ranges fine (it
    // conforms via stable physical identity); only the pinned-schema
    // streaming path must not cross them.
    if (to > from) {
      val reshaped = (from + 1 to to).map(VersionedTable.snapshot(root, _))
        .filter(s => s.operation == "rename" || s.operation == "drop")
      require(reshaped.isEmpty,
        s"versions ${reshaped.map(_.version).mkString(",")} rename/drop columns " +
          "mid-subscription; resubscribe to pick up the new schema")
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
    val aligned = batch.select(schema.map { f =>
      if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(aligned)
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangeFeedSource[$root, starting>$startingVersion]"
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
    val base = schema.getOrElse(
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
      readChangeFeed = parameters.get("readChangeFeed").exists(_.toBoolean))
  }
}
