package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** Structured-Streaming SINK into a [[VersionedTable]] — the publish half
  * of the lakehouse loop whose subscribe half is `format("graft-changefeed")`
  * ([[ChangeFeedSource]]). Together they make the versioned table a full
  * streaming medium: a bronze table's commits stream into a silver table as
  * commits of its own, each stage exactly-once, the medallion topology the
  * reference runs over raw→feature Delta paths
  * (`spark/streaming_feature_updates.py:96-118`).
  *
  * {{{
  *   df.writeStream
  *     .format("graft-versioned")          // or the provider class name
  *     .option("root", tableRoot)
  *     .option("appId", "silver-ohlc")     // txn writer identity (required)
  *     .option("statsCols", "time")        // optional: manifest min/max
  *     .option("bloomCols", "symbol")      // optional: bloom sidecars
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  *
  * Exactly-once is the [[VersionedTableOps.transactionalCommit]] contract:
  * every micro-batch commit carries a `txn=(appId, batchId)` manifest line,
  * and an at-least-once redelivery (engine crash between the sink commit
  * and the checkpoint commit) finds its batch id at or below the app's
  * high-water mark and is absorbed. Foreign writers racing the same table
  * are retried around, not clobbered — the conditional-put [[CommitStore]]
  * protocol underneath. Distinct concurrent writer queries MUST use
  * distinct appIds (same rule as Delta's `txnAppId`).
  *
  * Output modes: Append → each batch is an append commit (the delta IS the
  * batch, so downstream changefeed subscribers compose); Complete → each
  * batch is an overwrite commit (the streaming-aggregate result replaces
  * the snapshot — downstream must resubscribe across it, which is exactly
  * the change feed's overwrite contract). Update is rejected: keyed upsert
  * belongs to `foreachBatch` + `mergeIntoKeyed`.
  *
  * Scale shape: per batch, one data-dir write (O(batch)) + one conditional
  * metadata put + an O(1) high-water check on the latest manifest (every
  * manifest carries every app's mark forward) — the table is never
  * scanned, so sink cost is independent of table size.
  */
final class VersionedSink(
    root: String,
    appId: String,
    mode: String,
    statsCols: Seq[String],
    bloomCols: Seq[String],
    bloomFpp: Double) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // The engine hands a streaming (incremental-execution) frame that
    // refuses batch writes; re-plan its rows as a batch frame first.
    val batch = org.apache.spark.sql.graft.StreamingBridge.asBatch(data)
    // An EMPTY micro-batch (watermark-only / state-flush triggers emit
    // them) is skipped outright: committing it would burn a version per
    // idle trigger and give changefeed subscribers empty deltas to drain.
    // Exactly-once is unaffected — a redelivery of the empty batch is
    // empty again (deterministic replay), and the txn high-water mark
    // advances with the next non-empty batch.
    if (batch.isEmpty) return
    VersionedTable.transactionalCommit(batch, root, appId, batchId,
      mode = mode, statsCols = statsCols, bloomCols = bloomCols,
      bloomFpp = bloomFpp)
  }

  override def toString: String = s"VersionedSink[$root, appId=$appId, $mode]"
}

/** `format("graft-versioned")` registration (via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister).
  */
final class VersionedSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-versioned does not take partitionBy: layout is dir-per-commit; " +
        "use statsCols/bloomCols for data skipping")
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException(
        "graft-versioned requires option 'root' (the versioned table path)"))
    val appId = parameters.getOrElse("appId",
      throw new IllegalArgumentException(
        "graft-versioned requires option 'appId' (stable writer identity " +
          "for exactly-once txn commits; distinct per concurrent query)"))
    val mode =
      if (outputMode == OutputMode.Append()) "append"
      else if (outputMode == OutputMode.Complete()) "overwrite"
      else throw new IllegalArgumentException(
        s"graft-versioned supports Append (append commits) and Complete " +
          s"(overwrite commits), not $outputMode; keyed upsert = foreachBatch + mergeIntoKeyed")
    def cols(k: String) = parameters.get(k)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
    new VersionedSink(root, appId, mode, cols("statsCols"), cols("bloomCols"),
      parameters.getOrElse("bloomFpp", "0.01").toDouble)
  }
}
