package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-lifecycle management for date-partitioned feature tables — the
  * engine-side analogue of the reference's S3 lifecycle tiering
  * (`src/cost/s3_lifecycle.py:11-78`: Standard → Intelligent-Tiering →
  * Glacier → expire) and of TimescaleDB chunk retention.
  *
  * Two pieces:
  *  - [[tierReport]] — a declarative per-tier census (which storage class
  *    each day of data belongs in, by age against the newest event), used
  *    to plan/audit transitions. Fully oracle-checkable.
  *  - [[applyRetention]] — drops EXPIRED `part_date=` partitions of a
  *    materialized keyed table at the FILE level: surviving partitions are
  *    never read, rewritten, or even opened (asserted byte-identical in
  *    tests). On a cluster this is `ALTER TABLE DROP PARTITION` /
  *    an object-store lifecycle rule — O(expired partitions), O(0) data.
  */
object Lifecycle {

  /** Per-tier census of a trades-shaped frame: age in WHOLE days against
    * the newest event (the deterministic anchor), tiers at
    * `hot < hotDays <= warm < warmDays <= cold < keepDays <= expired`.
    * The anchor is a 1-row aggregate broadcast-cross-joined in — the query
    * stays fully declarative (no driver-side collect).
    */
  def tierReport(df: DataFrame, timeCol: String = "time",
      hotDays: Int = 7, warmDays: Int = 14, keepDays: Int = 21): DataFrame = {
    val anchor = df.agg(max(to_date(col(timeCol))).as("anchor_date"))
    val age = datediff(col("anchor_date"), to_date(col(timeCol)))
    df.crossJoin(broadcast(anchor))
      .select(
        when(age < hotDays, "hot")
          .when(age < warmDays, "warm")
          .when(age < keepDays, "cold")
          .otherwise("expired").as("tier"),
        to_date(col(timeCol)).as("d"))
      .groupBy("tier")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("d")).as("n_days"),
        min(col("d")).as("oldest"),
        max(col("d")).as("newest"))
  }

  /** Recover a previous compaction's crash artifacts before doing anything
    * else. A `.compact_gc_<part>` dir with NO live partition is the
    * between-renames crash (the original data, staged aside) — restore it;
    * with a live partition it is a post-swap leftover — delete it. A
    * `.compact_tmp_<part>` dir is always safe to delete once any gc
    * restore ran (it is written before any destructive step). This is what
    * makes the rename→rename swap actually crash-safe rather than merely
    * crash-localized.
    */
  def recoverCompactionArtifacts(tablePath: String): Unit = {
    val root = new java.io.File(tablePath)
    val hidden = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    import scala.reflect.io.Directory
    hidden.filter(_.getName.startsWith(".compact_gc_")).foreach { gc =>
      val live = new java.io.File(root, gc.getName.stripPrefix(".compact_gc_"))
      if (!live.exists()) {
        if (!gc.renameTo(live))
          throw new java.io.IOException(s"could not restore $gc to $live")
      } else if (!new Directory(gc).deleteRecursively())
        throw new java.io.IOException(s"could not remove stale $gc")
    }
    hidden.filter(_.getName.startsWith(".compact_tmp_")).foreach { tmp =>
      if (tmp.exists() && !new Directory(tmp).deleteRecursively())
        throw new java.io.IOException(s"could not remove stale $tmp")
    }
  }

  /** The table's `part_date=` partition dirs. Names that fail to parse as
    * dates (e.g. a crashed writer's leftover) are surfaced by callers that
    * care; this listing itself is pure metadata.
    */
  private def partDirs(tablePath: String): Array[java.io.File] =
    Option(new java.io.File(tablePath).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("part_date="))

  private def partDate(dir: java.io.File): Option[java.time.LocalDate] = {
    val v = dir.getName.stripPrefix("part_date=")
    try Some(java.time.LocalDate.parse(v)) catch { case _: Exception => None }
  }

  /** Drop `part_date=` partitions older than `keepDays` against
    * `anchorDate`. Pure partition-directory operation: lists the table's
    * partition dirs (O(partitions) metadata), deletes the expired ones,
    * touches nothing else. Unparseable partition values (the null
    * partition, foreign dirs) are left alone. Returns the dropped
    * partition values.
    */
  def applyRetention(tablePath: String, keepDays: Int,
      anchorDate: java.time.LocalDate): Seq[String] = {
    val cutoff = anchorDate.minusDays(keepDays.toLong - 1)
    val expired = partDirs(tablePath)
      .filter(dir => partDate(dir).exists(_.isBefore(cutoff)))
    expired.foreach { dir =>
      import scala.reflect.io.Directory
      if (!new Directory(dir).deleteRecursively())
        throw new java.io.IOException(s"retention could not delete $dir")
    }
    expired.map(_.getName.stripPrefix("part_date=")).toSeq.sorted
  }

  /** Compact FRAGMENTED partitions of a date-partitioned keyed table: any
    * `part_date=` dir holding more than `maxFilesPerPartition` data files
    * is rewritten coalesced (staged to a temp dir, then swapped); every
    * other partition is never read or written. Micro-batch MERGE sinks
    * fragment hot partitions over time (one file set per touched batch ×
    * shuffle partition) — compaction restores scan efficiency at
    * O(fragmented partitions) cost, the same maintenance Delta's OPTIMIZE
    * or a Hive concatenate runs. Returns the compacted partition values.
    *
    * Crash safety: staging/trash dirs are DOT-prefixed siblings (Spark's
    * readers ignore hidden paths, and they can never be mistaken for a
    * `part_date=` partition by retention or partition inference). The swap
    * is rename → rename: a crash leaves either the original partition
    * intact (before the first rename) or the full data in the hidden trash
    * dir (between renames) — never a half-deleted partition.
    */
  def compactPartitions(spark: SparkSession, tablePath: String,
      maxFilesPerPartition: Int = 1): Seq[String] = {
    recoverCompactionArtifacts(tablePath)
    val fragmented = partDirs(tablePath).filter { dir =>
      dir.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet")) >
        maxFilesPerPartition
    }
    fragmented.foreach { dir =>
      val tmp = new java.io.File(dir.getParent, s".compact_tmp_${dir.getName}")
      val trash = new java.io.File(dir.getParent, s".compact_gc_${dir.getName}")
      spark.read.parquet(dir.getPath)
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.getPath)
      if (!dir.renameTo(trash))
        throw new java.io.IOException(s"compaction could not stage $dir aside")
      if (!tmp.renameTo(dir)) {
        trash.renameTo(dir) // roll back; original data was never touched
        throw new java.io.IOException(s"compaction swap failed for $dir")
      }
      import scala.reflect.io.Directory
      if (!new Directory(trash).deleteRecursively())
        throw new java.io.IOException(
          s"compaction succeeded but could not remove $trash (hidden leftover)")
    }
    fragmented.map(_.getName.stripPrefix("part_date=")).toSeq.sorted
  }
}
