package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable incremental consumption of a versioned table's change feed — the
  * DOWNSTREAM half of the lakehouse loop (the reference's continuous
  * aggregates are refreshed by TimescaleDB's background policy workers
  * walking the hypertable's invalidation log; here the commit log IS the
  * invalidation log and the consumer walks it with a cursor, the
  * `startingVersion` semantics of Delta's streaming source).
  *
  * The cursor is one small file holding the last version this consumer has
  * APPLIED. `processNew` reads every unconsumed version's delta (O(delta)
  * dirs via [[VersionedTableOps.changes]] — never the table), hands it to
  * the apply function, and only then advances the cursor via
  * write-temp-then-atomic-move. A crash between apply and advance redelivers
  * the same range on restart: delivery is AT-LEAST-ONCE, and exactly-once
  * end-to-end when the apply is idempotent — e.g. keyed MERGE
  * (`StreamingFeatures.mergeIntoKeyed`) or a downstream
  * [[VersionedTableOps.idempotentCommit]] keyed by `toVersion`, the same
  * discipline as the streaming sink.
  *
  * An overwrite commit in the unconsumed range is NOT an additive delta
  * (its rows replace the snapshot). `processNew` refuses it loudly —
  * consumers of a replaced table must re-derive, which [[resync]] does:
  * read the full latest snapshot, apply, advance the cursor past the
  * overwrite. This mirrors Delta's failure mode without `ignoreChanges`.
  * A consumer so far behind that vacuum already dropped its range's
  * manifests fails the same loud way (the missing-version error) with the
  * same remedy — [[resync]] — matching Delta's earliest-retained-version
  * contract.
  */
object ChangeFeedCursor {

  /** Last applied version, or 0 for a fresh consumer (versions start at 1). */
  def lastApplied(cursorPath: String): Int = {
    val f = new File(cursorPath)
    if (!f.exists()) 0
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim.toInt
  }

  private def advance(cursorPath: String, v: Int): Unit = {
    val target = Paths.get(cursorPath)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(cursorPath + ".tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Apply every version committed since this consumer's cursor. Returns
    * the `(fromExclusive, toInclusive)` range applied, or None when already
    * current. The delta frame spans the WHOLE range in one O(delta) read —
    * a consumer that fell N versions behind catches up in one apply, not N.
    * `upTo` caps the range's inclusive end (bounded consumption — e.g. one
    * micro-batch of a paced replay); the default consumes to the latest.
    *
    * Throws `IllegalArgumentException` when the range crosses an overwrite
    * (see [[resync]]); the cursor stays untouched, so nothing is lost.
    */
  def processNew(spark: SparkSession, root: String, cursorPath: String,
      table: VersionedTableOps = VersionedTable, upTo: Option[Int] = None)
      (apply: (DataFrame, Int, Int) => Unit): Option[(Int, Int)] = {
    val from = lastApplied(cursorPath)
    val latest = table.latestVersion(root).getOrElse(0)
    val to = upTo.map(math.min(_, latest)).getOrElse(latest)
    if (to <= from) None
    else {
      apply(table.changes(spark, root, from, to), from, to)
      advance(cursorPath, to)
      Some((from, to))
    }
  }

  /** Re-derive from the full latest snapshot after an overwrite broke the
    * additive feed: apply the snapshot, advance the cursor to the latest
    * version. Returns the version the cursor now points at.
    */
  def resync(spark: SparkSession, root: String, cursorPath: String,
      table: VersionedTableOps = VersionedTable)
      (apply: DataFrame => Unit): Int = {
    val to = table.latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty versioned table at $root"))
    apply(table.read(spark, root, Some(to)))
    advance(cursorPath, to)
    to
  }
}
