package graft.sources



import org.apache.spark.sql.SparkSession

/** Declared maintenance policies for the versioned table — the lakehouse
  * analogue of the reference's per-view refresh/compression/retention
  * schedules (`sql/timescaledb_schema.sql:28-31,60-65,154-159,173-178,
  * 233-238`), where maintenance is POLICY the operator declares once, not
  * verbs someone remembers to call.
  *
  * The split is deliberate: [[Maintenance.plan]] is a PURE DECISION —
  * manifest metadata + O(#dirs) filesystem stat calls in, `Seq[Action]`
  * out, nothing mutated — so it is unit-testable without Spark and safe
  * to run from any scheduler tick; [[Maintenance.execute]] maps each
  * action onto the EXISTING library verb ([[VersionedTableOps
  * .compactSmallDirs]] / [[VersionedTableOps.purgeDeletes]] /
  * [[VersionedTableOps.vacuumRetain]]), so policy-driven and hand-issued
  * maintenance share one implementation and one set of contracts
  * (content-preservation, survivor byte-identity, O(touched-data) cost).
  */
object Maintenance {

  /** What a policy tick decided to do, with the metric that triggered it
    * — actions are DATA, so schedulers can log/audit/veto before running.
    */
  sealed trait Action { def reason: String }

  /** Fold the sub-`maxBytes` dirs into one ([[VersionedTableOps
    * .compactSmallDirs]]) — triggered by fragment count.
    */
  final case class CompactSmallDirs(nSmall: Int, maxBytes: Long,
      reason: String) extends Action

  /** Rewrite the dv'd dirs and clear the deletion-vector set
    * ([[VersionedTableOps.purgeDeletes]]) — triggered by dv count or
    * deleted-position count (the DESCRIBE DETAIL counters).
    */
  final case class PurgeDeletes(nDvs: Int, deletedRows: Long,
      reason: String) extends Action

  /** Reap history outside the wall-clock window ([[VersionedTableOps
    * .vacuumRetain]]).
    */
  final case class Vacuum(retainMs: Long, reason: String) extends Action

  /** Re-z-order the dirs that landed AFTER the table's last `optimize`
    * commit ([[VersionedTableOps.optimizeZorder]] with a named-dir scope)
    * — triggered by clustering DRIFT: a table z-ordered at v10 then
    * appended through v400 keeps its stale layout until someone notices,
    * because nothing else measures it. The metric is manifest-only —
    * which live dirs postdate the last `optimize` op (historySummary
    * already carries operations) and what byte fraction they hold
    * (the same O(#dirs) fs stats the fragmentation trigger pays).
    */
  final case class Recluster(driftedDirs: Seq[String], driftBytes: Long,
      totalBytes: Long, dims: Seq[(String, Long)], nDirs: Int,
      reason: String) extends Action

  /** The operator's declared thresholds. Defaults are deliberately
    * conservative; `retainMs = None` means "never vacuum automatically"
    * (history is cheap, deletion is not reversible), `zorderBy = empty`
    * means "never recluster automatically" (only the operator knows the
    * table's probe dimensions and their domains).
    */
  final case class Policy(
      smallDirMaxBytes: Long = 32L << 20,
      maxSmallDirs: Int = 8,
      maxDeletionVectors: Int = 8,
      maxDeletedRows: Long = 100000L,
      retainMs: Option[Long] = None,
      minVersionsOutsideWindow: Int = 1,
      zorderBy: Seq[(String, Long)] = Seq.empty,
      zorderDirs: Int = 8,
      maxDriftFraction: Double = 0.3,
      minDriftDirs: Int = 2)

  /** Table-property prefix under which a declared policy persists in the
    * table's own `_props` — so the policy travels WITH the table (clones
    * carry it, any session sees it) and a scheduler tick needs only the
    * table name, mirroring how the reference attaches
    * compression/retention policies to the hypertable itself
    * (`sql/timescaledb_schema.sql:60-65,233-238`), not to a job config.
    */
  val PropPrefix = "graft.policy."

  private val defaults = Policy()

  /** Serialize `policy` as table properties (every field, explicit —
    * DESCRIBE-able and diff-able; `retainMs`/`zorderBy` omitted = unset).
    */
  def toProps(policy: Policy): Map[String, String] = Map(
    s"${PropPrefix}smallDirMaxBytes" -> policy.smallDirMaxBytes.toString,
    s"${PropPrefix}maxSmallDirs" -> policy.maxSmallDirs.toString,
    s"${PropPrefix}maxDeletionVectors" -> policy.maxDeletionVectors.toString,
    s"${PropPrefix}maxDeletedRows" -> policy.maxDeletedRows.toString,
    s"${PropPrefix}minVersionsOutsideWindow" -> policy.minVersionsOutsideWindow.toString,
    s"${PropPrefix}zorderDirs" -> policy.zorderDirs.toString,
    s"${PropPrefix}maxDriftFraction" -> policy.maxDriftFraction.toString,
    s"${PropPrefix}minDriftDirs" -> policy.minDriftDirs.toString,
    // optional fields write EMPTY when unset (property stores merge, so a
    // re-declared policy must overwrite, not inherit, a stale trigger)
    s"${PropPrefix}retainMs" -> policy.retainMs.map(_.toString).getOrElse(""),
    s"${PropPrefix}zorderBy" ->
      policy.zorderBy.map { case (c, m) => s"$c:$m" }.mkString(","))

  /** The policy persisted in `props`, if any `graft.policy.*` key exists
    * (absent keys take the [[Policy]] defaults).
    */
  def fromProps(props: Map[String, String]): Option[Policy] = {
    if (!props.keys.exists(_.startsWith(PropPrefix))) return None
    def p(k: String) = props.get(PropPrefix + k)
    Some(Policy(
      smallDirMaxBytes = p("smallDirMaxBytes").map(_.toLong)
        .getOrElse(defaults.smallDirMaxBytes),
      maxSmallDirs = p("maxSmallDirs").map(_.toInt).getOrElse(defaults.maxSmallDirs),
      maxDeletionVectors = p("maxDeletionVectors").map(_.toInt)
        .getOrElse(defaults.maxDeletionVectors),
      maxDeletedRows = p("maxDeletedRows").map(_.toLong)
        .getOrElse(defaults.maxDeletedRows),
      retainMs = p("retainMs").filter(_.nonEmpty).map(_.toLong),
      minVersionsOutsideWindow = p("minVersionsOutsideWindow").map(_.toInt)
        .getOrElse(defaults.minVersionsOutsideWindow),
      zorderBy = p("zorderBy").map(parseZorderBy).getOrElse(Seq.empty),
      zorderDirs = p("zorderDirs").map(_.toInt).getOrElse(defaults.zorderDirs),
      maxDriftFraction = p("maxDriftFraction").map(_.toDouble)
        .getOrElse(defaults.maxDriftFraction),
      minDriftDirs = p("minDriftDirs").map(_.toInt).getOrElse(defaults.minDriftDirs)))
  }

  private def parseZorderBy(s: String): Seq[(String, Long)] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(":") match {
        case Array(c, m) => c.trim -> m.trim.toLong
        case _ => throw new IllegalArgumentException(
          s"zorderBy entry '$part': expected 'column:domainMax'")
      }
    }

  /** Build a policy from the SQL `(k = v, ...)` spec — keys are the
    * [[Policy]] field names plus `retainHours` sugar; unknown keys fail
    * loudly (a typo'd threshold silently defaulting is an outage later).
    */
  def fromSpec(spec: Map[String, String]): Policy = {
    val known = Set("smallDirMaxBytes", "maxSmallDirs", "maxDeletionVectors",
      "maxDeletedRows", "retainMs", "retainHours", "minVersionsOutsideWindow",
      "zorderBy", "zorderDirs", "maxDriftFraction", "minDriftDirs")
    val bad = spec.keys.filterNot(known)
    require(bad.isEmpty,
      s"unknown maintenance policy key(s): ${bad.toSeq.sorted.mkString(", ")} " +
        s"(known: ${known.toSeq.sorted.mkString(", ")})")
    val retain = spec.get("retainMs").map(_.toLong)
      .orElse(spec.get("retainHours").map(h => (h.toDouble * 3600 * 1000).toLong))
    Policy(
      smallDirMaxBytes = spec.get("smallDirMaxBytes").map(_.toLong)
        .getOrElse(defaults.smallDirMaxBytes),
      maxSmallDirs = spec.get("maxSmallDirs").map(_.toInt)
        .getOrElse(defaults.maxSmallDirs),
      maxDeletionVectors = spec.get("maxDeletionVectors").map(_.toInt)
        .getOrElse(defaults.maxDeletionVectors),
      maxDeletedRows = spec.get("maxDeletedRows").map(_.toLong)
        .getOrElse(defaults.maxDeletedRows),
      retainMs = retain,
      minVersionsOutsideWindow = spec.get("minVersionsOutsideWindow")
        .map(_.toInt).getOrElse(defaults.minVersionsOutsideWindow),
      zorderBy = spec.get("zorderBy").map(parseZorderBy).getOrElse(Seq.empty),
      zorderDirs = spec.get("zorderDirs").map(_.toInt).getOrElse(defaults.zorderDirs),
      maxDriftFraction = spec.get("maxDriftFraction").map(_.toDouble)
        .getOrElse(defaults.maxDriftFraction),
      minDriftDirs = spec.get("minDriftDirs").map(_.toInt)
        .getOrElse(defaults.minDriftDirs))
  }

  /** The due actions for `root` under `policy` — pure decision over ONE
    * manifest read plus O(#dirs) file stats; nothing is mutated. Returns
    * actions in safe execution order (purge before compact: a purge
    * rewrites dv'd dirs and may itself cure fragmentation; vacuum last —
    * it only deletes what nothing references).
    */
  def plan(root: String, policy: Policy = Policy(),
      nowMs: Long = System.currentTimeMillis()): Seq[Action] = {
    val latest = VersionedTable.latestVersion(root).getOrElse(return Seq.empty)
    val snap = VersionedTable.snapshot(root, latest)
    val out = Seq.newBuilder[Action]

    val deletedRows = snap.dvs.map(_.rows).sum
    if (snap.dvs.size >= policy.maxDeletionVectors ||
        deletedRows >= policy.maxDeletedRows)
      out += PurgeDeletes(snap.dvs.size, deletedRows,
        s"${snap.dvs.size} deletion vectors / $deletedRows deleted positions " +
          s"(thresholds ${policy.maxDeletionVectors} / ${policy.maxDeletedRows})")

    // Clustering drift: live dirs that postdate the last `optimize` commit
    // hold data nobody has z-ordered. Only meaningful on a table that WAS
    // clustered once (zorderBy declared AND an optimize op in history) —
    // and only decidable while that optimize's manifest survives vacuum.
    val drifted: Set[String] =
      if (policy.zorderBy.isEmpty) Set.empty
      else {
        val stillThere = VersionedTable.existingVersions(root).toSet
        VersionedTable.historySummary(root)
          .filter(e => e.operation == "optimize" && stillThere(e.version))
          .map(_.version).maxOption match {
          case None => Set.empty
          case Some(vOpt) =>
            val clustered = VersionedTable.snapshot(root, vOpt).dataDirs.toSet
            val drift = snap.dataDirs.filterNot(clustered)
            val driftBytes = drift.map(VersionedTable.data.sizeOfDir(root, _)).sum
            val totalBytes = snap.dataDirs
              .map(VersionedTable.data.sizeOfDir(root, _)).sum
            if (drift.size >= policy.minDriftDirs && totalBytes > 0 &&
                driftBytes.toDouble / totalBytes >= policy.maxDriftFraction) {
              out += Recluster(drift, driftBytes, totalBytes,
                policy.zorderBy, policy.zorderDirs,
                s"${drift.size} dirs / $driftBytes of $totalBytes bytes " +
                  s"landed after the v$vOpt optimize " +
                  s"(threshold ${policy.maxDriftFraction})")
              drift.toSet
            } else Set.empty
        }
      }

    // dirs the recluster will rewrite anyway don't count as fragments —
    // the drift rewrite folds them into z-ordered dirs this same tick
    val small = snap.dataDirs.filter(d => !drifted(d) &&
      VersionedTable.data.sizeOfDir(root, d) < policy.smallDirMaxBytes)
    if (small.size >= policy.maxSmallDirs)
      out += CompactSmallDirs(small.size, policy.smallDirMaxBytes,
        s"${small.size} dirs under ${policy.smallDirMaxBytes} bytes " +
          s"(threshold ${policy.maxSmallDirs})")

    policy.retainMs.foreach { window =>
      // checkpoint-backed O(tail) walk, same as vacuumRetain's own cut.
      // Count only versions whose MANIFEST still exists: history summaries
      // survive vacuum by contract (the checkpoint-at-tip rule), so counting
      // summaries alone would keep planning a no-op Vacuum forever after the
      // first one — the policy must converge to [] once nothing is reapable.
      val reapable = VersionedTable.existingVersions(root).toSet
      val outside = VersionedTable.historySummary(root)
        .count(e => e.version < latest && reapable(e.version) &&
          e.committedMs < nowMs - window)
      if (outside >= policy.minVersionsOutsideWindow)
        out += Vacuum(window,
          s"$outside versions committed before the ${window} ms window")
    }
    out.result()
  }

  /** Run the planned actions through the existing verbs, preserving plan
    * order. Returns (action, committed version) — `None` where the verb
    * proved a no-op (e.g. the purge raced a COW rewrite that already
    * cleared the dvs) or, for vacuum, the reaped dir count tagged as a
    * version-less effect.
    */
  def execute(spark: SparkSession, root: String,
      actions: Seq[Action],
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): Seq[(Action, Option[Int])] =
    actions.map {
      case a @ PurgeDeletes(_, _, _) =>
        a -> VersionedTable.purgeDeletes(spark, root)
      case a @ CompactSmallDirs(_, maxBytes, _) =>
        val before = VersionedTable.latestVersion(root)
        val v = VersionedTable.compactSmallDirs(spark, root, maxBytes,
          statsCols = statsCols, bloomCols = bloomCols)
        a -> Some(v).filter(_ != before.getOrElse(-1))
      case a @ Recluster(dirs, _, _, dims, nDirs, _) =>
        val before = VersionedTable.latestVersion(root)
        // named-dir scope: optimizeZorder intersects it with the live dirs,
        // so a dir DML replaced between plan and execute is simply skipped
        val v = VersionedTable.optimizeZorder(spark, root,
          dims.map { case (c, m) =>
            org.apache.spark.sql.functions.col(c) -> m },
          nDirs, statsCols = statsCols, bloomCols = bloomCols,
          scopeDirs = Some(dirs.toSet))
        a -> Some(v).filter(_ != before.getOrElse(-1))
      case a @ Vacuum(retainMs, _) =>
        VersionedTable.vacuumRetain(root, retainMs)
        a -> None
    }
}
