package graft.plans

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParameterContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.VersionedTable

/** Injected SQL parser adding the lakehouse MAINTENANCE verbs the stock
  * grammar lacks — the `DeltaSqlParser` shape: three statement forms are
  * recognized up front (case-insensitive, regex-anchored), everything
  * else delegates verbatim to Spark's own parser.
  *
  * {{{
  *   RESTORE TABLE t TO VERSION AS OF 3
  *   RESTORE TABLE t TO TIMESTAMP AS OF '2024-01-02 03:04:05'
  *   OPTIMIZE t                         -- compact to one dir
  *   OPTIMIZE t ZORDER BY (a, b[, c])   -- N-dim Morton re-cluster
  *   OPTIMIZE t WHERE p [ZORDER BY (...)] -- scoped: rewrite admitted dirs only
  *   VACUUM t                           -- library default retention
  *   VACUUM t RETAIN 168 HOURS          -- wall-clock: reap > 7 days old
  *   VACUUM t [RETAIN n HOURS] DRY RUN  -- report, touch nothing
  *   CREATE TABLE t2 SHALLOW CLONE t [VERSION AS OF n] [LOCATION '...']
  *   ALTER TABLE t SET MAINTENANCE POLICY (k = v, ...) -- declare once, persists with the table
  *   MAINTAIN t [DRY RUN]               -- the scheduler tick: plan + execute (or report)
  *   DESCRIBE HISTORY t                 -- the commit log as rows
  *   DESCRIBE DETAIL t                  -- one row of table metadata
  * }}}
  *
  * The reference declares maintenance as SQL policy on the warehouse —
  * compression/retention schedules and refresh policies
  * (`sql/timescaledb_schema.sql:60-65,154-159,173-178,233-238`), tiering
  * (`ARCHITECTURE.md:83-91`); this parser is that surface over the commit
  * log, delegating to the library verbs ([[VersionedTable.restore]] /
  * `optimizeZorder` / `compact` / `vacuum`) so SQL-declared and
  * programmatic maintenance share one implementation.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case RESTORE_VERSION(t, v) => GraftRestoreCommand(ident(t), Some(v.toInt), None)
    case RESTORE_TS(t, ts)     => GraftRestoreCommand(ident(t), None, Some(ts))
    case CREATE_CLONE(dst, src, v, loc) =>
      GraftCloneCommand(ident(dst), ident(src),
        Option(v).map(_.toInt), Option(loc))
    case OPTIMIZE_WHERE_Z(t, pred, cols) => GraftOptimizeCommand(ident(t),
      cols.split(",").toSeq.map(c => strip(c.trim)).filter(_.nonEmpty),
      Some(pred.trim))
    case OPTIMIZE_WHERE(t, pred) =>
      GraftOptimizeCommand(ident(t), Seq.empty, Some(pred.trim))
    case OPTIMIZE_Z(t, cols)   => GraftOptimizeCommand(ident(t),
      cols.split(",").toSeq.map(c => strip(c.trim)).filter(_.nonEmpty))
    case OPTIMIZE_PLAIN(t)     => GraftOptimizeCommand(ident(t), Seq.empty)
    case VACUUM_RETAIN(t, h, dry) =>
      GraftVacuumCommand(ident(t), Some(h.toDouble), dry != null)
    case VACUUM_PLAIN(t, dry)  => GraftVacuumCommand(ident(t), None, dry != null)
    case ALTER_POLICY(t, spec) => GraftSetPolicyCommand(ident(t), spec)
    case MAINTAIN(t, dry)      => GraftMaintainCommand(ident(t), dry != null)
    case DESCRIBE_HISTORY(t)   => GraftDescribeHistoryCommand(ident(t))
    case DESCRIBE_DETAIL(t)    => GraftDescribeDetailCommand(ident(t))
    case _                     => delegate.parsePlan(sqlText)
  }

  private def strip(part: String): String =
    if (part.startsWith("`") && part.endsWith("`") && part.length >= 2)
      part.substring(1, part.length - 1)
    else part

  private def ident(raw: String): TableIdentifier = {
    val parts = raw.trim.split("\\.").toSeq.map(strip)
    parts match {
      case Seq(t)        => TableIdentifier(t)
      case Seq(db, t)    => TableIdentifier(t, Some(db))
      case Seq(c, db, t) => TableIdentifier(t, Some(db), Some(c))
      case _ => throw new IllegalArgumentException(s"bad table identifier: $raw")
    }
  }

  // everything else: the stock grammar
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan = sqlText match {
    case RESTORE_VERSION(_, _) | RESTORE_TS(_, _) | OPTIMIZE_WHERE_Z(_, _, _) |
         OPTIMIZE_WHERE(_, _) | OPTIMIZE_Z(_, _) |
         OPTIMIZE_PLAIN(_) | VACUUM_RETAIN(_, _, _) | VACUUM_PLAIN(_, _) |
         ALTER_POLICY(_, _) | MAINTAIN(_, _) |
         DESCRIBE_HISTORY(_) | DESCRIBE_DETAIL(_) | CREATE_CLONE(_, _, _, _) =>
      parsePlan(sqlText)
    case _ => delegate.parsePlanWithParameters(sqlText, ctx)
  }
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  // `(?is)` — case-insensitive, dot-matches-newline; a trailing ';' is
  // tolerated. Table identifiers: dotted, optionally backquoted parts.
  private val ID = """((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)"""
  val RESTORE_VERSION: Regex =
    s"""(?is)\\s*RESTORE\\s+TABLE\\s+$ID\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  val RESTORE_TS: Regex =
    s"""(?is)\\s*RESTORE\\s+TABLE\\s+$ID\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  val OPTIMIZE_Z: Regex =
    s"""(?is)\\s*OPTIMIZE\\s+$ID\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\)\\s*;?\\s*""".r
  val OPTIMIZE_PLAIN: Regex = s"""(?is)\\s*OPTIMIZE\\s+$ID\\s*;?\\s*""".r
  // scoped maintenance: WHERE bounds the rewrite to the dirs the
  // predicate's manifest translation admits (Delta's `OPTIMIZE ... WHERE`)
  val OPTIMIZE_WHERE_Z: Regex =
    s"""(?is)\\s*OPTIMIZE\\s+$ID\\s+WHERE\\s+(.+?)\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\)\\s*;?\\s*""".r
  val OPTIMIZE_WHERE: Regex =
    s"""(?is)\\s*OPTIMIZE\\s+$ID\\s+WHERE\\s+(.+?)\\s*;?\\s*""".r
  val VACUUM_RETAIN: Regex =
    s"""(?is)\\s*VACUUM\\s+$ID\\s+RETAIN\\s+(\\d+(?:\\.\\d+)?)\\s+HOURS?(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  val VACUUM_PLAIN: Regex = s"""(?is)\\s*VACUUM\\s+$ID(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  val DESCRIBE_HISTORY: Regex =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$ID\\s*;?\\s*""".r
  val DESCRIBE_DETAIL: Regex =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$ID\\s*;?\\s*""".r
  val CREATE_CLONE: Regex =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+$ID\\s+SHALLOW\\s+CLONE\\s+$ID""" +
      s"""(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?""" +
      s"""(?:\\s+LOCATION\\s+'([^']+)')?\\s*;?\\s*""").r
  // declared maintenance as DDL: the policy persists in the table's own
  // properties (travels with clones, visible to every session); MAINTAIN
  // is the scheduler tick — plan, then execute (or report, DRY RUN)
  val ALTER_POLICY: Regex =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$ID\\s+SET\\s+MAINTENANCE\\s+POLICY\\s*\\(([^)]*)\\)\\s*;?\\s*""".r
  val MAINTAIN: Regex =
    s"""(?is)\\s*MAINTAIN\\s+$ID(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r

  /** `k = v [, k = v ...]` with optionally single-quoted values (quotes
    * protect commas inside, e.g. zorderBy = 'time:86400,volume:10000').
    */
  def parsePolicySpec(spec: String): Map[String, String] = {
    val KV = """(\w+)\s*=\s*(?:'([^']*)'|([^,\s][^,]*))""".r
    KV.findAllMatchIn(spec).map(m =>
      m.group(1) -> Option(m.group(2)).getOrElse(m.group(3)).trim).toMap
  }

  /** Resolve a session-catalog `USING graft` table to its commit-log root
    * (+ its table properties) — the maintenance commands' address step.
    */
  def graftRoot(session: SparkSession, t: TableIdentifier): (String, Map[String, String]) = {
    val meta = session.sessionState.catalog.getTableMetadata(t)
    require(meta.provider.exists(_.equalsIgnoreCase("graft")),
      s"$t is not a graft table (provider=${meta.provider.getOrElse("none")})")
    (new java.io.File(meta.location).getPath,
      meta.storage.properties ++ meta.properties)
  }

  def propCols(props: Map[String, String], k: String): Seq[String] =
    props.get(k).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
}

/** `RESTORE TABLE t TO VERSION|TIMESTAMP AS OF ...` → ONE metadata-only
  * commit pinning the target snapshot's dirs/stats/blooms/schema
  * ([[VersionedTable.restore]]); history stays auditable.
  */
case class GraftRestoreCommand(table: TableIdentifier,
    version: Option[Int], timestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("restored_to_version", LongType, nullable = false)(),
      AttributeReference("new_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = GraftSqlParser.graftRoot(session, table)
    val target = version.getOrElse {
      val ts = timestamp.get
      // wall-clock form: UTC, same convention as TIMESTAMP AS OF reads
      val ms = java.time.LocalDateTime.parse(ts.trim.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      VersionedTable.versionAsOf(root, ms).getOrElse(
        throw new IllegalArgumentException(
          s"no version of $table committed at or before '$ts'"))
    }
    val v = VersionedTable.restore(session, root, target)
    Seq(Row(target.toLong, v.toLong))
  }
}

/** `CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n] [LOCATION '...']` —
  * birth a new catalog table from a source snapshot without moving data
  * through the engine ([[VersionedTable.cloneTo]]: hardlinked files + ONE
  * manifest; server-side copy on an object store). Unlike pointer-based
  * shallow clones, the clone OWNS its file names — vacuum/DML on either
  * table can never invalidate the other. The new table registers
  * first-class in the session catalog (`USING graft`), carrying the
  * source's skipping/maintenance table properties, so DML, OPTIMIZE,
  * time travel and streaming subscriptions address it by name.
  */
case class GraftCloneCommand(target: TableIdentifier, source: TableIdentifier,
    version: Option[Int], location: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("cloned_version", LongType, nullable = false)(),
      AttributeReference("location", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (srcRoot, srcProps) = GraftSqlParser.graftRoot(session, source)
    val catalog = session.sessionState.catalog
    require(!catalog.tableExists(target), s"table $target already exists")
    val dst = location.map(l => new java.io.File(l).getPath)
      .getOrElse(new java.io.File(catalog.defaultTablePath(target)).getPath)
    val v = version.getOrElse(
      VersionedTable.latestVersion(srcRoot).getOrElse(
        throw new IllegalArgumentException(s"empty versioned table at $srcRoot")))
    VersionedTable.cloneTo(session, srcRoot, dst, Some(v))
    // register through the stock CREATE path so the clone IS a graft
    // catalog table; the source's maintenance knobs ride along
    val carried = Seq("statsCols", "bloomCols", "bloomFpp", "optimizeDirs")
      .flatMap(k => srcProps.collectFirst {
        case (pk, pv) if pk.equalsIgnoreCase(k) => (k, pv)
      })
    val opts =
      if (carried.isEmpty) ""
      else carried.map { case (k, pv) => s"$k '$pv'" }
        .mkString(" OPTIONS (", ", ", ")")
    session.sql(
      s"CREATE TABLE ${target.quotedString} USING graft$opts LOCATION '$dst'")
    Seq(Row(v.toLong, dst))
  }
}

/** `OPTIMIZE t [ZORDER BY (cols...)]`. Without ZORDER: [[VersionedTable
  * .compact]] (one fresh dir, inheriting the table's `statsCols`/
  * `bloomCols` properties). With ZORDER: [[VersionedTable.optimizeZorder]]
  * over the named columns — each column's Morton dimension is derived
  * from its type (timestamps via `unix_micros`, numerics via a shift to
  * a zero-based long domain) with the domain bounds measured by ONE agg
  * over the snapshot (exact bounds, not sampled quantiles; OPTIMIZE
  * already rewrites the snapshot, so the extra agg is marginal). Dir
  * count comes from the `optimizeDirs` table property (default 16,
  * power of two).
  */
case class GraftOptimizeCommand(table: TableIdentifier,
    zorderCols: Seq[String],
    where: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("new_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, max, min, unix_micros}
    val (root, props) = GraftSqlParser.graftRoot(session, table)
    val statsCols = (GraftSqlParser.propCols(props, "statsCols") ++ zorderCols).distinct
    val bloomCols = GraftSqlParser.propCols(props, "bloomCols")
    val fpp = props.getOrElse("bloomFpp", "0.01").toDouble
    // WHERE scope: predicate text → Column; the library verbs translate
    // it onto the manifest's skipping tiers and rewrite only admitted dirs
    val scope = where.map(org.apache.spark.sql.functions.expr)
    val v =
      if (zorderCols.isEmpty) scope match {
        case None    => VersionedTable.compact(session, root, statsCols, bloomCols, fpp)
        case Some(p) => VersionedTable.compactWhere(session, root, p,
          statsCols, bloomCols, fpp)
      }
      else {
        val nDirs = props.getOrElse("optimizeDirs", "16").toInt
        // dim bounds measured over the SCOPE frame (the rows actually
        // re-laid), so a scoped rewrite stays O(admitted dirs) end to end
        val current = scope match {
          case None    => VersionedTable.read(session, root)
          case Some(p) => VersionedTable.readAdmitted(session, root, p)
        }
        val schema = current.schema
        def image(c: String): org.apache.spark.sql.Column = {
          val f = schema.find(_.name == c).getOrElse(throw new IllegalArgumentException(
            s"ZORDER BY column $c not in ${table.table}'s schema"))
          f.dataType match {
            case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
            case _: org.apache.spark.sql.types.NumericType => col(c).cast("long")
            case other => throw new IllegalArgumentException(
              s"ZORDER BY $c: unsupported type ${other.simpleString} " +
                "(timestamp or numeric required)")
          }
        }
        // ONE agg for every dimension's exact bounds; each dim shifts to a
        // zero-based domain (scaleTo16 needs [0, max], max < 2^47) and
        // wide domains bucket down — granularity, not soundness.
        val aggs = zorderCols.flatMap(c =>
          Seq(min(image(c)).as(s"__mn_$c"), max(image(c)).as(s"__mx_$c")))
        val b = current.agg(aggs.head, aggs.tail: _*).head()
        // a scope the skipping tiers prove empty is a no-op — current
        // version stands, no rewrite, no version burned
        if (b.isNullAt(0))
          return Seq(Row(VersionedTable.latestVersion(root).getOrElse(0).toLong))
        val dims = zorderCols.map { c =>
          val (mn, mx) = (b.getAs[Long](s"__mn_$c"), b.getAs[Long](s"__mx_$c"))
          val range = math.max(mx - mn, 0L)
          val k = range / (1L << 46) + 1L
          (org.apache.spark.sql.functions.floor(
            (image(c) - org.apache.spark.sql.functions.lit(mn)) /
              org.apache.spark.sql.functions.lit(k)).cast("long"),
            range / k)
        }
        VersionedTable.optimizeZorder(session, root, dims, nDirs,
          statsCols, bloomCols, fpp, scope)
      }
    Seq(Row(v.toLong))
  }
}

/** `DESCRIBE HISTORY t` — the commit log as rows (version, parent,
  * operation, delta rows, wall-clock, dir/CDF footprint): pure manifest
  * metadata, never a data scan. The by-NAME form of the
  * `graft_table_history(root)` table function.
  */
case class GraftDescribeHistoryCommand(table: TableIdentifier)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("parent", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("committed_at",
      org.apache.spark.sql.types.TimestampType, nullable = false)(),
    AttributeReference("n_dirs", LongType, nullable = false)(),
    AttributeReference("has_cdf", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = GraftSqlParser.graftRoot(session, table)
    // summaries (checkpointed prefix + parsed tail), not O(versions)
    // full manifests — the 1 000-commit DESCRIBE HISTORY stays cheap
    VersionedTable.historySummary(root).sortBy(-_.version).map { e =>
      Row(e.version.toLong, e.parent.toLong, e.operation, e.rows,
        new java.sql.Timestamp(e.committedMs), e.nDirs.toLong, e.hasCdf)
    }
  }
}

/** `VACUUM t [RETAIN n HOURS] [DRY RUN]` — reap data referenced only by
  * versions older than the retention window (latest always survives),
  * plus aged orphans. The RETAIN form maps wall-clock hours onto the
  * version axis: every version committed within the window is retained.
  * DRY RUN reports exactly what a real run would reap and touches
  * nothing — the operator-safety form.
  */
case class GraftVacuumCommand(table: TableIdentifier,
    retainHours: Option[Double],
    dryRun: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_dirs", LongType, nullable = false)(),
      AttributeReference("dirs", StringType, nullable = false)(),
      AttributeReference("dry_run",
        org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = GraftSqlParser.graftRoot(session, table)
    // RETAIN n HOURS cuts on the manifests' actual committed_ms stamps
    // (wall-clock-true, checkpoint-backed O(tail) walk); the bare form
    // keeps the library's version-count default.
    val deleted = retainHours match {
      case None    => VersionedTable.vacuum(root, 2, dryRun = dryRun)
      case Some(h) => VersionedTable.vacuumRetain(root,
        (h * 3600 * 1000).toLong, dryRun = dryRun)
    }
    Seq(Row(deleted.size.toLong, deleted.mkString(","), dryRun))
  }
}

/** `DESCRIBE DETAIL t` — one row of table-level metadata (the Delta verb):
  * format, location, current version/operation, dir/file/byte footprint,
  * schema and skipping-column coverage, CDF availability. Pure manifest
  * metadata plus ONE listing of the current snapshot's dirs — never a
  * data scan.
  */
case class GraftDescribeDetailCommand(table: TableIdentifier)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("committed_at",
      org.apache.spark.sql.types.TimestampType, nullable = false)(),
    AttributeReference("n_dirs", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("schema_cols", StringType, nullable = false)(),
    AttributeReference("stats_cols", StringType, nullable = false)(),
    AttributeReference("bloom_cols", StringType, nullable = false)(),
    AttributeReference("has_cdf", org.apache.spark.sql.types.BooleanType,
      nullable = false)(),
    // merge-on-read visibility: how many deletion-vector files the
    // current snapshot carries and how many positions they hold — the
    // operator signal for scheduling purgeDeletes/OPTIMIZE
    AttributeReference("num_deletion_vectors", LongType, nullable = false)(),
    AttributeReference("deleted_rows", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = GraftSqlParser.graftRoot(session, table)
    val v = VersionedTable.latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"empty versioned table at $root"))
    val snap = VersionedTable.snapshot(root, v)
    val files = snap.dataDirs.flatMap(d =>
      Option(new java.io.File(root, d).listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")))
    Seq(Row("graft", table.unquotedString, root, v.toLong, snap.operation,
      new java.sql.Timestamp(snap.committedMs), snap.dataDirs.size.toLong,
      files.size.toLong, files.map(_.length).sum,
      snap.schemaCols.mkString(","),
      snap.dirStats.map(_.col).distinct.sorted.mkString(","),
      snap.dirBlooms.map(_.col).distinct.sorted.mkString(","),
      snap.cdfDir.isDefined,
      snap.dvs.size.toLong, snap.dvs.map(_.rows).sum))
  }
}

/** `ALTER TABLE t SET MAINTENANCE POLICY (k = v, ...)` — persist the
  * declared thresholds in the table's OWN properties (`_props`), so the
  * policy travels with the table (clones carry it, every session sees it)
  * and a scheduler needs only the table name. Keys are the
  * [[graft.sources.Maintenance.Policy]] field names plus `retainHours`
  * sugar; unknown keys fail loudly. Re-declaring REPLACES the whole
  * policy (optional triggers reset, they don't inherit stale values).
  * The reference attaches compression/retention policies to the
  * hypertable the same way (`sql/timescaledb_schema.sql:60-65,233-238`).
  */
case class GraftSetPolicyCommand(table: TableIdentifier, spec: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("key", StringType, nullable = false)(),
      AttributeReference("value", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    import graft.sources.Maintenance
    val (root, _) = GraftSqlParser.graftRoot(session, table)
    val policy = Maintenance.fromSpec(GraftSqlParser.parsePolicySpec(spec))
    val props = Maintenance.toProps(policy)
    VersionedTable.setTableProperties(root, props)
    props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
  }
}

/** `MAINTAIN t [DRY RUN]` — the scheduler tick as one SQL verb: read the
  * table's declared policy, [[graft.sources.Maintenance.plan]] the due
  * actions (one manifest read + O(#dirs) fs stats), and execute them
  * through the library verbs — or, DRY RUN, report them and touch
  * nothing. Zero rows = nothing due (the policy converged). statsCols /
  * bloomCols for the rewrites come from the catalog table's properties,
  * same as OPTIMIZE.
  */
case class GraftMaintainCommand(table: TableIdentifier, dryRun: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("reason", StringType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    import graft.sources.Maintenance
    val (root, catProps) = GraftSqlParser.graftRoot(session, table)
    val policy = Maintenance.fromProps(VersionedTable.tableProperties(root))
      .getOrElse(throw new IllegalArgumentException(
        s"$table has no declared maintenance policy; run " +
          "ALTER TABLE ... SET MAINTENANCE POLICY (...) first"))
    def name(a: Maintenance.Action): String = a match {
      case _: Maintenance.PurgeDeletes     => "purge_deletes"
      case _: Maintenance.CompactSmallDirs => "compact_small_dirs"
      case _: Maintenance.Recluster        => "recluster"
      case _: Maintenance.Vacuum           => "vacuum"
    }
    val actions = Maintenance.plan(root, policy)
    if (dryRun) actions.map(a => Row(name(a), a.reason, null))
    else Maintenance.execute(session, root, actions,
      statsCols = GraftSqlParser.propCols(catProps, "statsCols"),
      bloomCols = GraftSqlParser.propCols(catProps, "bloomCols"))
      .map { case (a, v) => Row(name(a), a.reason,
        v.map(i => java.lang.Long.valueOf(i.toLong)).orNull) }
  }
}
