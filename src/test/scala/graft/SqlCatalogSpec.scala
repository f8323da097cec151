package graft

import java.nio.file.Files

import graft.sources.VersionedTable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SQL catalog binding (GraftCatalog + GraftDmlRule): CREATE TABLE
  * USING graft, INSERT INTO/OVERWRITE, SELECT with planning-time skipping,
  * VERSION AS OF / TIMESTAMP AS OF, and the DML verbs — all pure SQL, all
  * resolving onto the same scanIndex/commit machinery the Scala API uses.
  */
class SqlCatalogSpec extends SparkTestBase {

  /** One catalog-enabled session for the suite (same SparkContext; the
    * cluster deployment shape: extensions + catalog conf at session build).
    */
  lazy val sql: SparkSession = SqlCatalogSpec.session(spark)

  private def freshRoot(): String =
    Files.createTempDirectory("graft_sqlcat_").toString

  private var n = 0
  private def freshTable(): String = { n += 1; s"sqlcat_t$n" }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("CREATE TABLE USING graft over an existing root; SELECT prunes via the manifest") {
    val root = freshRoot()
    (0 to 2).foreach(i => VersionedTable.commit(
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .withColumn("v", col("id") * 2), root, "append", statsCols = Seq("id")))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    val probe = sql.sql(s"SELECT id, v FROM $t WHERE id >= 120 AND id < 180")
    assert(ids(probe) === (120L until 180L))
    // planning-time skipping: only the middle dir's files are scanned
    probe.collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    val files = probe.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
    val all = sql.sql(s"SELECT * FROM $t")
    all.collect()
    val allFiles = all.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
    assert(files > 0 && files < allFiles,
      s"catalog read must prune dirs at planning time ($files vs $allFiles)")
  }

  test("INSERT INTO appends a commit; INSERT OVERWRITE publishes an overwrite") {
    val root = freshRoot()
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING graft LOCATION '$root'")
    sql.sql(s"INSERT INTO $t SELECT id, id * 2 AS v FROM range(0, 5)")
    assert(VersionedTable.latestVersion(root) === Some(1))
    assert(VersionedTable.snapshot(root, 1).operation === "append")
    sql.sql(s"INSERT INTO $t SELECT id, id * 2 AS v FROM range(5, 8)")
    assert(ids(sql.sql(s"SELECT * FROM $t")) === (0L until 8L))
    sql.sql(s"INSERT OVERWRITE $t SELECT id, id AS v FROM range(100, 103)")
    val snap = VersionedTable.snapshot(root, 3)
    assert(snap.operation === "overwrite")
    assert(ids(sql.sql(s"SELECT * FROM $t")) === (100L until 103L))
    // the library API sees exactly the same table
    assert(ids(VersionedTable.read(sql, root)) === (100L until 103L))
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through the catalog") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 5).toDF("id"), root)
    val msBetween = System.currentTimeMillis()
    Thread.sleep(5L)
    VersionedTable.commit(spark.range(100, 103).toDF("id"), root, "overwrite")
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    assert(ids(sql.sql(s"SELECT * FROM $t")) === (100L until 103L))
    assert(ids(sql.sql(s"SELECT * FROM $t VERSION AS OF 1")) === (0L until 5L))
    val ts = new java.sql.Timestamp(msBetween)
    assert(ids(sql.sql(s"SELECT * FROM $t TIMESTAMP AS OF '$ts'")) === (0L until 5L))
  }

  test("DELETE FROM / UPDATE / MERGE INTO run the copy-on-write ops") {
    val root = freshRoot()
    (0 to 2).foreach(i => VersionedTable.commit(
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .withColumn("v", col("id") * 2), root, "append", statsCols = Seq("id")))
    val Seq(d1, _, d3) = VersionedTable.snapshot(root, 3).dataDirs
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")

    // DELETE: returns rows removed; skipping-minimal touch (side dirs carried)
    val del = sql.sql(s"DELETE FROM $t WHERE id >= 120 AND id < 180")
    assert(del.collect().map(_.getLong(0)).toSeq === Seq(60L))
    val snapD = VersionedTable.snapshot(root, 4)
    assert(snapD.operation === "delete")
    assert(snapD.dataDirs.contains(d1) && snapD.dataDirs.contains(d3),
      "SQL DELETE must carry unmatched dirs by name like the library op")
    assert(ids(sql.sql(s"SELECT * FROM $t")) === ((0L until 120L) ++ (180L until 300L)))

    // UPDATE: assignments evaluated against the pre-update row
    val upd = sql.sql(s"UPDATE $t SET v = v + 1000 WHERE id < 5")
    assert(upd.collect().map(_.getLong(0)).toSeq === Seq(5L))
    assert(sql.sql(s"SELECT v FROM $t WHERE id = 3").head().getLong(0) === 1006L)
    assert(sql.sql(s"SELECT v FROM $t WHERE id = 10").head().getLong(0) === 20L)

    // MERGE: whole-row upsert by key
    sql.range(200, 210).toDF("id")
      .withColumn("v", lit(-1L)).createOrReplaceTempView("merge_src")
    sql.sql(
      s"""MERGE INTO $t USING (SELECT id, v FROM merge_src
         |  UNION ALL SELECT id, -2L AS v FROM range(500, 505)) s
         |ON $t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val out = sql.sql(s"SELECT * FROM $t")
    assert(out.count() === 245L) // 240 surviving + 5 inserts
    assert(sql.sql(s"SELECT v FROM $t WHERE id = 205").head().getLong(0) === -1L)
    assert(sql.sql(s"SELECT count(*) AS n FROM $t WHERE v = -2").head().getLong(0) === 5L)
    // time travel still serves the pre-DML snapshot
    assert(sql.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 3")
      .head().getLong(0) === 300L)
  }

  test("CTAS lands as version 1; statsCols option threads skipping metadata") {
    val root = freshRoot()
    val t = freshTable()
    sql.sql(
      s"""CREATE TABLE $t USING graft OPTIONS (statsCols 'id')
         |LOCATION '$root' AS SELECT id, id * 3 AS v FROM range(0, 50)""".stripMargin)
    assert(VersionedTable.latestVersion(root) === Some(1))
    assert(ids(sql.sql(s"SELECT * FROM $t WHERE v < 30")) === (0L until 10L))
    assert(VersionedTable.snapshot(root, 1).dirStats.exists(_.col == "id"),
      "CTAS must thread statsCols into the commit")
  }

  test("DELETE FROM without WHERE empties the table; SELECT stays schema-correct") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 30).toDF("id").withColumn("v", lit(1L)),
      root, statsCols = Seq("id"))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    val del = sql.sql(s"DELETE FROM $t")
    assert(del.collect().map(_.getLong(0)).toSeq === Seq(30L))
    val out = sql.sql(s"SELECT * FROM $t")
    assert(out.columns.toSeq === Seq("id", "v") && out.count() === 0L)
    sql.sql(s"INSERT INTO $t SELECT id, id AS v FROM range(0, 4)")
    assert(sql.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 4L)
  }

  test("DESCRIBE serves the live schema; DROP TABLE detaches, data survives, re-CREATE re-attaches") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 5).toDF("id"), root)
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    // additive evolution lands through the commit log (INSERT itself is
    // arity-checked against the current schema — evolution is a commit-
    // level contract, like Delta without mergeSchema); DESCRIBE must show
    // the LIVE union schema, not the creation-time columns
    VersionedTable.commit(
      spark.range(5, 8).toDF("id").withColumn("w", col("id") * 2), root)
    val described = sql.sql(s"DESCRIBE TABLE $t")
      .collect().map(_.getString(0)).filter(_.nonEmpty).toSeq
    assert(described.contains("id") && described.contains("w"),
      s"DESCRIBE must serve the evolved union schema, got $described")
    // DROP detaches the catalog entry; the commit log is untouched
    // (external-table semantics — LOCATION data is never the catalog's)
    sql.sql(s"DROP TABLE $t")
    assert(!sql.catalog.tableExists(t))
    assert(VersionedTable.latestVersion(root) === Some(2),
      "DROP TABLE must not touch the commit log")
    // re-attach: full history still served
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    assert(sql.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 8L)
    assert(sql.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 1")
      .head().getLong(0) === 5L)
  }

  test("readStream.table(t) subscribes to the commit log (changefeed fallback)") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 10).toDF("id"), root)
    VersionedTable.commit(spark.range(10, 20).toDF("id"), root)
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    val ckpt = Files.createTempDirectory("graft_rst_ckpt_").toString
    def drain(): Set[Long] = {
      var seen = Set.empty[Long]
      val q = sql.readStream.table(t)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen ++= b.collect().map(_.getLong(0))
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      seen
    }
    assert(drain() === (0L until 20L).toSet, "catch-up must serve both commits")
    // new commits stream as deltas on the SAME checkpoint
    VersionedTable.commit(spark.range(20, 25).toDF("id"), root)
    assert(drain() === (20L until 25L).toSet, "resumption must be delta-only")
  }

  test("a SHALLOW CLONE feeds subscriptions from birth; evolve mid-stream is benign") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 10).toDF("id"), root)
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    val c = freshTable()
    val dst = freshRoot() + "/clone"
    sql.sql(s"CREATE TABLE $c SHALLOW CLONE $t LOCATION '$dst'")
    val ckpt = Files.createTempDirectory("graft_clsub_ckpt_").toString
    def drain(): Set[Long] = {
      var seen = Set.empty[Long]
      val q = sql.readStream.table(c)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen ++= b.select("id").collect().map(_.getLong(0))
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      seen
    }
    // the clone's birth commit (op=clone) IS the initial batch
    assert(drain() === (0L until 10L).toSet, "clone birth must serve the snapshot")
    // widen the CLONE mid-subscription, then land data with the new column:
    // the pinned-schema contract — the subscriber keeps draining, sees the
    // new rows, and the unknown column is dropped until resubscription
    sql.sql(s"ALTER TABLE $c ADD COLUMNS (score DOUBLE)")
    sql.sql(s"INSERT INTO $c VALUES (100, CAST(1.0 AS DOUBLE)), (101, CAST(2.0 AS DOUBLE))")
    assert(drain() === Set(100L, 101L),
      "an evolve version must cross the subscription as an empty delta")
  }

  test("readStream.option(readChangeFeed).table(t): row-level CDF by catalog name") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 5).toDF("id").withColumn("v", col("id")),
      root, statsCols = Seq("id"))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root' TBLPROPERTIES ('graft.cdf.enabled'='true')")
    sql.sql(s"UPDATE $t SET v = v + 100 WHERE id <= 1")
    val ckpt = Files.createTempDirectory("graft_cdfname_ckpt_").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    def drain(): Unit = {
      // reader options thread through the V1 streaming fallback, so the
      // CDF subscription needs only the catalog name — the Delta
      // `readStream.option("readChangeFeed", true).table(t)` UX
      val q = sql.readStream.option("readChangeFeed", "true").table(t)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen ++= b.collect().map(r => (r.getAs[Long]("id"),
            r.getAs[String]("_change_type"), r.getAs[Long]("v")))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    drain() // catch-up: 5 inserts + 2 pre + 2 post
    assert(seen.count(_._2 == "insert") === 5)
    assert(seen.collect { case (id, "update_postimage", v) => (id, v) }.sorted ===
      Seq((0L, 100L), (1L, 101L)))
    seen.clear()
    // DML lands as row-level images on the SAME checkpoint — by-name
    // subscribers survive the verbs that used to force a resync
    sql.sql(s"DELETE FROM $t WHERE id = 4")
    drain()
    assert(seen.toSeq === Seq((4L, "delete", 4L)),
      s"delta drain must serve exactly the delete image, got $seen")
  }

  test("RESTORE TABLE TO VERSION AS OF: metadata-only commit, history intact") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 10).toDF("id").withColumn("v", col("id")),
      root, statsCols = Seq("id"))
    VersionedTable.commit(spark.range(10, 20).toDF("id").withColumn("v", col("id")),
      root, statsCols = Seq("id"))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    sql.sql(s"DELETE FROM $t WHERE id >= 5") // the bad deploy: v3
    assert(sql.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 5L)
    val r = sql.sql(s"RESTORE TABLE $t TO VERSION AS OF 2").head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)
    // content rolled back; the restore is a NEW version
    assert(ids(sql.sql(s"SELECT * FROM $t")) === (0L until 20L))
    val snap = VersionedTable.snapshot(root, 4)
    assert(snap.operation === "restore")
    // metadata-only: the restored manifest references EXACTLY the target's
    // dirs — no data was copied
    assert(snap.dataDirs === VersionedTable.snapshot(root, 2).dataDirs)
    assert(snap.dirStats === VersionedTable.snapshot(root, 2).dirStats)
    // history preserved: the bad version stays auditable
    assert(sql.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 3")
      .head().getLong(0) === 5L)
    // wall-clock form parses and restores too (tip restore = no-op version)
    val ts = new java.sql.Timestamp(VersionedTable.snapshot(root, 4).committedMs)
    val r2 = sql.sql(s"RESTORE TABLE $t TO TIMESTAMP AS OF '$ts'").head()
    assert(r2.getLong(0) === 4L && r2.getLong(1) === 4L)
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only widening, history intact") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 5).toDF("id"), root, statsCols = Seq("id"))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    sql.sql(s"ALTER TABLE $t ADD COLUMNS (score DOUBLE, tag STRING)")
    // ONE metadata-only commit: same dirs, widened anchor
    val snap = VersionedTable.snapshot(root, 2)
    assert(snap.operation === "evolve")
    assert(snap.dataDirs === VersionedTable.snapshot(root, 1).dataDirs)
    // existing rows serve NULL for the new columns IMMEDIATELY — catalog
    // reads and pure-library reads alike (the anchor lives in the manifest)
    val row = sql.sql(s"SELECT id, score, tag FROM $t WHERE id = 3").head()
    assert(row.getLong(0) === 3L && row.isNullAt(1) && row.isNullAt(2))
    assert(VersionedTable.read(sql, root).columns.toSeq === Seq("id", "score", "tag"))
    // INSERT with the new columns populated; mixed-era rollup is exact
    sql.sql(s"INSERT INTO $t VALUES (100, CAST(1.5 AS DOUBLE), 'a')")
    assert(sql.sql(s"SELECT count(*) AS n, count(score) AS ns FROM $t").head()
      .toSeq === Seq(6L, 1L))
    // time travel to the pre-evolve version still serves the narrow shape
    assert(sql.sql(s"SELECT * FROM $t VERSION AS OF 1").columns.toSeq === Seq("id"))
    // a change subscription crosses the evolve version as an empty delta
    assert(VersionedTable.changes(sql, root, 1, 2).count() === 0L)
    // r15: RENAME/DROP are first-class via column mapping (their own
    // round-trips live in ColumnMappingSpec); here only the duplicate
    // add refusal — the rename is reverted so the rest of this test's
    // narrow-schema assertions stay meaningful
    sql.sql(s"ALTER TABLE $t RENAME COLUMN tag TO label")
    assert(sql.sql(s"SELECT * FROM $t").columns.contains("label"))
    sql.sql(s"ALTER TABLE $t RENAME COLUMN label TO tag")
    assert(sql.sql(s"SELECT * FROM $t").columns.contains("tag"))
    // duplicate add is refused
    intercept[Exception](sql.sql(s"ALTER TABLE $t ADD COLUMNS (score DOUBLE)"))
    // the canonical evolution story: ALTER, then BACKFILL via UPDATE —
    // copy-on-write materializes the new column into the rewritten dirs
    sql.sql(s"UPDATE $t SET score = CAST(id AS DOUBLE) * 2 WHERE id < 2")
    assert(sql.sql(s"SELECT sum(score) AS s FROM $t WHERE id < 5").head()
      .getDouble(0) === 2.0)
    // SET TBLPROPERTIES stays pure catalog metadata (no commit)
    val tip = VersionedTable.latestVersion(root).get
    sql.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('statsCols' = 'id')")
    assert(VersionedTable.latestVersion(root).get === tip)
  }

  test("CREATE TABLE SHALLOW CLONE: zero-copy fork, fully independent histories") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 10).toDF("id").withColumn("v", col("id")),
      root, statsCols = Seq("id"))
    VersionedTable.commit(spark.range(10, 20).toDF("id").withColumn("v", col("id")),
      root, statsCols = Seq("id"))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    sql.sql(s"DELETE FROM $t WHERE id >= 15") // source diverges: v3
    val c = freshTable()
    val dst = freshRoot() + "/clone"
    val r = sql.sql(
      s"CREATE TABLE $c SHALLOW CLONE $t VERSION AS OF 2 LOCATION '$dst'").head()
    assert(r.getLong(0) === 2L)
    // the clone sees the PRE-DML cut and is version 1 of a NEW history
    assert(ids(sql.sql(s"SELECT * FROM $c")) === (0L until 20L))
    assert(VersionedTable.latestVersion(dst) === Some(1))
    assert(VersionedTable.snapshot(dst, 1).operation === "clone")
    // zero-copy on the LOCAL store: every cloned part file is a HARDLINK
    // of the source's. The object-model store has no links BY DESIGN
    // (S3 clone = server-side byte copy) — there the contract is a
    // byte-identical twin, not inode identity.
    val localStore =
      graft.sources.DataStore.default.isInstanceOf[graft.sources.LocalDataStore]
    val dir = VersionedTable.snapshot(dst, 1).dataDirs.head
    val parts = new java.io.File(root, dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      val twin = new java.io.File(new java.io.File(dst, dir), f.getName)
      if (localStore)
        assert(java.nio.file.Files.isSameFile(f.toPath, twin.toPath),
          s"${f.getName} was copied, not linked")
      else
        assert(twin.isFile && twin.length() == f.length(),
          s"${f.getName}: clone twin missing or size-divergent")
    }
    // DML the CLONE: copy-on-write over linked files; the source is inert
    sql.sql(s"UPDATE $c SET v = v + 100 WHERE id < 5")
    assert(sql.sql(s"SELECT sum(v) AS s FROM $c WHERE id < 5")
      .head().getLong(0) === 510L)
    assert(sql.sql(s"SELECT sum(v) AS s FROM $t WHERE id < 5")
      .head().getLong(0) === 10L)
    // vacuum the SOURCE to the bone: the clone keeps reading — unlinking
    // the source's names leaves the shared inodes alive under the clone's
    // (the failure mode pointer-based shallow clones are known for)
    VersionedTable.vacuum(root, retainLast = 1, orphanGraceMs = 0L)
    assert(ids(sql.sql(s"SELECT * FROM $c VERSION AS OF 1")) === (0L until 20L))
    // the clone's birth commit feeds a change subscription like any other
    assert(VersionedTable.changes(sql, dst, 0, 1).count() === 20L)
    // DESCRIBE HISTORY audits the fork by name
    assert(sql.sql(s"DESCRIBE HISTORY $c").collect()
      .map(_.getString(2)).contains("clone"))
    // default-location form clones the TIP (post-DELETE = 15 rows); the
    // name must be unique ACROSS JVMs — the warehouse dir outlives the
    // in-memory catalog, so a reused name would collide with a previous
    // run's leftover root
    val c2 = s"sqlcat_clone_${java.util.UUID.randomUUID.toString.take(8)}"
    sql.sql(s"CREATE TABLE $c2 SHALLOW CLONE $t")
    assert(sql.sql(s"SELECT count(*) AS n FROM $c2").head().getLong(0) === 15L)
    // an existing table name is refused
    intercept[Exception](sql.sql(s"CREATE TABLE $c SHALLOW CLONE $t"))
  }

  test("a subscription SURVIVES OPTIMIZE: compaction is invisible to subscribers") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot()
    (0 to 2).foreach(i => VersionedTable.commit(
      spark.range(i * 10L, (i + 1) * 10L).toDF("id"), root))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    val ckpt = Files.createTempDirectory("graft_optsub_ckpt_").toString
    def drain(): Set[Long] = {
      var seen = Set.empty[Long]
      val q = sql.readStream.table(t)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen ++= b.collect().map(_.getLong(0))
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      seen
    }
    assert(drain() === (0L until 30L).toSet)
    // routine maintenance between drains: at 100 TB this is the operation
    // that must NOT force every subscriber into an O(table) resync
    sql.sql(s"OPTIMIZE $t")
    sql.sql(s"INSERT INTO $t VALUES (100), (101)")
    assert(drain() === Set(100L, 101L),
      "an optimize must cross the subscription as an empty delta — " +
        "no resync, no duplicates")
    assert(VersionedTable.history(root).map(_.operation).count(_ == "optimize") === 1)
  }

  test("OPTIMIZE ZORDER BY through pure SQL: post-OPTIMIZE numFiles prunes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = freshRoot()
    // deliberately unclustered: each append holds the FULL x range
    (0 to 2).foreach(i => VersionedTable.commit(
      spark.range(i * 1024L, (i + 1) * 1024L)
        .select((col("id") % 64).as("x"), (col("id") / 64).as("y"),
          col("id").as("payload")), root, "append"))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft OPTIONS (optimizeDirs '8') LOCATION '$root'")
    // before OPTIMIZE: an x-probe cannot prune (no stats, every dir mixed)
    val v = sql.sql(s"OPTIMIZE $t ZORDER BY (x, y)").head().getLong(0)
    assert(v === 4L)
    def filesOf(q: String): Long = {
      val df = sql.sql(q); df.collect()
      df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
    }
    val probe = filesOf(s"SELECT * FROM $t WHERE x >= 0 AND x < 8")
    val all = filesOf(s"SELECT * FROM $t")
    assert(probe > 0 && probe < all,
      s"post-OPTIMIZE ZORDER a dimension probe must prune dirs ($probe vs $all)")
    // value-transparent: same rows as the pre-optimize snapshot
    assert(sql.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 3072L)
    assert(sql.sql(s"SELECT sum(payload) AS s FROM $t").head().getLong(0) ===
      (0L until 3072L).sum)
  }

  test("OPTIMIZE without ZORDER compacts; VACUUM RETAIN reaps old dirs") {
    val root = freshRoot()
    (0 to 3).foreach(i => VersionedTable.commit(
      spark.range(i * 10L, (i + 1) * 10L).toDF("id"), root))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft OPTIONS (statsCols 'id') LOCATION '$root'")
    val v = sql.sql(s"OPTIMIZE $t").head().getLong(0)
    assert(v === 5L)
    val snap = VersionedTable.snapshot(root, 5)
    assert(snap.dataDirs.size === 1, "plain OPTIMIZE compacts to one dir")
    assert(snap.dirStats.exists(_.col == "id"),
      "compaction must inherit the table's statsCols property")
    assert(ids(sql.sql(s"SELECT * FROM $t")) === (0L until 40L))
    // DESCRIBE DETAIL: one row of manifest-grade metadata, no data scan
    val det = sql.sql(s"DESCRIBE DETAIL $t").head()
    assert(det.getString(0) === "graft" && det.getLong(3) === 5L)
    assert(det.getString(4) === "optimize" && det.getLong(6) === 1L)
    assert(det.getLong(7) >= 1L && det.getLong(8) > 0L)
    assert(det.getString(10) === "id", "stats coverage must be visible")
    // VACUUM ... DRY RUN reports the reap set and touches NOTHING
    val dry = sql.sql(s"VACUUM $t RETAIN 0 HOURS DRY RUN").head()
    assert(dry.getBoolean(2) && dry.getLong(0) >= 4L)
    assert(ids(sql.sql(s"SELECT * FROM $t VERSION AS OF 1")) === (0L until 10L),
      "DRY RUN must leave history readable")
    // VACUUM RETAIN 0 HOURS: only the latest version's dirs survive
    val del = sql.sql(s"VACUUM $t RETAIN 0 HOURS").head()
    assert(del.getLong(0) >= 4L, s"expected the four pre-compaction dirs reaped, got $del")
    assert(ids(sql.sql(s"SELECT * FROM $t")) === (0L until 40L),
      "the retained snapshot must read intact after VACUUM")
    val e = intercept[Exception] {
      sql.sql(s"SELECT * FROM $t VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("no such version"),
      s"vacuumed history must fail loudly, got: ${e.getMessage}")
  }

  test("OPTIMIZE WHERE through pure SQL: scoped rewrite, survivors byte-identical") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = freshRoot()
    (0 to 2).foreach(i => VersionedTable.commit(
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .withColumn("v", col("id") * 2), root, "append", statsCols = Seq("id")))
    val Seq(d1, d2, d3) = VersionedTable.snapshot(root, 3).dataDirs
    def hashes(d: String): Map[String, String] =
      Option(new java.io.File(root, d).listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .map { f =>
          f.getName -> java.security.MessageDigest.getInstance("MD5")
            .digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
        }.toMap
    val survivors = Seq(d2, d3).map(d => d -> hashes(d)).toMap
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft " +
      s"OPTIONS (statsCols 'id', optimizeDirs '4') LOCATION '$root'")
    val v = sql.sql(s"OPTIMIZE $t WHERE id <= 50 ZORDER BY (id, v)").head().getLong(0)
    assert(v === 4L)
    val snap = VersionedTable.snapshot(root, 4)
    assert(snap.operation === "optimize")
    assert(snap.dataDirs.contains(d2) && snap.dataDirs.contains(d3) &&
      !snap.dataDirs.contains(d1),
      "only the admitted dir may be rewritten; the rest carried by name")
    Seq(d2, d3).foreach(d => assert(hashes(d) === survivors(d),
      s"carried dir $d must be byte-identical"))
    // the probe into a carried range still prunes to that dir's files
    val probe = sql.sql(s"SELECT * FROM $t WHERE id >= 150 AND id < 160")
    probe.collect()
    val files = probe.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
    val all = sql.sql(s"SELECT * FROM $t"); all.collect()
    val allFiles = all.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
    assert(files > 0 && files < allFiles,
      s"post-scoped-OPTIMIZE probe must prune ($files vs $allFiles)")
    // value-transparent across the rewritten/carried seam
    assert(ids(sql.sql(s"SELECT * FROM $t")) === (0L until 300L))
    // a proven-empty scope is a no-op: version stands
    val v2 = sql.sql(s"OPTIMIZE $t WHERE id > 100000").head().getLong(0)
    assert(v2 === 4L && VersionedTable.latestVersion(root) === Some(4))
  }

  test("SET TBLPROPERTIES cdf flag reaches library DML (single source of truth)") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 10).toDF("id")
      .withColumn("v", col("id")), root, statsCols = Seq("id"))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    // declared through SQL AFTER creation...
    sql.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.cdf.enabled'='true')")
    // ...must govern a LIBRARY-issued DML against the same root
    VersionedTable.delete(spark, root, col("id") === 3L)
    val feed = VersionedTable.changeFeed(spark, root, 1, 2)
    assert(feed.select("id").collect().map(_.getLong(0)).toSeq === Seq(3L),
      "SQL-declared CDF must be honored by library DML — no dual store")
    // UNSET turns staging back off for every writer
    sql.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.cdf.enabled')")
    assert(VersionedTable.tableProperties(root)
      .get(VersionedTable.CdfEnabledProp).isEmpty)
  }

  test("DESCRIBE HISTORY serves the commit log by catalog name") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 5).toDF("id"), root, statsCols = Seq("id"))
    VersionedTable.commit(spark.range(5, 9).toDF("id"), root)
    val t = freshTable()
    // cdf on, so the history's CDF flag column has a true to show
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root' " +
      "TBLPROPERTIES ('graft.cdf.enabled'='true')")
    sql.sql(s"DELETE FROM $t WHERE id = 7")
    val hist = sql.sql(s"DESCRIBE HISTORY $t")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        r.getBoolean(6))).toSeq
    assert(hist === Seq((3L, "delete", 1L, true), (2L, "append", 4L, false),
      (1L, "append", 5L, false)),
      s"history must list newest first with op/delta/CDF flags, got $hist")
    // abbreviated verb parses too; stock DESCRIBE still reaches the delegate
    assert(sql.sql(s"DESC HISTORY $t").count() === 3L)
    assert(sql.sql(s"DESCRIBE TABLE $t").count() > 0L)
  }

  test("maintenance verbs refuse non-graft tables; stock SQL still parses") {
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t (id BIGINT) USING parquet")
    try {
      val e = intercept[Exception] { sql.sql(s"OPTIMIZE $t") }
      assert(e.getMessage.contains("not a graft table"))
      // the injected parser must pass everything else through untouched
      assert(sql.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
      assert(sql.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 0L)
    } finally sql.sql(s"DROP TABLE $t")
  }

  test("SET MAINTENANCE POLICY persists with the table; MAINTAIN reports (DRY RUN), executes, converges") {
    import graft.sources.Maintenance
    val root = freshRoot()
    (0 to 2).foreach(i => VersionedTable.commit(
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .withColumn("v", col("id") * 2), root, "append", statsCols = Seq("id")))
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft OPTIONS (statsCols 'id') " +
      s"LOCATION '$root' TBLPROPERTIES ('graft.dml.mode'='merge-on-read')")
    sql.sql(s"DELETE FROM $t WHERE id >= 150 AND id < 160") // dv, no rewrite
    // a typo'd threshold fails LOUDLY, not silently-defaults
    val bad = intercept[Exception] {
      sql.sql(s"ALTER TABLE $t SET MAINTENANCE POLICY (maxSmalDirs = 2)").collect()
    }
    assert(bad.getMessage.contains("unknown maintenance policy key"))
    // declare: thresholds persist in the TABLE's properties (any session
    // reading the root sees them — not catalog-session state)
    val declared = sql.sql(s"ALTER TABLE $t SET MAINTENANCE POLICY (" +
      s"maxDeletionVectors = 1, smallDirMaxBytes = ${Long.MaxValue / 2}, " +
      "maxSmallDirs = 2, zorderBy = 'id:300', maxDriftFraction = 0.9)").collect()
    assert(declared.map(r => r.getString(0) -> r.getString(1)).toMap
      .get(s"${Maintenance.PropPrefix}maxSmallDirs") === Some("2"))
    val p = Maintenance.fromProps(VersionedTable.tableProperties(root))
      .getOrElse(fail("policy must persist in _props"))
    assert(p.maxDeletionVectors === 1 && p.zorderBy === Seq("id" -> 300L))
    // DRY RUN reports the due actions and touches nothing (no Recluster:
    // the table was never optimized, drift is relative to a chosen layout)
    val dry = sql.sql(s"MAINTAIN $t DRY RUN").collect()
    assert(dry.map(_.getString(0)).toSeq === Seq("purge_deletes", "compact_small_dirs"))
    assert(sql.sql(s"DESCRIBE DETAIL $t").head()
      .getAs[Long]("num_deletion_vectors") === 1L)
    // MAINTAIN executes in plan order and commits; content preserved
    val ran = sql.sql(s"MAINTAIN $t").collect()
    assert(ran.map(_.getString(0)).toSeq === Seq("purge_deletes", "compact_small_dirs"))
    assert(ran.forall(!_.isNullAt(2)))
    assert(ids(sql.sql(s"SELECT id, v FROM $t")) ===
      (0L until 300L).filterNot(i => i >= 150L && i < 160L))
    // the tick converges: nothing due, zero rows
    assert(sql.sql(s"MAINTAIN $t").collect().isEmpty)
    // re-declaring REPLACES the policy: the optional zorder trigger resets
    sql.sql(s"ALTER TABLE $t SET MAINTENANCE POLICY (maxSmallDirs = 99)")
    assert(Maintenance.fromProps(VersionedTable.tableProperties(root))
      .get.zorderBy.isEmpty)
    // MAINTAIN on a table with no declared policy refuses loudly
    val root2 = freshRoot()
    VersionedTable.commit(spark.range(0, 5).toDF("id"), root2)
    val t2 = freshTable()
    sql.sql(s"CREATE TABLE $t2 USING graft LOCATION '$root2'")
    val e = intercept[Exception] { sql.sql(s"MAINTAIN $t2").collect() }
    assert(e.getMessage.contains("no declared maintenance policy"))
  }

  test("DML on a time-travel snapshot and unsupported MERGE shapes fail loudly") {
    val root = freshRoot()
    VersionedTable.commit(spark.range(0, 5).toDF("id").withColumn("v", lit(0L)), root)
    val t = freshTable()
    sql.sql(s"CREATE TABLE $t USING graft LOCATION '$root'")
    val e = intercept[Exception] {
      sql.sql(s"MERGE INTO $t USING (SELECT 1L AS id, 2L AS v) s ON $t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = s.v + 1")
    }
    assert(e.getMessage.contains("supported shape"),
      s"expected the merge-shape refusal, got: ${e.getMessage}")
  }
}

object SqlCatalogSpec {
  @volatile private var cached: SparkSession = _

  /** Fresh session on the shared context with extensions + the graft
    * session catalog installed — built once per JVM.
    */
  def session(base: SparkSession): SparkSession = synchronized {
    if (cached == null) {
      val prevActive = SparkSession.getActiveSession
      val prevDefault = SparkSession.getDefaultSession
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      try {
        cached = SparkSession.builder()
          .withExtensions(new graft.plans.GraftExtensions)
          .config("spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.graft.GraftCatalog")
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
      } finally {
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        prevActive.foreach(SparkSession.setActiveSession)
        prevDefault.foreach(SparkSession.setDefaultSession)
      }
    }
    cached
  }
}
