package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM maintenance writer for the cross-PROCESS maintenance-vs-
  * appender race (see MaintenanceRaceSpec "two separate JVMs"): runs
  * `compactSmallDirs` in a loop against a shared root while the parent
  * test JVM streams appends at it, then prints
  * `COMPACTED:<n> REBASED:<m>`. A real second process is the only way to
  * exercise the rebase path against genuinely concurrent filesystem
  * commits (no shared JVM memory, real conditional-put contention) — the
  * same reason CommitRaceMain exists for the raw commit store.
  */
object MaintenanceRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, roundsStr) = args
    val rounds = roundsStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-maintenance-race")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.VersionedTable
    var compacted = 0
    (0 until rounds).foreach { _ =>
      // every small dir below 1 MiB collapses; the parent's appends are
      // tiny, so most rounds find fragments to fold. A round that loses a
      // conflicting-scope race (the parent never DMLs, so only possible if
      // a prior compact of ours is mid-flight — single-threaded here, so
      // never) would be a bug; let it propagate and fail the fork.
      val before = VersionedTable.latestVersion(root).getOrElse(0)
      val v = VersionedTable.compactSmallDirs(spark, root,
        maxBytes = 1L << 20, minDirs = 2, statsCols = Seq("id"))
      if (v != before) compacted += 1
      Thread.sleep(5)
    }
    println(s"COMPACTED:$compacted REBASED:${VersionedTable.rebaseCount.get()}")
    spark.stop()
  }
}
