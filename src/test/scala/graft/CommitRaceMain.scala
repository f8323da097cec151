package graft

/** Forked-JVM writer for the multi-PROCESS commit race (see
  * VersionedTableSpec "two separate JVMs race"): hammers
  * `LocalCommitStore.putIfAbsent` on a shared root until it has won
  * `winsTarget` versions, then prints `WON:<v1>,<v2>,...`. Two of these in
  * separate processes reproduce the cross-JVM scenario in-thread tests
  * cannot (shared thread ids, no shared JVM memory, real filesystem
  * visibility) — the race the r11 thread-id tmp-name bug survived.
  */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(storeKind, root, id, winsTarget) = args
    val store: graft.sources.CommitStore = storeKind match {
      case "local" => new graft.sources.LocalCommitStore
      case "excl"  => new graft.sources.ExclusiveCreateCommitStore
      case other   => sys.error(s"unknown store kind $other")
    }
    val target = winsTarget.toInt
    var won = List.empty[Int]
    while (won.size < target) {
      val vs = store.versions(root)
      val next = (if (vs.isEmpty) 0 else vs.max) + 1
      // a recognizable body: winner id + a payload long enough that a torn
      // or clobbered write is detectable by the asserting parent
      val body = s"writer=$id\nversion=$next\n" + ("x" * 4096)
      if (store.putIfAbsent(root, next, body)) won ::= next
    }
    println("WON:" + won.sorted.mkString(","))
  }
}
