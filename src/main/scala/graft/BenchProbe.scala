package graft

/** Sub-phase wall-clock attribution for composite bench queries.
  *
  * Some registry entries are PIPELINES whose hash-gated answer needs O(N)
  * harness work around the operator under test — e.g. the `q_*_refresh`
  * queries seed a stale materialized aggregate (full-table compute + keyed
  * MERGE) before exercising the O(trailing-window) refresh, then read the
  * whole table back for the hash. A single wall number for such a query
  * measures the seed, and a real refresh regression hides inside it. Phase
  * keys (`<query>.seed`, `<query>.refresh`) split the measurement so the
  * bench (and the 10x scale artifact's ratios) can attribute each part.
  *
  * Registry/Verify correctness is untouched: timing wraps are transparent.
  */
object BenchProbe {

  private val timings = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Time `body` and accumulate its wall seconds under `key`. */
  def time[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally timings.merge(key, (System.nanoTime() - t0) / 1e9,
      (a, b) => a + b)
  }

  /** Snapshot and clear all recorded phases (bench calls this per query). */
  def drain(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val snap = timings.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
    timings.clear()
    snap
  }
}
