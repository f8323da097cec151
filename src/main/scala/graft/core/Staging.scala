package graft.core

import org.apache.spark.sql.DataFrame

/** The engine's one staging primitive for twice-referenced (or
  * per-micro-batch re-executed) subtrees: materialize a bounded
  * intermediate once so Catalyst stops re-planning — and re-executing —
  * it per consumer.
  *
  * Contract (why `localCheckpoint`, and what a cluster-mode consumer signs
  * up for):
  *
  *   - `localCheckpoint` TRUNCATES LINEAGE. On a real cluster, losing an
  *     executor that held checkpointed blocks fails the query instead of
  *     recomputing it (local mode never observes this). That is a
  *     deliberate trade for the engine's staging tables: they are bounded
  *     (stat frames, candidate pairs, distinct-token counts — never a raw
  *     fact scan), rebuilt from source on every query invocation, and
  *     every staged query is an idempotent re-run. A consumer that needs
  *     executor-loss recoverability should swap this single definition
  *     site for `persist(MEMORY_AND_DISK)` + an explicit count() barrier.
  *   - Blocks live at MEMORY_AND_DISK until the backing RDD is GC'd; the
  *     ContextCleaner reclaims them after the query's frames go
  *     unreachable. Library callers looping these operators in one
  *     session inherit that (bounded) pressure; where a terminal action
  *     exists, unpersisting early is the caller's prerogative.
  */
object Staging {

  /** Lazy staging: the subtree materializes at its FIRST action and every
    * later consumer (or micro-batch) reads the stored blocks. Use for
    * subtrees consumed 2+ times in one query plan, and for the static
    * side of a stream-static join (IncrementalExecution re-plans — and
    * re-executes — the static subtree on every micro-batch otherwise).
    */
  def stage(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)

  /** Eager staging: materialize NOW. Use when the materialization is the
    * point (a barrier before overwriting the input path, or pinning a
    * loop-carried frame so the next iteration plans against stored
    * blocks).
    */
  def stageNow(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
}
