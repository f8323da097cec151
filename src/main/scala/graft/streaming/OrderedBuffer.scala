package graft.streaming

import org.apache.spark.sql.streaming.ListState

/** Shared pending-buffer mechanics for event-time-ordered
  * `transformWithState` processors ([[OrderedCusum]], [[OrderedHampel]]):
  * take everything the watermark covers out of the ListState, split off
  * the rows that arrived too late to fold in order, and hand back the
  * ripe remainder sorted by (event time, tiebreak).
  *
  * Watermarks are millisecond-granular, so ripeness is judged against the
  * last covered whole millisecond (`wm·1000 + 999` μs): same-millisecond
  * rows fold together when they arrive together, and a straggler into an
  * already-folded millisecond is late by construction.
  */
object OrderedBuffer {

  final case class Consumed[O](
      ripe: Array[O], nLate: Int, ripeBound: Long, consumedAny: Boolean)

  /** Drain the watermark-covered prefix of `pending`. Rows at or below
    * `foldedUpTo` would fold out of order — counted late and dropped; the
    * rest come back sorted. The un-covered suffix is written back.
    */
  def consume[O <: AnyRef](
      pending: ListState[O],
      wmMs: Long,
      foldedUpTo: Long,
      time: O => Long,
      tiebreak: O => String)(implicit ct: scala.reflect.ClassTag[O]): Consumed[O] = {
    val ripeBound = wmMs * 1000L + 999L
    val all = pending.get().toArray
    val (covered, rest) = all.partition(o => time(o) <= ripeBound)
    if (covered.isEmpty) Consumed(Array.empty[O], 0, ripeBound, consumedAny = false)
    else {
      pending.clear()
      if (rest.nonEmpty) pending.put(rest)
      val (late, ripe) = covered.partition(o => time(o) <= foldedUpTo)
      // Comparator sort instead of sortBy: a multi-million-row drain (the
      // single-batch AvailableNow replay buffers the whole corpus) must not
      // allocate a boxed (Long, String) key per element.
      java.util.Arrays.sort(ripe.asInstanceOf[Array[AnyRef]],
        new java.util.Comparator[AnyRef] {
          override def compare(x: AnyRef, y: AnyRef): Int = {
            val a = x.asInstanceOf[O]; val b = y.asInstanceOf[O]
            val c = java.lang.Long.compare(time(a), time(b))
            if (c != 0) c else tiebreak(a).compareTo(tiebreak(b))
          }
        })
      Consumed(ripe, late.length, ripeBound, consumedAny = true)
    }
  }
}
