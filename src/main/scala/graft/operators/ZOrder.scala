package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional file skipping — the
  * lakehouse answer to "this table is filtered by symbol AND by date, but a
  * sort can only cluster one of them".
  *
  * Each row's cluster key interleaves the bits of two dimension columns
  * (16 bits each → one 32-bit Morton code), so rows close in BOTH dimensions
  * land in the same file. Per-file min/max stats then prune point/range
  * predicates on EITHER column: a linear sort by column A gives column B
  * full-range stats in every file (0% skipped), the Z layout bounds both.
  *
  * Everything here is deterministic integer bit-math (`shiftleft`/`&`/`|`),
  * codegen'd end to end and expressible identically in ANSI SQL — the
  * layout decision itself is oracle-checkable, not just its effect.
  *
  * Scale shape: computing codes is a narrow map; laying out N target files
  * is ONE range-ish repartition (here by the code's TOP BITS — deterministic,
  * no sampling, unlike `repartitionByRange`) + a per-file local sort. At
  * 100 TB this is the standard `OPTIMIZE ... ZORDER BY` shape: one shuffle,
  * then every subsequent query on either dimension reads `O(matching files)`.
  *
  * Reference anchor: the reference's TimescaleDB side gets the same effect
  * from the `(symbol, time DESC)` composite index + per-day chunks
  * (`sql/timescaledb_schema.sql`); Z-order is the object-store-native
  * equivalent when there is no B-tree.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,…,30) —
    * the classic magic-number interleave, four codegen'd integer ops deep.
    */
  def spreadBits16(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: `a` on even bits, `b` on odd. */
  def morton16(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** Bits each dimension keeps in an N-dim interleave: 16 where they fit,
    * fewer for wide interleaves so the code stays under 62 bits (bit 63 is
    * the sign; 62 keeps every shift in positive-long territory).
    */
  def bitsPerDim(n: Int): Int = {
    require(n >= 1, s"need at least one dimension, got $n")
    math.min(16, 62 / n)
  }

  /** Total code width of [[mortonN]] over `n` dimensions. */
  def mortonBits(n: Int): Int = n * bitsPerDim(n)

  /** Spread the low [[bitsPerDim]](n) bits of a 16-bit value to stride-n
    * positions (bit i → bit i·n). Dimensions beyond 3 coarsen by dropping
    * LOW bits first (`shiftright`) — monotone, so clustering stays sound,
    * only finer than 2^bits granularity is lost. n == 2 keeps the
    * magic-number fast path (identical values, shorter expression tree).
    */
  def spreadBits16N(x: Column, n: Int): Column = {
    val bits = bitsPerDim(n)
    val m = shiftright(x.bitwiseAND(lit(0xFFFFL)), 16 - bits)
    if (n == 1) m
    else if (n == 2) spreadBits16(shiftleft(m, 16 - bits)) // bits == 16 here
    else (0 until bits).map(i =>
      shiftleft(shiftright(m, i).bitwiseAND(lit(1L)), i * n))
      .reduce(_.bitwiseOR(_))
  }

  /** N-dimensional Morton code of values already scaled to 16 bits
    * ([[scaleTo16]]): dimension k's bit i lands at position i·N + k, so
    * the code's TOP bits cycle through every dimension's top bits — a
    * prefix range of the code bounds EVERY dimension, which is what makes
    * the dir assignment (the top `log2(nDirs)` bits) cluster all N
    * columns at once. For N = 2 this is bit-identical to [[morton16]].
    * Pure integer bit-math, codegen'd end to end.
    */
  def mortonN(dims16: Seq[Column]): Column = {
    require(dims16.nonEmpty, "need at least one dimension")
    val n = dims16.size
    dims16.zipWithIndex.map { case (d, k) =>
      shiftleft(spreadBits16N(d, n), k)
    }.reduce(_.bitwiseOR(_))
  }

  /** Map a non-negative long with inclusive domain maximum `maxInclusive`
    * onto the FULL [0, 65536) range (deterministic — no sampled quantiles;
    * callers pass the column's contractual domain). Small domains are
    * spread UP so the code's top bits — the file assignment — still vary;
    * large domains are bucketed down. Pure integer math: `x << 16` stays
    * below 2^63 for every in-domain x (x ≤ maxInclusive < 2^47), and `div`
    * is exact integral division — no double rounding anywhere, so the
    * mapping is exact across the whole admitted domain (a double `/` would
    * only be exact below 2^53 and silently misplace codes above ~2^37).
    */
  def scaleTo16(x: Column, maxInclusive: Long): Column = {
    require(maxInclusive >= 0 && maxInclusive < (1L << 47),
      s"domain max out of range: $maxInclusive")
    // cast first: shiftleft preserves IntegerType, and a 32-bit `x << 16`
    // would silently overflow for int inputs >= 2^15
    call_function("div", shiftleft(x.cast("long"), 16), lit(maxInclusive + 1L))
      .bitwiseAND(lit(0xFFFFL))
  }

  /** Assign each row its Morton code and target file (the code's top bits —
    * `log2(nFiles)` of them), plus the raw dims for stats audits.
    * `nFiles` must be a power of two ≤ 2^32.
    */
  def layout(
      df: DataFrame,
      colA: String, maxA: Long,
      colB: String, maxB: Long,
      nFiles: Int): DataFrame = {
    require(nFiles > 0 && (nFiles & (nFiles - 1)) == 0, s"nFiles must be a power of two, got $nFiles")
    val shift = 32 - java.lang.Integer.numberOfTrailingZeros(nFiles)
    df.withColumn("zcode", morton16(scaleTo16(col(colA), maxA), scaleTo16(col(colB), maxB)))
      .withColumn("zfile", shiftright(col("zcode"), shift))
  }

  /** Per-file min/max skipping stats for both dimensions under the Z layout —
    * exactly the footer stats a scan would prune on.
    */
  def fileStats(
      df: DataFrame,
      colA: String, maxA: Long,
      colB: String, maxB: Long,
      nFiles: Int): DataFrame =
    layout(df, colA, maxA, colB, maxB, nFiles)
      .groupBy("zfile")
      .agg(
        count(lit(1)).as("n_rows"),
        min(colA).as("min_a"), max(colA).as("max_a"),
        min(colB).as("min_b"), max(colB).as("max_b"))

  /** Fraction of files a min/max-pruned scan skips for an equality predicate
    * on ONE dimension, under a given layout frame (must carry `zfile` plus
    * the dim column). The measurable value of the layout.
    */
  def skipFraction(laid: DataFrame, dim: String, value: Long): Double = {
    val r = laid.groupBy("zfile")
      .agg(min(dim).as("mn"), max(dim).as("mx"))
      .agg(
        count(lit(1)).as("total"),
        count(when(col("mn") > value || col("mx") < value, 1)).as("skipped"))
      .head
    r.getAs[Long]("skipped").toDouble / r.getAs[Long]("total").toDouble
  }
}
