package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Runtime bloom-filter join pruning — the explicit form of the "runtime
  * row-level filtering" a 100 TB star join lives or dies by.
  *
  * A selective dimension side is reduced to ONE bounded-size bloom filter
  * (Spark's native `BloomFilterAggregate`, the same sketch the optimizer's
  * `spark.sql.optimizer.runtimeFilter` path builds), which is inlined as a
  * literal predicate on the fact scan. The fact table is filtered BEFORE the
  * join shuffle: only rows whose key *might* match ship. Bloom false
  * positives are then removed by the exact join, so results are identical to
  * the un-pruned join — the bloom only cuts shuffle volume, never changes
  * semantics (which is also what makes the operator oracle-checkable against
  * the plain-join SQL).
  *
  * Scale shape: dim scan → one `numBits/8`-byte blob on the driver (a ≤1-row
  * collect, same discipline as [[graft.features.LargeTrades]]' thresholds) →
  * embedded in the plan as a literal, so every executor probes it locally
  * with codegen'd xxhash64 — no extra shuffle, no broadcast-join memory
  * ceiling on the pruned side. At 1000 executors the win is the fact rows
  * that never leave their mapper: for a 1%-selective dim, ~99% of the fact
  * shuffle disappears for the cost of one 2 MB sketch.
  *
  * Reference anchor: the reference's star queries filter facts by a selected
  * symbol set via plain hash joins (`sql/feature_queries.sql`); this operator
  * is the scale path for the same semantics.
  */
object BloomPrune {

  /** Bloom-filter aggregate over `key` as a Column (internal expression —
    * not exposed in the public function registry; bridged directly).
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(key))),
        Literal(expectedItems), Literal(numBits)
      ).toAggregateExpression())

  /** `might_contain(bloom, xxhash64(key))` over a driver-built bloom blob. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Build the dim-side bloom: one aggregation, one bounded blob. */
  def buildBloom(
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): Array[Byte] =
    dim.select(bloomAgg(col(dimKey), expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]](0)

  /** Exact left-semi join with a bloom pre-filter on the fact side.
    * Result is row-identical to `fact SEMI JOIN dim ON factKey = dimKey`.
    */
  def semiJoinPruned(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    fact
      .where(mightContain(bloom, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "leftsemi")
  }

  /** Exact inner join with a bloom pre-filter on the fact side. */
  def innerJoinPruned(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    fact
      .where(mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
