package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key salting for skewed equi-joins — the manual complement to AQE
  * skew-splitting for the cases AQE can't fix (e.g. a single hot symbol in a
  * shuffle join whose other side is too big to broadcast).
  *
  * The skewed (big) side gets a deterministic salt in [0, n) derived from a
  * high-cardinality column (never `rand()` — results must be replayable);
  * the small side replicates n×. The join key becomes (key, salt), spreading
  * each hot key over n tasks; the salt never escapes the operator.
  */
object Salting {

  /** @param big          the skewed fact side
    * @param small        the dimension side (replicated n×; keep it small)
    * @param key          equi-join key present on both sides
    * @param n            salt fan-out (tasks per hot key)
    * @param saltSource   high-cardinality column on `big` used to derive the
    *                     deterministic salt
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      n: Int,
      saltSource: String): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(n.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
