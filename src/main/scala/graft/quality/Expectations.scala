package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations compiled to `Column` predicates and
  * evaluated in ONE aggregation pass — the Spark-native form of the
  * reference's Great-Expectations suite (`src/quality/data_contracts.py:15-96`,
  * `src/quality/great_expectations_setup.py:20-91`,
  * `great_expectations_validator.py:29-271`: between, not-null, pair A>=B,
  * in-set, unique, increasing).
  *
  * Row-local expectations compile to `count(CASE WHEN violated)` aggregates
  * sharing a single scan+agg; `Increasing` needs a lag window (one extra
  * shuffle) and `Unique` a keyed group-by — both stay fully distributed.
  */
object Expectations {

  sealed trait Expectation { def name: String }

  /** Row-local: compiles into the single shared agg pass. */
  sealed trait RowExpectation extends Expectation { def violated: Column }

  final case class NotNull(column: String) extends RowExpectation {
    val name = s"${column}_not_null"
    def violated: Column = col(column).isNull
  }
  final case class Between(column: String, lo: Double, hi: Double) extends RowExpectation {
    val name = s"${column}_between"
    def violated: Column = col(column).isNotNull && !(col(column) >= lo && col(column) <= hi)
  }
  final case class Positive(column: String) extends RowExpectation {
    val name = s"${column}_positive"
    def violated: Column = col(column).isNotNull && col(column) <= 0
  }
  final case class PairGte(a: String, b: String) extends RowExpectation {
    val name = s"${a}_gte_$b"
    def violated: Column = col(a).isNotNull && col(b).isNotNull && col(a) < col(b)
  }
  final case class InSet(column: String, values: Seq[String], nullOk: Boolean = true)
      extends RowExpectation {
    val name = s"${column}_in_set"
    def violated: Column = {
      val base = !col(column).isInCollection(values)
      if (nullOk) col(column).isNotNull && base else col(column).isNull || base
    }
  }

  /** Non-row-local expectations (documented plan cost in the scaladoc). */
  final case class Unique(columns: Seq[String]) extends Expectation {
    val name = s"${columns.mkString("_")}_unique"
  }

  /** `column` must be non-decreasing when ordered by `orderBy` within each
    * partition key (one lag-window pass — one extra shuffle).
    */
  final case class Increasing(column: String, orderBy: String, partitionBy: Seq[String])
      extends Expectation {
    val name = s"${column}_increasing"
  }

  /** Evaluate a suite. Row expectations share one agg; Unique/Increasing each
    * add one keyed pass. Returns a single row of violation counts (column per
    * expectation) plus total row count.
    */
  def evaluate(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val rowAggs = suite.collect { case e: RowExpectation =>
      count(when(e.violated, 1)).as(e.name)
    }
    val base = df.agg(count(lit(1)).as("n_rows"), rowAggs: _*)

    suite.foldLeft(base) {
      case (acc, Unique(cols0)) =>
        val dups = df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as(Unique(cols0).name))
        acc.crossJoin(dups)
      case (acc, inc @ Increasing(c, ord, parts)) =>
        val w = Window.partitionBy(parts.map(col): _*).orderBy(col(ord))
        val viol = df.select(col(c).as("__v"), lag(col(c), 1).over(w).as("__prev"))
          .agg(count(when(col("__prev") > col("__v"), 1)).as(inc.name))
        acc.crossJoin(viol)
      case (acc, _) => acc
    }
  }

  /** `expect_column_values_to_be_increasing` over an explicit order column
    * (`great_expectations_validator.py:101-107`): counts rows where `column`
    * decreases w.r.t. `orderBy` within each partition key.
    */
  def increasingViolations(
      df: DataFrame, column: String, orderBy: String, partitionBy: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderBy))
    df.select(col(column), lag(col(column), 1).over(w).as("__prev"))
      .agg(count(when(col("__prev") > col(column), 1)).as(s"${column}_increasing_violations"))
  }
}
