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

  /** Completeness expectation (`data_contracts.py:46-51`): non-null
    * fraction of `column` must reach `minFraction`. The fraction is one
    * count/count division — a single deterministic IEEE op, identical on
    * every engine, so the pass flag cannot flip cross-engine.
    */
  final case class Completeness(column: String, minFraction: Double) extends Expectation {
    val name = s"${column}_completeness"
  }

  /** Schema expectation (`data_contracts.py:22-31`): the column must exist
    * with the expected Spark SQL simple type (e.g. "string", "double").
    * Resolved against the DataFrame schema at plan time — emitted as a
    * constant pass flag so the contract report carries it alongside the
    * data-driven checks.
    */
  final case class TypeIs(column: String, simpleType: String) extends Expectation {
    val name = s"${column}_type_ok"
  }

  /** Evaluate a suite. Row expectations share one agg; Unique/Increasing each
    * add one keyed pass. Returns a single row of violation counts (column per
    * expectation) plus total row count.
    */
  def evaluate(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val rowAggs = suite.collect {
      case e: RowExpectation => count(when(e.violated, 1)).as(e.name)
      case c @ Completeness(column, _) =>
        (count(col(column)).cast("double") / count(lit(1))).as(c.name)
      case t @ TypeIs(column, simpleType) =>
        // resolve like the analyzer: case-insensitive by default (a 'Price'
        // column must match a 'price' expectation, not silently fail), and
        // a column that does not exist at all errors loudly like every
        // other expectation's unresolved-column path would
        val field = df.schema.fields.find(f =>
          df.sparkSession.sessionState.conf.resolver(f.name, column))
        require(field.isDefined,
          s"TypeIs: column '$column' not found in ${df.schema.fieldNames.mkString(", ")}")
        lit(field.exists(_.dataType.simpleString == simpleType)).as(t.name)
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

  /** The reference's full market-data contract
    * (`data_contracts.py:64-96`): schema types, price/volume ranges, 100%
    * completeness on the key columns, trade_id uniqueness, side ∈
    * {buy, sell, NULL}. One shared agg pass + the uniqueness keyed pass.
    */
  def marketDataContract: Seq[Expectation] = Seq(
    TypeIs("symbol", "string"), TypeIs("price", "double"),
    TypeIs("volume", "double"), TypeIs("trade_id", "string"),
    Between("price", 0.01, 1000000.0), Between("volume", 0.0, 1e12),
    Completeness("symbol", 1.0), Completeness("price", 1.0),
    Completeness("volume", 1.0), Completeness("trade_id", 1.0),
    Unique(Seq("trade_id")), InSet("side", Seq("buy", "sell")))

  /** Overall contract verdict (`validate_data_contract`,
    * `data_contracts.py:127-175`): every violation count zero, every
    * completeness at its floor, every type check true. Decided on the
    * report columns, so the flag is as engine-portable as they are.
    */
  def withVerdict(report: DataFrame, suite: Seq[Expectation]): DataFrame =
    report.withColumn("passed", suite.map {
      case Completeness(c, f) => col(s"${c}_completeness") >= f
      case t: TypeIs          => col(t.name)
      case e                  => col(e.name) === 0
    }.reduce(_ && _))

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
