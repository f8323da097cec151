package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Sign-random-projection LSH bucket key for an embedding vector: bit `p` of
  * the result is set when `Σ_i emb[i] · sign(xxhash64(p, i))` is ≥ 0, with
  * the pseudo-random ±1 signs derived from the same seeded xxhash64 fold as
  * the SQL `xxhash64(CAST(p AS BIGINT), CAST(i AS BIGINT))` — deterministic
  * across runs and value-identical to the higher-order-function form kept at
  * [[graft.ext.Similarity.Hof.lshBucket]] (equivalence-tested in ExtSpec).
  *
  * Native for the same reason as [[TextHashing]]: the HOF form evaluates an
  * interpreted two-array zip per plane per row; this is one method doing
  * `planes × dims` fused multiply-adds. Per (plane, dim) the sign is a pure
  * function of (p, i), so it is precomputed once per expression instance and
  * shared across all rows (the HOF form re-hashes per row per element).
  */
case class SrpBucket(child: Expression, planes: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket expects ARRAY<DOUBLE> or ARRAY<FLOAT>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  // lazy: child.dataType is not callable until the expression is resolved
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** signs(p)(i) = +1.0 / -1.0, precomputed lazily up to the longest vector
    * seen; grows monotonically (thread-confined per task after copy).
    */
  @transient private lazy val signCache =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]](
      Array.fill(planes)(Array.emptyDoubleArray))

  private def sign(p: Long, i: Long): Double = {
    // pmod(xxhash64(p, i), 2) == 0 -> +1 else -1, exactly as the HOF form.
    val h = XxHash64Function.hash(i, LongType,
      XxHash64Function.hash(p, LongType, 42L))
    val m = h % 2
    if ((if (m < 0) m + 2 else m) == 0) 1.0 else -1.0
  }

  private def signsFor(dims: Int): Array[Array[Double]] = {
    val cur = signCache.get()
    if (cur(0).length >= dims) cur
    else {
      val grown = Array.tabulate(planes) { p =>
        Array.tabulate(dims)(i => sign(p.toLong, i.toLong))
      }
      signCache.compareAndSet(cur, grown)
      grown
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val signs = signsFor(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * sp(i)
        i += 1
      }
      if (proj >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucket {
  def apply(emb: Column, planes: Int): Column =
    ColumnBridge.column(SrpBucket(ColumnBridge.expression(emb), planes))
}

/** Portable twin of [[SrpBucket]]: the hyperplane sign for (plane, dim) is
  * the parity of the first hex digit of `md5("<p>_<i>")` — md5 is shared
  * bit-for-bit by every engine (the [[graft.ext.Curation.hashUniform]]
  * precedent), so a DuckDB oracle replays the buckets exactly, which the
  * xxhash64-seeded signs cannot offer. Projections fold in index order
  * (identical IEEE sequence to the oracle's `list_reduce`); signs are
  * precomputed once per expression instance like the parent.
  */
case class SrpBucketPoly(child: Expression, planes: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket_poly expects ARRAY<DOUBLE> or ARRAY<FLOAT>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sign(p: Long, i: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"${p}_${i}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first hex digit = high nibble of byte 0; even -> +1, odd -> -1
    if (((d(0) >>> 4) & 1) == 0) 1.0 else -1.0
  }

  @transient private lazy val signCache =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]](
      Array.fill(planes)(Array.emptyDoubleArray))

  private def signsFor(dims: Int): Array[Array[Double]] = {
    val cur = signCache.get()
    if (cur(0).length >= dims) cur
    else {
      val grown = Array.tabulate(planes) { p =>
        Array.tabulate(dims)(i => sign(p.toLong, i.toLong))
      }
      signCache.compareAndSet(cur, grown)
      grown
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val signs = signsFor(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * sp(i)
        i += 1
      }
      if (proj >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucketPoly {
  def apply(emb: Column, planes: Int): Column =
    ColumnBridge.column(SrpBucketPoly(ColumnBridge.expression(emb), planes))
}
