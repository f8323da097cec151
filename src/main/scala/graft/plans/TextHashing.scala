package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hot path: word shingling,
  * MinHash signatures/bands, exact Jaccard, and SimHash.
  *
  * Why native: Spark's higher-order array functions (`transform`/`aggregate`/
  * `zip_with`) are interpreted (`CodegenFallback`) and allocate an array per
  * lambda step. The MinHash fold in particular builds two 32-element arrays
  * per *shingle* per row; at sf0.1 (5 000 docs × ~50 shingles × 32 hashes)
  * the interpreted form measured 104 s wall-clock. Each expression below is
  * one JVM method per row doing tight primitive loops — same results,
  * no intermediate allocation. (Same preference order as
  * [[CosineSimilarity]]: native Expression > HOF > UDF.)
  *
  * Bit-compatibility: hashing reuses [[XxHash64Function]] with the same seed
  * folding as the SQL `xxhash64(...)` expression (seed 42, left-to-right),
  * so every expression here is provably value-identical to the
  * higher-order-function forms in [[graft.ext.Dedup]] — asserted by
  * `ExtSpec`'s HOF≡native equivalence tests.
  *
  * Reference behavior being served: MinHash/SimHash near-dedup of the
  * document corpus (training-data pipeline surface; see SURVEY §7.5).
  */
object TextHashing {

  private val Seed = 42L

  private[plans] def splitTokens(text: UTF8String): Array[String] =
    // Matches `split(text, ' ')` (Java regex semantics, limit -1: trailing
    // empty tokens kept) — the contract the DuckDB oracle mirrors.
    text.toString.split(" ", -1)

  /** xxhash64(s) — string folded onto seed 42, identical to the SQL fn. */
  private[plans] def hashString(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, Seed)

  /** Distinct word n-grams of `text` (first-occurrence order), `" "`-joined.
    * Value-identical to [[graft.ext.Dedup.shingles]].
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"shingle size must be >= 1, got $n")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects STRING, got ${dt.simpleString}")
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val toks = splitTokens(input.asInstanceOf[UTF8String])
      val out = mutable.LinkedHashSet.empty[String]
      if (n == 1) {
        toks.foreach(out += _)
      } else if (toks.length >= n) {
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(toks(i + k))
            k += 1
          }
          out += sb.toString
          i += 1
        }
      }
      new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature: element i is `min over shingles of xxhash64(s, i)`.
    * Empty input yields all-Long.MaxValue (callers filter empty shingle sets
    * first). Value-identical to [[graft.ext.Dedup.minhashSignature]].
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    require(numHashes >= 1)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects ARRAY<STRING>, got ${dt.simpleString}")
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(MinHashSig.signature(input.asInstanceOf[ArrayData], numHashes))

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object MinHashSig {
    private[plans] def signature(arr: ArrayData, numHashes: Int): Array[Long] = {
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      val m = arr.numElements()
      while (j < m) {
        val base = XxHash64Function.hash(arr.getUTF8String(j), StringType, Seed)
        var i = 0
        while (i < numHashes) {
          val h = XxHash64Function.hash(i, IntegerType, base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
      mins
    }
  }

  /** LSH band keys: the signature cut into `bands` contiguous slices of
    * `numHashes / bands` values, each rendered as the `","`-joined decimal
    * string — byte-identical to the HOF form's
    * `concat_ws(",", slice(sig, b*rows+1, rows))` (bigint→string cast).
    * Fusing signature+banding into ONE expression also stops Catalyst's
    * `CollapseProject` from inlining the signature subtree into every band
    * slice (the interpreted form recomputed the signature `bands`×).
    */
  case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
      extends UnaryExpression with CodegenFallback {
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_bands expects ARRAY<STRING>, got ${dt.simpleString}")
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val sig = MinHashSig.signature(input.asInstanceOf[ArrayData], numHashes)
      val rows = numHashes / bands
      val out = new Array[Any](bands)
      val sb = new java.lang.StringBuilder
      var b = 0
      while (b < bands) {
        sb.setLength(0)
        var r = 0
        while (r < rows) {
          if (r > 0) sb.append(',')
          sb.append(sig(b * rows + r))
          r += 1
        }
        out(b) = UTF8String.fromString(sb.toString)
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact Jaccard over two string arrays:
    * `|distinct(a) ∩ b| / (|a| + |b| - |distinct(a) ∩ b|)`, NULL when the
    * denominator is 0 — the same value as the HOF form
    * `size(array_intersect(a,b)) / nullif(size(a)+size(b)-size(...), 0)`
    * (inputs are distinct shingle sets, and `array_intersect` dedups its
    * left side, which the `seen` set reproduces).
    */
  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_jaccard expects two ARRAY<STRING>, got ${l.simpleString}, ${r.simpleString}")
      }

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val ySet = new java.util.HashSet[UTF8String](y.numElements() * 2)
      var j = 0
      while (j < y.numElements()) { ySet.add(y.getUTF8String(j)); j += 1 }
      val seen = new java.util.HashSet[UTF8String](x.numElements() * 2)
      var inter = 0
      var i = 0
      while (i < x.numElements()) {
        val s = x.getUTF8String(i)
        if (seen.add(s) && ySet.contains(s)) inter += 1
        i += 1
      }
      val denom = x.numElements() + y.numElements() - inter
      if (denom == 0) null else inter.toDouble / denom
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash over whitespace tokens (duplicates and empty tokens
    * counted, as the HOF form does): bit j of the result is set when
    * `2 * count(tokens with hash bit j set) >= n_tokens`. Value-identical
    * to [[graft.ext.Dedup.simhash]].
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects STRING, got ${dt.simpleString}")
    }

    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any = {
      val toks = splitTokens(input.asInstanceOf[UTF8String])
      val counts = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        val h = hashString(UTF8String.fromString(toks(i)))
        var j = 0
        while (j < 64) {
          counts(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) * 2 >= toks.length) out |= 1L << j
        j += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Engine-portable polynomial string hash — the same char-code fold as
    * [[WinnowFp]] (`h = fold (h*131 + codePoint) mod 1e9+7`), applied to a
    * whole string. A DuckDB `list_reduce` over `unicode(substr(...))`
    * replays it exactly, which xxhash64 (engine-specific) cannot offer.
    */
  private[plans] def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var si = 0
    while (si < str.length) {
      val cp = str.codePointAt(si)
      h = (h * 131L + cp) % 1000000007L
      si += Character.charCount(cp)
    }
    h
  }

  /** MinHash+LSH band keys over the PORTABLE polynomial hash: per shingle
    * base hash `polyHash`, per signature slot i the min over shingles of
    * `((2i+1)·h + i) mod 1e9+7`, banded exactly like [[MinHashBands]].
    * Same fused single-pass shape (signature never re-evaluated per band);
    * exists so the near-dup tier has a bit-exact DuckDB oracle — the
    * xxhash64 variant stays the default (its 64-bit space has ~2^-34 the
    * accidental-collision rate of this 30-bit one).
    */
  case class MinHashBandsPoly(child: Expression, numHashes: Int, bands: Int)
      extends UnaryExpression with CodegenFallback {
    require(numHashes % bands == 0, s"bands $bands must divide numHashes $numHashes")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_bands_poly expects ARRAY<STRING>, got ${dt.simpleString}")
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      while (j < arr.numElements()) {
        val base = polyHash(arr.getUTF8String(j))
        var i = 0
        while (i < numHashes) {
          val h = ((2L * i + 1L) * base + i) % 1000000007L
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
      val rows = numHashes / bands
      val out = new Array[Any](bands)
      val sb = new java.lang.StringBuilder
      var b = 0
      while (b < bands) {
        sb.setLength(0)
        var r = 0
        while (r < rows) {
          if (r > 0) sb.append(',')
          sb.append(mins(b * rows + r))
          r += 1
        }
        out(b) = UTF8String.fromString(sb.toString)
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Portable SimHash over the polynomial token hash (1e9+7 < 2^30, so bits
    * 0..29 of the base hash are uniform): bit j set when
    * `2·count(tokens with bit j set) >= n_tokens` — the same vote rule as
    * [[SimHash64]], replayable in DuckDB with integer div/mod.
    *
    * Up to 60 bits: bits 0..29 come from the base hash, bits 30..59 from the
    * independent affine rehash `(31·h + 17) mod 1e9+7` (affine maps mod a
    * prime are bijections, so the second family keeps the base's uniformity
    * while decorrelating bit positions) — discrimination comparable to the
    * 64-bit xxhash form with every bit replayable cross-engine.
    */
  case class SimHashPoly(child: Expression, bits: Int = 30)
      extends UnaryExpression with CodegenFallback {
    require(bits >= 1 && bits <= 60, s"bits must be in [1,60], got $bits")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_poly expects STRING, got ${dt.simpleString}")
    }

    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any = {
      val toks = splitTokens(input.asInstanceOf[UTF8String])
      val counts = new Array[Int](bits)
      var i = 0
      while (i < toks.length) {
        val h = polyHash(UTF8String.fromString(toks(i)))
        val h2 = (31L * h + 17L) % 1000000007L
        var j = 0
        while (j < bits) {
          val src = if (j < 30) h >>> j else h2 >>> (j - 30)
          counts(j) += (src & 1L).toInt
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < bits) {
        if (counts(j) * 2 >= toks.length) out |= 1L << j
        j += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): polynomial hash
    * of every character k-gram (`h = fold (h*131 + code) mod 1e9+7`), sliding
    * w-window minima, distinct + sorted. Value-identical to
    * [[graft.ext.Winnow.Hof.fingerprints]] — `code` is the Unicode CODE
    * POINT of each character, the value Spark's
    * `ascii(substring(text, j, 1))` returns (`Ascii` evaluates
    * `codePointAt(0)` of the sliced character) and the value the DuckDB
    * oracle's `unicode()` returns, so all three forms agree on any text, not
    * just ASCII.
    *
    * One tight primitive pass per row: the interpreted HOF form allocates a
    * lambda frame per character (O(L·k) boxed steps) and re-slices the hash
    * array per window.
    */
  case class WinnowFp(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects STRING, got ${dt.simpleString}")
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // one code point per Spark "character" (substring slices whole code
      // points; a surrogate pair is one character both there and here)
      val nChars = s.codePointCount(0, s.length)
      val codes = new Array[Int](nChars)
      var ci = 0
      var si = 0
      while (si < s.length) {
        val cp = s.codePointAt(si)
        codes(ci) = cp
        ci += 1
        si += Character.charCount(cp)
      }
      val n = nChars - k + 1
      if (n <= 0) return new GenericArrayData(Array.empty[Any])
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        var h = 0L
        var j = i
        val end = i + k
        while (j < end) { h = (h * 131L + codes(j)) % 1000000007L; j += 1 }
        hs(i) = h
        i += 1
      }
      val sel = new java.util.TreeSet[java.lang.Long]
      if (n < w) {
        var m = hs(0)
        i = 1
        while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
        sel.add(m)
      } else {
        i = 0
        while (i <= n - w) {
          var m = hs(i)
          var j = i + 1
          val end = i + w
          while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
          sel.add(m)
          i += 1
        }
      }
      val out = new Array[Any](sel.size)
      val it = sel.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column builders (no registration needed) --------------------------

  private def e(c: Column): Expression = ColumnBridge.expression(c)

  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(e(text), n))

  def minhashSignature(sh: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(e(sh), numHashes))

  def minhashBands(sh: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBands(e(sh), numHashes, bands))

  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(e(a), e(b)))

  def simhash(text: Column): Column =
    ColumnBridge.column(SimHash64(e(text)))

  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFp(e(text), k, w))

  def minhashBandsPoly(sh: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBandsPoly(e(sh), numHashes, bands))

  def simhashPoly(text: Column, bits: Int = 30): Column =
    ColumnBridge.column(SimHashPoly(e(text), bits))

  // ---- SQL registration (parity with cosine_sim) -------------------------

  private def intLit(ex: Expression, what: String): Int = ex match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Registers graft_shingles / graft_minhash / graft_minhash_bands /
    * graft_jaccard / graft_simhash for SQL use.
    */
  def register(spark: SparkSession): Unit = {
    def reg(name: String, builder: Seq[Expression] => Expression): Unit =
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(TextHashing.getClass.getName, name),
        builder)
    reg("graft_shingles", ex => WordShingles(ex.head, intLit(ex(1), "n")))
    reg("graft_minhash", ex => MinHashSig(ex.head, intLit(ex(1), "numHashes")))
    reg("graft_minhash_bands",
      ex => MinHashBands(ex.head, intLit(ex(1), "numHashes"), intLit(ex(2), "bands")))
    reg("graft_jaccard", ex => JaccardSim(ex.head, ex(1)))
    reg("graft_simhash", ex => SimHash64(ex.head))
    reg("graft_winnow",
      ex => WinnowFp(ex.head, intLit(ex(1), "k"), intLit(ex(2), "w")))
    reg("graft_minhash_bands_poly",
      ex => MinHashBandsPoly(ex.head, intLit(ex(1), "numHashes"), intLit(ex(2), "bands")))
    reg("graft_simhash_poly", ex => SimHashPoly(ex.head))
  }
}
