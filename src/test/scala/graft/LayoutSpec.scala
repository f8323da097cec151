package graft

import graft.core.Tables
import graft.operators.{BloomPrune, ZOrder}
import org.apache.spark.sql.functions._

/** Bloom join pruning + Z-order layout: value transparency, bit-exactness
  * against a Scala reference interleave, the plan shape, and the measurable
  * file-skipping effect.
  */
class LayoutSpec extends SparkTestBase {

  // ---------------------------------------------------------------- bloom

  test("bloom-pruned semi join is row-identical to the plain semi join") {
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val pruned = BloomPrune.semiJoinPruned(fact, dim, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, numBits = 1L << 16)
    val plain = fact.join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "leftsemi")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom pre-filter actually prunes: kept rows << fact, >= true matches") {
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bloom = BloomPrune.buildBloom(dim, "o_orderkey", 10000L, 1L << 16)
    val factN = fact.count()
    val trueN = fact.join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "leftsemi").count()
    val keptN = fact.where(BloomPrune.mightContain(bloom, col("l_orderkey"))).count()
    assert(keptN >= trueN, "bloom must never drop a true match")
    // ~20% of orders are 1-URGENT; with 2^16 bits the FP rate stays low
    // enough that the pre-filter keeps well under half the fact table.
    assert(keptN < factN / 2, s"pre-filter kept $keptN of $factN — no pruning happened")
  }

  test("might_contain predicate sits in the fact-side filter of the plan") {
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001).limit(100).select("o_orderkey")
    val pruned = BloomPrune.semiJoinPruned(fact, dim, "l_orderkey", "o_orderkey",
      expectedItems = 1000L, numBits = 1L << 14)
    val plan = pruned.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"bloom predicate missing from plan:\n$plan")
  }

  // -------------------------------------------------------------- z-order

  /** Reference Morton interleave, bit by bit — the slow obvious form. */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("morton16 matches the bit-by-bit reference on the full corner set") {
    val cases = Seq[(Long, Long)](
      (0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (1L, 2L), (43690L, 21845L), (12345L, 54321L), (32768L, 1L))
    val df = spark.createDataFrame(cases).toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.morton16(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      val expected = mortonRef(r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === expected,
        s"morton16(${r.getLong(0)}, ${r.getLong(1)}) = ${r.getLong(2)}, want $expected")
    }
  }

  test("z-order layout skips most files for point predicates on EITHER dim; linear sort cannot") {
    // 64k rows over a 256x256 grid of (ka, kb) — every combination hit.
    val grid = spark.range(65536).select(
      (col("id") % 256).as("ka"), (col("id") / 256).cast("long").as("kb"))
    val zLaid = ZOrder.layout(grid, "ka", 255L, "kb", 255L, nFiles = 64)
    // Linear layout: sort by ka only, same file count, same file sizes.
    val linear = grid.withColumn("zfile",
      spark_partition_id().cast("long")) // placeholder, replaced below
    val linearLaid = grid
      .withColumn("zfile", (col("ka") * 256 + col("kb")).divide(lit(1024)).cast("long"))
    // ka-sorted files: predicate on ka prunes well, predicate on kb prunes NOTHING.
    val kaSortedLaid = grid
      .withColumn("zfile", col("ka").divide(lit(4)).cast("long")) // 256/4 = 64 files
    val zSkipA = ZOrder.skipFraction(zLaid, "ka", 17L)
    val zSkipB = ZOrder.skipFraction(zLaid, "kb", 201L)
    val linSkipA = ZOrder.skipFraction(kaSortedLaid, "ka", 17L)
    val linSkipB = ZOrder.skipFraction(kaSortedLaid, "kb", 201L)
    assert(linSkipA > 0.9, s"sanity: ka-sorted layout should prune ka scans, got $linSkipA")
    assert(linSkipB === 0.0, s"ka-sorted layout cannot prune kb scans, got $linSkipB")
    assert(zSkipA > 0.8, s"z-layout should prune most files on ka, got $zSkipA")
    assert(zSkipB > 0.8, s"z-layout should prune most files on kb, got $zSkipB")
  }

  test("scaleTo16 is exact across the whole admitted domain (integer div, no double rounding)") {
    // Near the 2^47 bound, (x * 65536) / (max+1) through a double is only
    // exact below ~2^37; the integer-div form must match BigInt math
    // everywhere. Corner values at and around the admitted maximum.
    val max = (1L << 47) - 1 // largest admitted maxInclusive
    val xs = Seq(0L, 1L, max / 3, max / 2, max - 1, max,
      (1L << 37) + 12345L, (1L << 40) - 1, (1L << 46) + 7L)
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
      .select(col("x"), ZOrder.scaleTo16(col("x"), max).as("s"))
    df.collect().foreach { r =>
      val x = r.getLong(0)
      val expected = ((BigInt(x) << 16) / (BigInt(max) + 1)).toLong & 0xFFFFL
      assert(r.getLong(1) === expected,
        s"scaleTo16($x, $max) = ${r.getLong(1)}, want $expected")
    }
    // Small-domain spread-up still lands on the full range endpoints.
    val small = spark.createDataFrame(Seq(Tuple1(0L), Tuple1(255L))).toDF("x")
      .select(ZOrder.scaleTo16(col("x"), 255L).as("s")).collect().map(_.getLong(0))
    assert(small.toSeq === Seq(0L, 65280L)) // 255 * 256
  }

  test("layout rejects a non-power-of-two file count loudly") {
    val g = spark.range(10).select(col("id").as("ka"), col("id").as("kb"))
    val e = intercept[IllegalArgumentException] {
      ZOrder.layout(g, "ka", 9L, "kb", 9L, nFiles = 48)
    }
    assert(e.getMessage.contains("power of two"))
  }
}
