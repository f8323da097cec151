package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The loud fixture-drift gate: every typed loader must fail AT PLAN TIME with
  * the offending column NAMED when the driver regenerates a fixture with a
  * retyped or missing column (rounds 7-8 were lost to exactly this: events.ts
  * silently moved int64 -> timestamp[us]). These tests synthesize the drift by
  * rewriting a real sf0.001 table with one column altered.
  */
class TablesSpec extends SparkTestBase {

  private def rewrite(name: String, mutate: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("graft_drift_").toString
    mutate(spark.read.parquet(s"$sf0001/$name.parquet"))
      .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  test("all ten corpus loaders pass the gate on the shipped fixtures") {
    Tables.lineitem(spark, sf0001); Tables.orders(spark, sf0001)
    Tables.customer(spark, sf0001); Tables.supplier(spark, sf0001)
    Tables.nation(spark, sf0001);   Tables.region(spark, sf0001)
    Tables.part(spark, sf0001);     Tables.events(spark, sf0001)
    Tables.documents(spark, sf0001); Tables.embeddings(spark, sf0001)
  }

  test("retyped lineitem.l_extendedprice (double -> decimal) fails naming the column") {
    val dir = rewrite("lineitem",
      _.withColumn("l_extendedprice", col("l_extendedprice").cast("decimal(12,2)")))
    val e = intercept[IllegalStateException] { Tables.lineitem(spark, dir) }
    assert(e.getMessage.contains("l_extendedprice"))
    assert(e.getMessage.contains("lineitem"))
  }

  test("missing orders.o_orderpriority fails with MISSING naming the column") {
    val dir = rewrite("orders", _.drop("o_orderpriority"))
    val e = intercept[IllegalStateException] { Tables.orders(spark, dir) }
    assert(e.getMessage.contains("o_orderpriority: MISSING"))
  }

  test("retyped customer.c_acctbal (double -> string) fails naming the column") {
    val dir = rewrite("customer", _.withColumn("c_acctbal", col("c_acctbal").cast("string")))
    val e = intercept[IllegalStateException] { Tables.customer(spark, dir) }
    assert(e.getMessage.contains("c_acctbal"))
  }

  test("retyped events.ts to string fails; epoch-long and timestamp both pass") {
    val bad = rewrite("events", _.withColumn("ts", col("ts").cast("string")))
    val e = intercept[IllegalStateException] { Tables.events(spark, bad) }
    assert(e.getMessage.contains("ts"))
    // the two dtypes the storage layer has actually shipped must both load
    val asLong = rewrite("events",
      _.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))) // epoch nanos
    assert(Tables.events(spark, asLong).count() > 0)
    assert(Tables.events(spark, sf0001).count() > 0)
  }

  test("retyped part.p_size and supplier/nation/region key drift fail loudly") {
    val p = rewrite("part", _.withColumn("p_size", col("p_size").cast("double")))
    assert(intercept[IllegalStateException] { Tables.part(spark, p) }
      .getMessage.contains("p_size"))
    val s = rewrite("supplier", _.drop("s_acctbal"))
    assert(intercept[IllegalStateException] { Tables.supplier(spark, s) }
      .getMessage.contains("s_acctbal: MISSING"))
    val n = rewrite("nation", _.withColumn("n_regionkey", col("n_regionkey").cast("string")))
    assert(intercept[IllegalStateException] { Tables.nation(spark, n) }
      .getMessage.contains("n_regionkey"))
    val r = rewrite("region", _.drop("r_name"))
    assert(intercept[IllegalStateException] { Tables.region(spark, r) }
      .getMessage.contains("r_name: MISSING"))
  }

  test("documents.n_chars and embeddings.label are gated too") {
    val d = rewrite("documents", _.withColumn("n_chars", col("n_chars").cast("string")))
    assert(intercept[IllegalStateException] { Tables.documents(spark, d) }
      .getMessage.contains("n_chars"))
    val emb = rewrite("embeddings", _.drop("label"))
    assert(intercept[IllegalStateException] { Tables.embeddings(spark, emb) }
      .getMessage.contains("label: MISSING"))
  }
}
