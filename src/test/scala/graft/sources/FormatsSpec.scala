package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source-format coverage beyond parquet: the engine reads the same tables
  * through every format Spark ships a native reader for, with identical
  * results. Per-format contracts that matter at scale:
  *
  *   - ORC: columnar with predicate pushdown — the filter must reach the
  *     scan (`PushedFilters`), same as parquet.
  *   - JSON lines: schema-on-read with an EXPLICIT schema (inference is a
  *     second full pass over 100 TB — never ship it); values round-trip.
  *   - CSV: header + explicit schema + timestamp format; the lossy format
  *     of record — the spec proves the typed round-trip anyway.
  *
  * All three writes reuse the partitioned-layout writer path (`spark.write`
  * family), so the format choice is orthogonal to layout control
  * (SinksSpec) and runtime filtering (RuntimeFilterSpec).
  */
class FormatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trip preserves values and pushes predicates into the scan") {
    val tmp    = Files.createTempDirectory("graft-orc").toString
    val orders = Tables.orders(spark, dir)
    orders.write.mode("overwrite").orc(s"$tmp/orders")

    val back = spark.read.orc(s"$tmp/orders")
    assert(back.schema == orders.schema)
    val filtered = back.filter($"o_totalprice" > 300000)
    val scan     = filtered.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("o_totalprice"), scan.take(600))
    assert(filtered.count() == orders.filter($"o_totalprice" > 300000).count())
    // exact value fidelity, not just counts
    val a = orders.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("JSON-lines round-trip with an explicit schema (no inference pass)") {
    val tmp    = Files.createTempDirectory("graft-json").toString
    val orders = Tables.orders(spark, dir)
    orders.write.mode("overwrite").json(s"$tmp/orders")

    val back = spark.read
      .schema(orders.schema) // explicit: schema inference is a full extra scan at scale
      .json(s"$tmp/orders")
    assert(back.count() == orders.count())
    val a = orders.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("CSV round-trip with header + explicit schema + timestamp format") {
    val tmp    = Files.createTempDirectory("graft-csv").toString
    val orders = Tables.orders(spark, dir)
    val tsFmt  = "yyyy-MM-dd HH:mm:ss"
    orders.write
      .mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .csv(s"$tmp/orders")

    val back = spark.read
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .schema(orders.schema)
      .csv(s"$tmp/orders")
    assert(back.count() == orders.count())
    val a = orders.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("schema DDL round-trips (the contract a catalog or config file carries)") {
    val orders = Tables.orders(spark, dir)
    val ddl    = orders.schema.toDDL
    assert(StructType.fromDDL(ddl) == orders.schema)
  }
}
