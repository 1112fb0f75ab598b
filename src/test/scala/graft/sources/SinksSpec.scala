package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SinksSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("partitioned write enables partition pruning on read") {
    val tmp = Files.createTempDirectory("graft-part").toString
    val df  = Tables.orders(spark, "/root/testdata/sf0.001")
    Sinks.writePartitioned(df, s"$tmp/orders", Seq("o_orderstatus"))

    val pruned = spark.read.parquet(s"$tmp/orders").filter($"o_orderstatus" === "F")
    val scan   = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    // the status predicate must appear as a PartitionFilter, not a data filter
    assert(scan.contains("PartitionFilters") && scan.contains("o_orderstatus"), scan.take(600))
    assert(pruned.count() == df.filter($"o_orderstatus" === "F").count())
  }

  test("bucketed tables join without an exchange (write-time shuffle amortized)") {
    // clean any stale table locations from prior (possibly aborted) runs
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val li     = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Sinks.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Sinks.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4)

    // disable auto-broadcast so the join exercises the bucketed layout
    // (at real scale neither side broadcasts — that is the point)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = Sinks
          .readTable(spark, "orders_b")
          .join(Sinks.readTable(spark, "lineitem_b"), "o_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(600))
        assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan.take(800))
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // and the join is still correct
    val expected = orders
      .join(li, orders("o_orderkey") === li("l_orderkey"))
      .count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
