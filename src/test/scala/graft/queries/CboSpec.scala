package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization: table/column statistics (ANALYZE) feeding
  * Catalyst's CBO — the mechanism that picks join orders at 100 TB, where
  * a human-ordered join chain written against yesterday's cardinalities is
  * wrong tomorrow. Proves (a) ANALYZE statistics are visible to the
  * optimizer as exact row counts, and (b) with CBO + join reorder enabled
  * the DP reorderer rewrites a deliberately bad syntactic join order
  * (fact ⋈ fact first, tiny dim last) into one that reduces through the
  * small relation earlier.
  */
class CboSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Each test builds (and tears down) its own analyzed tables, so the
    * suite has no inter-test order dependency and a failed run cannot
    * leave stale tables whose stats poison the next run.
    */
  private def withAnalyzedTables[T](body: => T): T = {
    for (t <- Seq("cbo_li", "cbo_ord", "cbo_cust")) spark.sql(s"DROP TABLE IF EXISTS $t")
    Tables.lineitem(spark, dir).write.mode("overwrite").saveAsTable("cbo_li")
    Tables.orders(spark, dir).write.mode("overwrite").saveAsTable("cbo_ord")
    Tables.customer(spark, dir).write.mode("overwrite").saveAsTable("cbo_cust")
    for (t <- Seq("cbo_li", "cbo_ord", "cbo_cust"))
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    try body
    finally for (t <- Seq("cbo_li", "cbo_ord", "cbo_cust")) spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("ANALYZE statistics surface exact row counts to the optimizer") {
    withAnalyzedTables {
      withConf("spark.sql.cbo.enabled" -> "true") {
        val expected = Tables.lineitem(spark, dir).count()
        val stats    = spark.table("cbo_li").queryExecution.optimizedPlan.stats
        assert(stats.rowCount.contains(BigInt(expected)),
          s"ANALYZE row count should reach the plan: got ${stats.rowCount}")
      }
    }
  }

  test("CBO join reorder rewrites a bad syntactic order to reduce through the small side first") {
    withAnalyzedTables {
    // syntactically: (lineitem ⋈ orders) first — the two largest tables —
    // with the tiny filtered customer set joined LAST
    def query = spark
      .table("cbo_li")
      .join(spark.table("cbo_ord"), col("l_orderkey") === col("o_orderkey"))
      .join(
        spark.table("cbo_cust").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(sum(col("l_quantity")).as("qty"))

    // deepest (first-executed) join's table names, from the optimized tree
    def deepestJoinTables: Set[String] = {
      val joins     = query.queryExecution.optimizedPlan.collect { case j: Join => j }
      val innermost = joins.last // collect is pre-order: last = deepest
      Set("cbo_li", "cbo_ord", "cbo_cust").filter(t => innermost.toString.contains(t))
    }

    val without = withConf(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.joinReorder.enabled" -> "false")(deepestJoinTables)
    val withCbo = withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true")(deepestJoinTables)

    assert(without == Set("cbo_li", "cbo_ord"),
      s"syntactic order should join the two facts first, got $without")
    assert(withCbo.contains("cbo_cust"),
      s"CBO should pull the tiny filtered dim into the first join, got $withCbo")

    // and reordering never changes results
    val r1 = withConf("spark.sql.cbo.enabled" -> "false", "spark.sql.cbo.joinReorder.enabled" -> "false")(
      query.orderBy(col("c_custkey")).collect().toSeq)
    val r2 = withConf("spark.sql.cbo.enabled" -> "true", "spark.sql.cbo.joinReorder.enabled" -> "true")(
      query.orderBy(col("c_custkey")).collect().toSeq)
    assert(r1 == r2)
    }
  }
}
