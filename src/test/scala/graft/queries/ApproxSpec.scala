package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate analytics — sketches are engine-private (no DuckDB oracle
  * possible), so the contract is error-bounded agreement with the exact
  * answer, asserted here on real data. At 100 TB these replace their exact
  * twins: HLL for distinct counts (no giant hash set), KLL/GK quantiles
  * (no full sort).
  */
class ApproxSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact, deterministic across runs") {
    val e = Tables.orders(spark, dir)
    def run() = e
      .agg(
        approx_count_distinct(col("o_custkey"), 0.01).as("approx"),
        countDistinct(col("o_custkey")).as("exact")
      )
      .as[(Long, Long)]
      .head()
    val (approx, exact) = run()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
    assert(run() == ((approx, exact)), "HLL merge is commutative -> deterministic result")
  }

  test("q59 per-lang approx distinct tokens within 5% of exact, deterministic") {
    val exact = Tables
      .documents(spark, dir)
      .select(col("lang"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("exact"))
      .as[(String, Long)]
      .collect()
      .toMap
    def run() = graft.SparkEntry
      .queries("q59_approx_distinct")(spark, dir)
      .select(col("lang"), col("approx_distinct_tokens"))
      .as[(String, Long)]
      .collect()
      .toMap
    val approx = run()
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (lang, a) =>
      val e = exact(lang)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$lang: approx=$a exact=$e")
    }
    assert(run() == approx, "sketch merge is commutative -> deterministic result")
  }

  test("q126 portable HLL estimate lands within the sketch's error bound of the exact count") {
    // 64 registers -> standard error 1.04/sqrt(64) = 13%; assert 3 sigma
    import org.apache.spark.sql.functions.{col, countDistinct, explode}
    val dir = "/root/testdata/sf0.01"
    val est = graft.SparkEntry
      .queries("q126_hll_registers")(spark, dir)
      .select(col("lang"), col("hll_estimate"))
      .distinct()
      .as[(String, Double)]
      .collect()
      .toMap
    val exact = graft.sources.Tables
      .documents(spark, dir)
      .select(col("lang"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("n"))
      .as[(String, Long)]
      .collect()
      .toMap
    assert(est.keySet == exact.keySet)
    for ((lang, e) <- est) {
      val n = exact(lang).toDouble
      assert(math.abs(e - n) / n < 0.39, s"$lang: estimate $e vs exact $n exceeds 3x the 13% bound")
    }
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val exact = Tables
      .events(spark, dir)
      .agg(expr("percentile(value, 0.5)").as("p"))
      .as[Double]
      .head()
    val approx = Tables
      .events(spark, dir)
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("p"))
      .as[Double]
      .head()
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
