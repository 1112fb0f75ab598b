package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType` columns, built from higher-order
  * functions (`zip_with` + `aggregate`) so the fold order is the array order
  * — deterministic and exactly mirrored by DuckDB's `list_reduce` in the
  * driver's oracles. Floats are widened to double BEFORE any arithmetic, so
  * both engines accumulate identical IEEE values.
  *
  * Scale notes: for 100 TB brute-force scoring you would drop to a BLAS gemm
  * over `mapPartitions` batches (or a codegen'd `Expression`); these column
  * forms keep the logical plan declarative and are the correctness baseline
  * the fast path must reproduce.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Left-to-right dot product — deterministic accumulation order.
    * Declarative HOF form; [[dotFast]] is the codegen'd equivalent.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // Codegen'd native expressions (graft.expressions) — bit-identical results
  // to the HOF forms above (same widening, same accumulation order), but
  // compiled into the whole-stage-codegen loop instead of per-element
  // interpreted lambdas. Use these on hot paths.
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftInterop.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftInterop.expression(c)

  def dotFast(a: Column, b: Column): Column =
    toCol(graft.expressions.VectorDot(toExpr(a), toExpr(b)))

  def cosineFast(a: Column, b: Column): Column =
    toCol(graft.expressions.VectorCosine(toExpr(a), toExpr(b)))
}
