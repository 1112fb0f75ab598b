package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math — the codegen'd fast path
  * behind [[graft.functions.VectorFunctions]].
  *
  * Why custom expressions: the declarative `zip_with`+`aggregate` forms are
  * correct but higher-order lambdas are interpreted per element (no
  * whole-stage codegen), which dominates brute-force similarity scans. These
  * compile to a tight primitive loop inside WholeStageCodegen.
  *
  * Numeric contract (oracle parity): floats are widened to double BEFORE
  * multiplication and accumulated left-to-right — bit-identical to the HOF
  * fold and to DuckDB's `list_reduce`, so either implementation hash-matches
  * the driver's oracle. Array elements are assumed non-null (embedding
  * vectors).
  *
  * Length mismatch ⇒ NULL: `zip_with` null-pads the shorter side, which turns
  * the HOF fold into NULL — the native expressions reproduce that (rather
  * than silently dotting the common prefix), so [[graft.plans.AccelerateVectorOps]]
  * replacing one form with the other never changes results.
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  // NULL is produced for length-mismatched inputs even when both children
  // are non-nullable, so this must not inherit the children's nullability.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}"
      )
  }

  override def dataType: DataType = DoubleType

  // Element types may differ per side (e.g. float query vs double centroid).
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getL(a: ArrayData, i: Int): Double =
    if (isFloat(left)) a.getFloat(i).toDouble else a.getDouble(i)

  protected def getR(a: ArrayData, i: Int): Double =
    if (isFloat(right)) a.getFloat(i).toDouble else a.getDouble(i)

  /** Codegen accessors for element i of the left/right array variables. */
  protected def genGetL(v: String, i: String): String =
    if (isFloat(left)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"

  protected def genGetR(v: String, i: String): String =
    if (isFloat(right)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** `vector_dot(a, b)` — Σ aᵢ·bᵢ over min(len) elements. */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with null-pad parity
    var s = 0.0
    var i = 0
    while (i < n) { s += getL(x, i) * getR(y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value} += ${genGetL(a, i)} * ${genGetR(b, i)};
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

/** `vector_cosine(a, b)` — cos(a, b) in ONE pass (dot and both norms
  * accumulated in the same loop: 1 traversal instead of 3).
  */
case class VectorCosine(left: Expression, right: Expression) extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with null-pad parity
    var dot = 0.0
    var na  = 0.0
    var nb  = 0.0
    var i   = 0
    while (i < n) {
      val xv = getL(x, i); val yv = getR(y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val xv  = ctx.freshName("xv")
      val yv  = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = ${genGetL(a, i)};
         |    double $yv = ${genGetR(b, i)};
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_cosine"
}

/** SQL registration for the vector expressions — usable either through
  * `SparkSessionExtensions` (config
  * `spark.sql.extensions=graft.expressions.GraftExtensions`) or imperatively
  * via [[GraftFunctions.register]].
  */
object GraftFunctions {

  val registrations: Seq[
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)
  ] = Seq(
    (
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))
    ),
    (
      FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorCosine].getName, "vector_cosine"),
      (es: Seq[Expression]) => VectorCosine(es(0), es(1))
    )
  )

  /** Imperative registration on an existing session (makes the functions
    * callable from `spark.sql(...)`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Install the HOF→native acceleration rule on a live session (the
    * runtime-injection twin of [[GraftExtensions]]).
    */
  def installOptimizations(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(graft.plans.AccelerateVectorOps))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.AccelerateVectorOps
}

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.AccelerateVectorOps)
  }
}
