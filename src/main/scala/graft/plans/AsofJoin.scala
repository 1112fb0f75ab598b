package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  BindReferences,
  Expression,
  JoinedRow,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class plan node — rung (c) of the custom-operator
  * ladder (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), for the
  * one temporal operator Spark has no built-in for. The composed forms
  * (q80 range-join+struct-max, q82 union-window) express the same
  * semantics with existing operators; this node executes them as the
  * textbook SINGLE-PASS MERGE: both sides hash-partitioned on the key and
  * sorted (key, time), then each partition pair is merged with one cursor
  * per side — O(n+m) per partition, no (event × history) intermediate, no
  * window buffer.
  *
  * Semantics (inner join, both pandas-merge_asof directions):
  *   - BACKWARD (default): each left row joins the LATEST right row with
  *     the same key and `rightTime <= leftTime`; ties on time resolve to
  *     the greatest `rightTie` (the sort's last row wins — with the
  *     tie-break in the required ordering this is deterministic).
  *   - FORWARD: each left row joins the EARLIEST right row with the same
  *     key and `rightTime >= leftTime`; ties resolve to the LEAST
  *     `rightTie` (the sort's first row wins). A matched right row is NOT
  *     consumed — it remains the candidate for later left rows at the same
  *     key, so state is still the single right-cursor lookahead.
  *   - NEAREST: the closer of the backward and forward candidates by
  *     absolute time distance; an exact distance tie prefers the BACKWARD
  *     candidate (pandas parity). The merge already holds both candidates
  *     (the buffered backward best + the right-cursor head), so nearest
  *     adds one comparison, not a second pass.
  * Left rows with no matching right row are dropped when `leftOuter` is
  * false (inner — the q80/q105 contracts) and kept with a null-padded
  * right side when true (pandas merge_asof's own semantics — every left
  * row survives, q109). Outer mode marks the right-side output attributes
  * nullable so downstream resolution sees the truth.
  *
  * Scale shape: the planner's `EnsureRequirements` inserts the hash
  * exchanges and sorts from the DECLARED requirements below — the operator
  * itself never repartitions, so it composes with AQE, reused exchanges,
  * and bucketed inputs (pre-bucketed sides skip the shuffle entirely).
  * Execution is a streaming iterator per partition: state is ONE buffered
  * right row (the current best match) regardless of history length.
  *
  * Key and time expressions must evaluate to integral-comparable values
  * (long/int/short/byte; timestamps surface as micros, dates as days) —
  * the natural shape for keys and event time at scale; a production
  * generalization would swap the comparator, not the merge.
  */
sealed trait AsofDirection
object AsofDirection {
  case object Backward extends AsofDirection
  case object Forward  extends AsofDirection
  case object Nearest  extends AsofDirection
}

final case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression,
    tolerance: Option[Long] = None, // max |leftTime - rightTime|, in the time expressions' units
    direction: AsofDirection = AsofDirection.Backward,
    leftOuter: Boolean = false
) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofJoin =
    copy(left = l, right = r)
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]; inject via
  * `spark.experimental.extraStrategies` ([[AsofJoinOps.install]]) or a
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoin =>
      AsofJoinExec(
        j.leftKey, j.leftTime, j.rightKey, j.rightTime, j.rightTie, j.tolerance, j.direction,
        j.leftOuter, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression,
    tolerance: Option[Long],
    direction: AsofDirection,
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // co-partition both sides on the key: EnsureRequirements inserts
  // compatible hash exchanges (or none, if the input is already bucketed)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // merge order: (key, time) both sides; the tie-break makes "last row at
  // equal time" deterministic (ascending sort ⇒ last = greatest tie value)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending))
    )

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // java.lang.Long.MIN_VALUE is reserved as the null sentinel: a NULL key or
  // time follows JOIN SEMANTICS (the row can never match — dropped), it does
  // not fail the query the way a type error does
  private val NullSentinel = Long.MinValue

  /** Overflow-safe time distance for `a >= b` (guaranteed at every call
    * site by the merge's scan invariants). A plain `a - b` wraps negative
    * when the operands span more than 2^63 time units — unreachable for
    * real timestamps-as-micros, but the node accepts arbitrary integral
    * expressions — and a wrapped distance could spuriously satisfy a
    * tolerance bound or win a nearest comparison. Saturate to
    * Long.MaxValue instead: a saturated distance loses every bounded
    * comparison, and under an unbounded tolerance (tol = MaxValue, where
    * any distance qualifies by definition) still behaves correctly.
    */
  @inline private def dist(a: Long, b: Long): Long = {
    val d = a - b
    if (d < 0) Long.MaxValue else d
  }

  private def asLong(v: Any): Long = v match {
    case null                 => NullSentinel
    case l: java.lang.Long    => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short   => s.toLong
    case b: java.lang.Byte    => b.toLong
    case other =>
      throw new IllegalArgumentException(
        s"asof join key/time must be integral-comparable, got ${other.getClass}")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined     = new JoinedRow
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      new Iterator[InternalRow] {
        // single-row lookahead on the right, with its evaluated (key, time)
        private var rRow: InternalRow = null
        private var rKey              = 0L
        private var rTime             = 0L
        @scala.annotation.tailrec
        private def pullRight(): Boolean =
          if (rIter.hasNext) {
            val r = rIter.next()
            rKey = asLong(rk.eval(r))
            rTime = asLong(rt.eval(r))
            if (rKey == NullSentinel || rTime == NullSentinel) pullRight() // null never matches
            else { rRow = r; true }
          } else { rRow = null; false }
        private var rExhausted = !pullRight()

        // best match for the CURRENT left key: one buffered row, total state
        private var best: InternalRow = null
        private var bestKey           = 0L
        private var bestTime          = 0L
        private val tol               = tolerance.getOrElse(Long.MaxValue)

        private var out: InternalRow = null
        private var ready            = false

        private val forward = direction == AsofDirection.Forward
        private val nearest = direction == AsofDirection.Nearest
        // outer mode: unmatched left rows pad the right side with nulls
        private val nullRight =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(right.output.size)

        private def computeNext(): Unit = {
          out = null
          while (out == null && lIter.hasNext) {
            val l     = lIter.next()
            val lKey  = asLong(lk.eval(l))
            val lTime = asLong(lt.eval(l))
            // the matched right row for this left row, if any
            var m: InternalRow = null
            if (lKey == NullSentinel || lTime == NullSentinel) {
              // null key/time never matches (join semantics); outer still
              // keeps the left row below
            } else if (forward) {
              // advance past DEAD right rows: earlier keys, or same key
              // strictly before lTime — left times ascend, so a right row
              // behind this left row is behind every later one too
              var scan = !rExhausted
              while (scan) {
                if (rKey < lKey || (rKey == lKey && rTime < lTime)) {
                  if (!pullRight()) { rExhausted = true; scan = false }
                } else scan = false
              }
              // the head (first eligible row: earliest time, least tie) is
              // the match — NOT consumed, it may serve later left rows
              if (!rExhausted && rKey == lKey && dist(rTime, lTime) <= tol) m = rRow
            } else {
              if (best != null && bestKey != lKey) best = null
              var scan = !rExhausted
              while (scan) {
                if (rKey < lKey) {
                  // left is sorted ascending: no remaining left row can match
                  if (!pullRight()) { rExhausted = true; scan = false }
                } else if (rKey == lKey && rTime <= lTime) {
                  best = rRow.copy() // shuffle/sort readers reuse row objects
                  bestKey = lKey
                  bestTime = rTime
                  if (!pullRight()) { rExhausted = true; scan = false }
                } else scan = false // right is ahead of this left row
              }
              if (nearest) {
                // both candidates are in hand: the buffered backward best and
                // the cursor head (the first same-key row AFTER lTime — rows
                // AT lTime were consumed into best). Distance tie → backward.
                val db = if (best != null) dist(lTime, bestTime) else Long.MaxValue
                val df = if (!rExhausted && rKey == lKey) dist(rTime, lTime) else Long.MaxValue
                if (db <= df) { if (best != null && db <= tol) m = best }
                else if (df <= tol) m = rRow
              } else {
                // tolerance: the best (latest eligible) match is the only
                // candidate that could be in range
                if (best != null && dist(lTime, bestTime) <= tol) m = best
              }
            }
            if (m != null) out = resultProj(joined(l, m))
            else if (leftOuter) out = resultProj(joined(l, nullRight))
            // else inner: unmatched left row is dropped
          }
        }

        override def hasNext: Boolean = {
          if (!ready) { computeNext(); ready = true }
          out != null
        }
        override def next(): InternalRow = {
          if (!ready) computeNext()
          ready = false
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofJoinExec =
    copy(left = l, right = r)
}

/** Public API: `AsofJoinOps.asof(events, orders, ...)`. Columns must come
  * from the respective frames (`left.col(...)` / `right.col(...)`) so the
  * node is built fully resolved.
  */
object AsofJoinOps {

  /** Idempotently add [[AsofJoinStrategy]] to the session's planner. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** @param tolerance max `leftTime - rightTime` (backward) or
    *        `rightTime - leftTime` (forward) for a match, in the SAME
    *        UNITS as the time expressions (micros for timestamp columns) —
    *        the pandas-merge_asof/Flink-interval bound; None = unbounded
    *        search.
    * @param direction Backward (latest right at-or-before, default),
    *        Forward (earliest right at-or-after), or Nearest (closer of
    *        the two, distance ties backward) — merge_asof parity.
    * @param leftOuter keep unmatched left rows with a null-padded right
    *        side (pandas merge_asof's own join type); false = inner.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      leftTime: Column,
      rightKey: Column,
      rightTime: Column,
      rightTie: Column,
      tolerance: Option[Long] = None,
      direction: AsofDirection = AsofDirection.Backward,
      leftOuter: Boolean = false
  ): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // Self-joins over shared lineage would put DUPLICATE expression ids in
    // the node's output: the analyzer's DeduplicateRelations rewrites only
    // built-in Join nodes, so downstream binding would silently read
    // left-side ordinals for right-side attributes. Fail fast instead —
    // the caller disambiguates with select(...as...) aliases (fresh ids).
    val dup = left.queryExecution.analyzed.outputSet.intersect(right.queryExecution.analyzed.outputSet)
    require(
      dup.isEmpty,
      s"asof: left and right share attributes ${dup.toSeq.mkString(", ")} — self-joins over " +
        "shared lineage are not supported; re-alias one side's columns (select(col(...).as(...)))"
    )
    val toExpr = org.apache.spark.sql.graft.GraftDatasetBridge.expr _
    org.apache.spark.sql.graft.GraftDatasetBridge.ofRows(
      spark,
      AsofJoin(
        left.queryExecution.analyzed,
        right.queryExecution.analyzed,
        toExpr(leftKey),
        toExpr(leftTime),
        toExpr(rightKey),
        toExpr(rightTime),
        toExpr(rightTie),
        tolerance,
        direction,
        leftOuter
      )
    )
  }
}
