package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed INTERVAL-OVERLAP JOIN — the join family Spark has no native
  * operator for (an `a.start <= b.end AND b.start <= a.end` predicate alone
  * plans as a nested-loop over the full cross product).
  *
  * The scale shape is bucket blocking: each interval explodes into the
  * fixed-width buckets it covers, candidates come from an EQUI join on the
  * bucket id, and each truly-overlapping pair is kept EXACTLY ONCE — in the
  * bucket containing the overlap's start (`floor(max(starts)/width)`, which
  * both sides necessarily cover) — so no `distinct` re-shuffle is needed.
  * Work is Σ per-bucket products instead of |L|·|R|, and the bucket key
  * hash-partitions across the cluster like any equi join (a skewed bucket
  * splits further under AQE skew handling).
  *
  * `width` trades fan-out for bucket selectivity: ~the typical interval
  * length keeps the per-row explode factor ≈ 2 while buckets stay tight.
  * Intervals are CLOSED ([start, end], integer endpoints — days, not
  * timestamps, in the registered queries).
  *
  * KNOW WHEN NOT TO USE IT: the pair stream is output-bound (both sides
  * growing k× grows true pairs ~k²×). When the consumer is an AGGREGATE,
  * the pair-free sweep formulations reproduce the same results from
  * cumulative day series instead (q146/q147 in TemporalJoinQueries,
  * built on `RankOps.globalRunningSums`) — flat where this join pays the
  * quadratic. Use `overlapJoin` when the consumer actually needs pairs.
  */
object IntervalOps {

  /** Overlapping (left, right) row pairs, each exactly once. Both inputs
    * must carry integer (castable-to-long) start/end columns named by the
    * caller; all input columns ride through to the output.
    */
  def overlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      width: Long
  ): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    // fail loudly up front instead of deep inside Catalyst: shared column
    // names across the two sides make the post-join overlap filter
    // ambiguous, and a pre-existing _bucket column corrupts the join key
    val shared = left.columns.toSet intersect right.columns.toSet
    require(shared.isEmpty, s"left/right share column names $shared — alias one side first")
    require(!(left.columns ++ right.columns).contains("_bucket"),
      "inputs must not carry a _bucket column (internal join key)")
    // floor(x / width) computed entirely in the INTEGER domain: Spark's
    // `/` on longs divides in DOUBLE, which silently loses the bucket id
    // (and the exactly-once dedup bucket) for |endpoint| beyond 2^53.
    // `x - pmod(x, w)` is an exact multiple of w (pmod is non-negative),
    // so integral `div` equals floor division at every long magnitude —
    // exact up to |endpoint| ≤ Long.MaxValue − width (the pmod subtraction
    // cannot underflow before that bound).
    def floorDivSql(x: String): String =
      s"(CAST($x AS BIGINT) - pmod(CAST($x AS BIGINT), ${width}L)) div ${width}L"
    def buckets(df: DataFrame, s: String, e: String): DataFrame = {
      // closed intervals: an interval covers floor(s/w)..floor(e/w); an
      // empty/inverted interval (e < s) covers nothing and drops here,
      // matching the overlap predicate which can never hold for it
      df.filter(col(e) >= col(s))
        .withColumn("_bucket", explode(sequence(expr(floorDivSql(s)), expr(floorDivSql(e)))))
    }
    buckets(left, lStart, lEnd)
      .join(buckets(right, rStart, rEnd), Seq("_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)) // true overlap
      // exactly-once: only the bucket holding the overlap start reports
      .filter(col("_bucket") === expr(floorDivSql(s"greatest($lStart, $rStart)")))
      .drop("_bucket")
  }
}
