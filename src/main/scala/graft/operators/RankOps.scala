package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable GLOBAL row numbering.
  *
  * The naive `row_number().over(Window.orderBy(...))` has an empty
  * partition spec: Spark funnels EVERY row through one task — the classic
  * scale-killer that works in a notebook and dies on the first real
  * corpus. The scalable form is the textbook two-phase rank:
  *
  *   1. `repartitionByRange` on the sort key — partition i holds keys ≤
  *      partition i+1's (a range exchange, the same shuffle a global sort
  *      pays), then number rows WITHIN each partition (parallel window,
  *      partitioned by `spark_partition_id()`).
  *   2. Per-partition counts — one row per partition, bounded by the
  *      partition count, NOT the data — collect to the driver, prefix-sum
  *      into offsets, and add back as a broadcast map literal.
  *
  * Global number = partition offset + local number. The ordering must be
  * TOTAL (callers append a unique tie-break column): range partitioning
  * may split equal keys across adjacent partitions, and only a total
  * order makes "concatenation of sorted partitions" a deterministic
  * global order.
  */
object RankOps {

  def globalRowNumber(
      df: DataFrame,
      order: Seq[Column],
      outCol: String = "rank",
      numPartitions: Option[Int] = None
  ): DataFrame = {
    val n = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    // localCheckpoint (eager) pins the range partitioning: repartitionByRange
    // SAMPLES its boundaries per job, so without materialization the count
    // job and the numbering job could see different partition assignments
    // and the offsets would be wrong. Checkpoint beats persist here on both
    // counts the review raised: (a) no CacheManager entry to leak — the
    // blocks are freed by the ContextCleaner when the frame goes
    // unreferenced, so repeated calls don't accumulate cached tables; and
    // (b) an executor loss between the count collect and the numbering job
    // FAILS the job loudly (checkpointed partitions can't be recomputed)
    // instead of silently re-sampling boundaries into wrong offsets. A
    // cluster run swaps in a reliable `checkpoint()` for fault tolerance.
    val ranged = df.repartitionByRange(n, order: _*).withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // phase 1: bounded driver state — one (pid, count) row per partition
    val counts = ranged.groupBy(col("_pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsetByPid = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offsetExpr = coalesce(
      element_at(
        map(offsetByPid.toSeq.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        col("_pid")),
      lit(0L))
    // phase 2: parallel per-partition numbering + offset
    ranged
      .withColumn("_local", row_number().over(Window.partitionBy(col("_pid")).orderBy(order: _*)))
      .withColumn(outCol, (col("_local") + offsetExpr).cast("long"))
      .drop("_pid", "_local")
  }

  /** Scalable GLOBAL inclusive running sums — the prefix-sum twin of
    * [[globalRowNumber]], same two-phase shape: range partition on the
    * order keys (localCheckpoint pins the sampled boundaries), per-
    * partition TOTALS of each sum column collected to the driver (bounded
    * by the partition count, not the data), prefix-summed into per-
    * partition offsets, then a parallel per-partition running-sum window
    * plus the broadcast offset. Never a single-task empty-partition
    * window.
    *
    * Contract: `sumCols` must be LongType (exact integer prefix sums —
    * double accumulation would make the result order-dependent), and
    * `order` must be a TOTAL order over the rows (the default window
    * frame is RANGE-to-current, so duplicate keys would each absorb all
    * their ties; callers cumulating per-key aggregates — one row per key
    * — satisfy this by construction). Output adds `cum_<col>` per sum
    * column.
    */
  def globalRunningSums(
      df: DataFrame,
      order: Seq[Column],
      sumCols: Seq[String],
      numPartitions: Option[Int] = None
  ): DataFrame = {
    require(sumCols.nonEmpty, "need at least one column to cumulate")
    val n = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(n, order: _*).withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val aggCols = sumCols.map(c => sum(col(c)).as(c))
    // phase 1: bounded driver state — one totals row per partition
    val totals = ranged.groupBy(col("_pid")).agg(aggCols.head, aggCols.tail: _*).collect()
      .map(r => r.getInt(0) ->
        sumCols.indices.map(i => if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)).toSeq)
      .sortBy(_._1)
    val zero = sumCols.map(_ => 0L)
    val prefixes = totals.map(_._2).scanLeft(zero)((acc, v) => acc.zip(v).map { case (a, b) => a + b })
    val offsetByPid: Map[Int, Seq[Long]] = totals.map(_._1).zip(prefixes).toMap
    // phase 2: parallel per-partition running sums + offsets
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val withCums = sumCols.zipWithIndex.foldLeft(ranged) { case (d, (c, i)) =>
      val offsetExpr = coalesce(
        element_at(
          map(offsetByPid.toSeq.flatMap { case (p, os) => Seq(lit(p), lit(os(i))) }: _*),
          col("_pid")),
        lit(0L))
      d.withColumn(s"cum_$c", sum(col(c)).over(w) + offsetExpr)
    }
    withCums.drop("_pid")
  }
}
