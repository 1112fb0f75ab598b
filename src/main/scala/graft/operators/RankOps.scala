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
}
