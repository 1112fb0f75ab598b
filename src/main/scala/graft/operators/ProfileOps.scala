package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE-PASS COLUMN PROFILING — the table-health report every ingestion
  * pipeline runs before training-data work (the Deequ/`ANALYZE`-style
  * summary): per column, row count, null count, EXACT distinct count,
  * lexicographic min/max, and total value length.
  *
  * Scale shape: the table melts into (column, stringified value) rows in
  * one narrow projection (explode of a per-row struct array — no shuffle),
  * then a SINGLE two-phase aggregation tree computes everything: a partial
  * count per (column, value) — which is exactly the map-side combine an
  * exact distinct needs — feeds a per-column rollup of counts, null mass,
  * distinct cardinality, and min/max. One scan, two exchanges (both keyed,
  * both partial-aggregated), regardless of how many columns are profiled;
  * a 100-column profile costs one 100× row fan-out, not 100 scans.
  *
  * Values are compared/min-maxed as STRINGS (deterministic across engines
  * for the ASCII corpus; numeric columns rank lexicographically — the
  * contract is "a profile", not per-type ordering).
  */
object ProfileOps {

  /** Profile the given columns of `df`. Output: one row per column —
    * (column_name, n_rows, n_null, n_distinct, min_v, max_v, total_len),
    * ordered by column name.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val melted = df
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("v"))
      }: _*)).as("kv"))
      .select(col("kv.column_name").as("column_name"), col("kv.v").as("v"))
    melted
      .groupBy(col("column_name"), col("v"))
      .agg(count(lit(1)).as("cnt"), sum(length(col("v"))).as("len"))
      .groupBy(col("column_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(col("v").isNull, col("cnt")).otherwise(lit(0L))).as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        coalesce(sum(col("len")), lit(0L)).as("total_len"))
      .orderBy(col("column_name"))
  }
}
