package graft

import graft.operators.PaymentOps
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` unions the per-domain registries; every oracle-checked entry
  * has identical column names and ORDER BY on both sides so the driver's
  * DuckDB hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline computation: per-account balance through
    * filter → FX → merge → grouped sum (PaymentTopology.java:39-98).
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("q09_balance")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ TpchQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ MediaQueries.queries ++
      EventQueries.queries ++ CurationQueries.queries ++ TemporalJoinQueries.queries ++
      StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ TpchQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++ MediaQueries.oracles ++
      EventQueries.oracles ++ CurationQueries.oracles ++ TemporalJoinQueries.oracles ++
      StreamQueries.oracles
}
