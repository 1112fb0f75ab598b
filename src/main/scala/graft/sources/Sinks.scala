package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch write-side layout control — where 100 TB pipelines win or lose:
  *
  *   - [[writePartitioned]]: hive-style directory partitioning on a
  *     low-cardinality column → downstream reads with a partition predicate
  *     scan only matching directories (partition pruning).
  *   - [[writeBucketed]]: pre-shuffled bucketed tables on the join key →
  *     equal-bucket joins and aggregations run with NO exchange (the
  *     shuffle was paid once at write time, amortized over every
  *     subsequent query). The metastore records the bucketing, so Catalyst
  *     drops the Exchange automatically.
  *
  * Both are thin wrappers — the value is the documented, tested contract
  * (SinksSpec asserts the pruned scan and the exchange-free join plan).
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Write `df` as a bucketed+sorted managed table (requires a warehouse —
    * any SparkSession has one; production points it at the lake).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
