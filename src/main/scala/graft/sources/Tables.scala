package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loading for the driver's synthetic TPC-H-ish corpus
  * (`/root/testdata/sf{N}/<name>.parquet`, see TESTDATA.md) — the batch twin of
  * the reference's Kafka source (O1, `PaymentTopology.java:41-42`).
  *
  * Scale notes: plain `spark.read.parquet` so Catalyst drives column pruning
  * and predicate pushdown into the scan; at cluster scale the same call reads
  * a partitioned directory tree, and `spark.sql.files.maxPartitionBytes`
  * controls split sizing. No schema inference cost — parquet carries its
  * schema.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy conf) and
    * floor-convert to a microsecond TimestampType — the same truncation
    * DuckDB applies when it reads TIMESTAMP_NS, so oracle results agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
}
