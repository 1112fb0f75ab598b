package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *   - [[writeZOrdered]]: MULTI-DIMENSIONAL clustering via a Morton
  *     (Z-order) key — range-partition + sort on the bit-interleaving of
  *     two columns, so every output file covers a small rectangle in BOTH
  *     dimensions and file/row-group min-max stats prune selective
  *     predicates on EITHER column (a linear sort clusters only its
  *     leading column). The Delta/Iceberg OPTIMIZE ZORDER technique,
  *     expressed with stock Spark operators.
  *
  * All are thin wrappers — the value is the documented, tested contract
  * (SinksSpec asserts the pruned scan, the exchange-free join plan, and
  * the measured file-skipping win of the Z-order layout).
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

  /** SMALL-FILE COMPACTION — the operational rewrite every long-lived
    * table needs: streaming sinks and fine-grained partitions accumulate
    * files far below the row-group sweet spot, and scan parallelism
    * degrades into per-file task overhead while the driver chokes on file
    * listings. Rewrites `path` into `ceil(totalBytes / targetFileBytes)`
    * files via a round-robin repartition (not coalesce: coalesce merges
    * without a shuffle and would inherit the skew of the input files).
    * Returns (filesBefore, filesAfter).
    *
    * Operates on ONE FLAT LEAF DIRECTORY and refuses a hive-partitioned
    * root (compacting the root would rewrite every partition's rows —
    * partition column inlined — into unpartitioned files NEXT TO the
    * untouched `k=v` directories: duplicate data and a broken layout).
    * Run it per leaf directory instead.
    *
    * Crash behavior (a plain filesystem has no atomic multi-file swap):
    * the rewrite lands in a `.compact-tmp` sibling first, and originals
    * move to a `.compact-trash` sibling BEFORE the new files move in — a
    * crash at any point leaves every original byte recoverable from one
    * of the two siblings; only the final step deletes the trash. A table
    * format with a transaction log does this swap as a metadata commit.
    *
    * RERUN SAFETY: a leftover `.compact-tmp` or `.compact-trash` sibling
    * means a previous run died mid-swap and some original rows may live
    * ONLY in those siblings. Re-compacting over that state would compact
    * just the surviving files and then delete the trash — silently
    * destroying the stranded rows. So entry REFUSES while either sibling
    * exists: an operator must inspect and restore (move trash files back,
    * remove the siblings) before compaction runs again.
    */
  def compactFiles(spark: SparkSession, path: String, targetFileBytes: Long): (Int, Int) = {
    val dir = new java.io.File(path)
    require(dir.isDirectory, s"$path is not a directory — nothing to compact")
    val tmp   = new java.io.File(path.stripSuffix("/") + ".compact-tmp")
    val trash = new java.io.File(path.stripSuffix("/") + ".compact-trash")
    require(
      !tmp.exists() && !trash.exists(),
      s"found leftover ${tmp.getName} or ${trash.getName} from an interrupted compaction — " +
        "recover those files (originals may exist ONLY there) and remove the siblings before rerunning")
    require(
      dir.listFiles().forall(!_.isDirectory),
      s"$path contains subdirectories — compact each hive-partition leaf directory, not the root")
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      d.listFiles((_, n) => n.endsWith(".parquet"))
    val before = parquetFiles(dir)
    require(before.nonEmpty, s"$path holds no parquet files to compact")
    val total = before.map(_.length).sum
    val n     = math.max(1, ((total + targetFileBytes - 1) / targetFileBytes).toInt)
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(tmp.toString)
    trash.mkdirs()
    def moveInto(f: java.io.File, d: java.io.File): Unit =
      java.nio.file.Files.move(f.toPath, new java.io.File(d, f.getName).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // originals out of the way first (with their LocalFileSystem .crc
    // sidecars — leaving them orphaned would re-grow the listing forever)
    before.foreach { f =>
      val crc = new java.io.File(dir, "." + f.getName + ".crc")
      if (crc.exists()) crc.delete()
      moveInto(f, trash)
    }
    tmp.listFiles().foreach(moveInto(_, dir))
    tmp.delete()
    trash.listFiles().foreach(_.delete())
    trash.delete()
    (before.length, parquetFiles(dir).length)
  }

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative long columns (a in the even positions, b in the odd) —
    * a pure bit-op column expression, fully codegen'd. Callers normalize
    * skewed domains first (e.g. rank or bucketize); 21 bits per dimension
    * fills a positive long.
    */
  def zorderKey(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "1..31 interleaved bits per dimension")
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce(_.bitwiseOR(_))
  }

  /** Write `df` clustered on the Z-order of (`colA`, `colB`): range
    * partition into `numFiles` contiguous Z-ranges (one task → one file),
    * sort within each. Every file then spans a bounded rectangle in the
    * (a, b) space instead of a full-width stripe, which is what makes
    * min-max file skipping effective on both columns at once.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int,
      bits: Int = 21
  ): Unit = {
    require(!df.columns.contains("_zkey"), "input already has a _zkey column — rename it first")
    df.withColumn("_zkey", zorderKey(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write
      .mode("overwrite")
      .parquet(path)
  }
}
