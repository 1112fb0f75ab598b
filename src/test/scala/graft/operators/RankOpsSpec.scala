package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RankOps contracts: both two-phase operators must reproduce their
  * single-partition window equivalents EXACTLY — the whole point of the
  * two-phase shape is that only the physical plan changes, never a value.
  * Data is deliberately laid out unsorted and across many partitions so a
  * broken offset map or an unpinned range partitioning cannot pass by
  * accident.
  */
class RankOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("globalRunningSums equals the single-partition running sum, exactly") {
    // keys shuffled, values signed, multiple partitions, two sum columns
    val rows = (1L to 500L).map(k => (k, k % 7 - 3, k * 1000))
    val df = spark.createDataset(scala.util.Random.shuffle(rows))
      .toDF("k", "a", "b")
      .repartition(13)
    val got = RankOps
      .globalRunningSums(df, Seq(col("k")), Seq("a", "b"), numPartitions = Some(8))
      .select(col("k"), col("cum_a"), col("cum_b"))
      .as[(Long, Long, Long)]
      .collect()
      .sortBy(_._1)
    // oracle: plain prefix sums in key order
    var (ca, cb) = (0L, 0L)
    val want = rows.sortBy(_._1).map { case (k, a, b) => ca += a; cb += b; (k, ca, cb) }
    assert(got.toSeq == want)
  }

  test("globalRunningSums with one partition and with empty input") {
    val one = RankOps
      .globalRunningSums(Seq((5L, 2L)).toDF("k", "v"), Seq(col("k")), Seq("v"),
        numPartitions = Some(1))
      .select(col("cum_v")).as[Long].collect()
    assert(one.toSeq == Seq(2L))
    val empty = RankOps
      .globalRunningSums(Seq.empty[(Long, Long)].toDF("k", "v"), Seq(col("k")), Seq("v"))
      .count()
    assert(empty == 0L)
  }
}
