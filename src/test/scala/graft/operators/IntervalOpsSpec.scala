package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The bucketed overlap join must agree with the brute-force predicate on
  * every pair EXACTLY once — the dedup-at-overlap-start rule is where a
  * bucketing bug silently double-counts (a pair spanning k shared buckets
  * appears k times without it).
  */
class IntervalOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def brute(
      l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (lid, ls, le) <- l
      (rid, rs, re) <- r
      if ls <= re && rs <= le && le >= ls && re >= rs
    } yield (lid, rid)).toSet

  private def viaOp(
      l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)], width: Long): Seq[(Long, Long)] =
    IntervalOps
      .overlapJoin(
        l.toDF("lid", "ls", "le"), "ls", "le",
        r.toDF("rid", "rs", "re"), "rs", "re", width)
      .select(col("lid"), col("rid"))
      .as[(Long, Long)]
      .collect()
      .toSeq

  test("agrees with brute force, each pair exactly once, across widths") {
    // long intervals spanning many buckets, touching endpoints, containment,
    // single-point intervals, disjoint tails — a mix that hits every branch
    val l = Seq(
      (1L, 0L, 100L), (2L, 50L, 60L), (3L, 200L, 200L), (4L, 90L, 260L), (5L, 400L, 410L))
    val r = Seq(
      (10L, 100L, 120L), (11L, 55L, 58L), (12L, 0L, 500L), (13L, 201L, 300L), (14L, 350L, 399L))
    val want = brute(l, r)
    for (width <- Seq(1L, 7L, 32L, 1000L)) {
      val got = viaOp(l, r, width)
      assert(got.size == got.toSet.size, s"width=$width produced duplicate pairs")
      assert(got.toSet == want, s"width=$width: got ${got.toSet -- want} extra, ${want -- got.toSet} missing")
    }
  }

  test("inverted and negative-coordinate intervals") {
    // negative starts exercise floor division below zero; the inverted
    // interval (20, 10) matches nothing
    val l = Seq((1L, -50L, -10L), (2L, 20L, 10L), (3L, -5L, 5L))
    val r = Seq((10L, -20L, -15L), (11L, 0L, 0L), (12L, 9L, 30L))
    val want = brute(l.filter(t => t._3 >= t._2), r)
    for (width <- Seq(3L, 32L)) {
      val got = viaOp(l, r, width)
      assert(got.toSet == want && got.size == want.size, s"width=$width: $got vs $want")
    }
  }
}
