package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("stratified sample is seed-deterministic and roughly honors per-label fractions") {
    val q  = SparkEntry.queries("q63_stratified_sample")
    val s1 = q(spark, dir).as[(Long, Int)].collect().toSeq
    val s2 = q(spark, dir).as[(Long, Int)].collect().toSeq
    assert(s1 == s2, "same seed must give the identical sample")
    val perLabel = s1.groupBy(_._2).view.mapValues(_.size)
    // 10 labels × ~50 rows × 0.2 → expect ~10 per label; allow wide slack.
    perLabel.foreach { case (l, n) => assert(n >= 2 && n <= 25, s"label $l sampled $n rows") }
    assert(s1.size > 50 && s1.size < 150)
  }
}
