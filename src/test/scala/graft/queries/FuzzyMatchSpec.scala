package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q122 fuzzy entity matching — the FastSS deletion-neighborhood blocking
  * with the drop-position INTERVAL filter. The oracle proves value parity
  * at 3 SFs; these specs pin the losslessness claim the hash can't
  * articulate: the interval filter must keep EVERY true lev≤1 pair
  * (including the run-substitution class where the two sides' minimal
  * drop positions differ) while the exact verify stays the contract.
  * Ground truth here is brute-force all-pairs `levenshtein`.
  */
class FuzzyMatchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Textbook O(|a|·|b|) edit distance — the spec's independent referee. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Brute-force per-key lev≤1 match counts over a (key, name) set. */
  private def bruteForce(rows: Seq[(Long, String)]): Map[Long, Long] =
    (for {
      (ia, na) <- rows
      (ib, nb) <- rows
      if ia < ib && lev(na, nb) <= 1
    } yield ia).groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def runQ122(rows: Seq[(Long, String)]): Map[Long, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy-spec")
    graft.sources.SessionMemo.deleteOnExit(dir)
    rows.toDF("c_custkey", "c_name").write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    SparkEntry.queries("q122_fuzzy_names")(spark, dir.toString)
      .as[(Long, Long)].collect().toMap
  }

  test("interval filter is lossless on the adversarial run-substitution fixture") {
    // The min-position trap: "0007" reaches "007" by dropping ANY zero
    // (positions 1-3), "0067" only by dropping the '6' (position 3). A
    // min-position-equality filter would reject this true substitution
    // pair; the interval filter accepts it (overlap at 3). "ab"/"ba" is
    // the distance-2 mismatched-drop class the filter exists to reject.
    val rows = Seq(
      1L -> "0007", // lev("0007","0067") = 1 — intervals [1,3] vs [3,3]
      2L -> "0067",
      3L -> "xy", // lev("xy","yx") = 2 — shares sigs, intervals disjoint
      4L -> "yx",
      5L -> "abc", // insert/delete pair via the identity row
      6L -> "abcd",
      7L -> "same", // exact duplicate pair (distance 0)
      8L -> "same"
    )
    val got = runQ122(rows)
    assert(got == bruteForce(rows), s"q122 $got != brute force ${bruteForce(rows)}")
    assert(got.contains(1L), "run-substitution pair (0007, 0067) must survive the interval filter")
    assert(!got.contains(3L), "(xy, yx) is distance 2 and must not match")
  }

  test("q122 equals brute-force all-pairs lev<=1 on the sf0.001 customer table") {
    val dir = "/root/testdata/sf0.001"
    val names = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("q122_fuzzy_names")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == bruteForce(names))
  }
}
