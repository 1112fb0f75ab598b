package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens + stopword stats") {
    val df = one("the quick fox of   doom")
      .select(
        tokenCount($"text").as("n"),
        stopwordCount($"text").as("s"),
        round(stopwordRatio($"text"), 2).as("r")
      )
    assert(df.as[(Int, Int, Double)].head() == ((5, 2, 0.4)))
  }

  test("langId: stopword-rich -> en, stopword-free -> und, empty-safe") {
    val df = Seq("the cat sat on the mat", "zorp blarg quux", "").toDF("text")
      .select(langId($"text").as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "und", "und"))
  }

  test("rollingFingerprint matches the hand-computed Karp-Rabin value") {
    // "ab": ((0*31+97)%M)*31+98 = 97*31+98 = 3105
    assert(one("ab").select(rollingFingerprint($"text")).as[Long].head() == 3105L)
  }

  test("shingles: 3-grams in order; short docs -> empty") {
    val sh = one("a b c d").select(shingles($"text").as("s")).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    assert(one("a b").select(shingles($"text").as("s")).as[Seq[String]].head().isEmpty)
  }

  test("qualityScore is in [0,1] and rewards stopword-rich long docs") {
    val hi = one(("the fox " * 30).trim).select(qualityScore($"text")).as[Double].head()
    val lo = one("zorp").select(qualityScore($"text")).as[Double].head()
    assert(hi > lo && hi <= 1.0 && lo >= 0.0)
  }

  test("minhashCol (narrow fold) equals minhashAgg (explode + groupBy) for every seed") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a b c d e f g h i j k l m n o p"),
      (3L, "short doc here"),
      (4L, "repeat repeat repeat repeat repeat repeat")
    ).toDF("doc_id", "text")
    val withSh = docs
      .select($"doc_id", tokens($"text").as("w"))
      .select($"doc_id", shinglesOf($"w").as("sh"))
      .filter(size($"sh") > 0)
    val narrow = withSh
      .select($"doc_id" +: (0 until 4).map(i => minhashCol(i, $"sh").as(s"mh$i")): _*)
      .orderBy($"doc_id")
      .collect()
    val agged = withSh
      .select($"doc_id", explode($"sh").as("shingle"))
      .groupBy($"doc_id")
      .agg(minhashAgg(0, $"shingle").as("mh0"), (1 until 4).map(i => minhashAgg(i, $"shingle").as(s"mh$i")): _*)
      .orderBy($"doc_id")
      .collect()
    assert(narrow.map(_.toSeq).toSeq == agged.map(_.toSeq).toSeq)
  }
}
