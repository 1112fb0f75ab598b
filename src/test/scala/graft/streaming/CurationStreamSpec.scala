package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

class CurationStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ~50 tokens with a healthy stopword ratio → quality ≈ 1.0
  private val goodText =
    Seq.fill(10)("the quick brown fox jumps").mkString(" ")
  // single junk token → quality ≈ 0
  private val junkText = "zzzzzzzzzzzz"

  private def doc(id: Long, sec: Long, text: String) =
    (id, new Timestamp(sec * 1000L), text)

  test("streaming curation: quality gate + cross-batch fingerprint dedup within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val tmp   = Files.createTempDirectory("graft-curation").toString
    val query = CurationStream
      .curate(input.toDF().toDF("doc_id", "ts", "text"), java.time.Duration.ofMinutes(10))
      .writeStream
      .queryName("curated_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory")
      .start()

    // batch 1: original, same-batch duplicate (differs only by id), junk
    input.addData(doc(1, 10, goodText), doc(2, 11, goodText), doc(3, 12, junkText))
    query.processAllAvailable()
    // batch 2: cross-batch duplicate (within watermark) and a fresh doc
    input.addData(doc(4, 20, goodText), doc(5, 21, goodText + " extra"))
    query.processAllAvailable()

    val ids = spark.table("curated_stream").select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L), "original must pass")
    assert(!ids.contains(2L), "same-batch duplicate must drop")
    assert(!ids.contains(3L), "junk must not pass the quality gate (nor occupy dedup state)")
    assert(!ids.contains(4L), "cross-batch duplicate within the watermark must drop")
    assert(ids.contains(5L), "distinct content must pass")
    query.stop()
  }

  test("normalization: case/whitespace variants collapse to one fingerprint (batch q40 parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val tmp   = Files.createTempDirectory("graft-curation-norm").toString
    val query = CurationStream
      .curate(input.toDF().toDF("doc_id", "ts", "text"), java.time.Duration.ofMinutes(10))
      .writeStream
      .queryName("curated_norm")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory")
      .start()

    input.addData(doc(1, 10, goodText), doc(2, 11, "  " + goodText.toUpperCase + "  "))
    query.processAllAvailable()
    val ids = spark.table("curated_norm").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L), s"case/trim variant must dedup against the original, got $ids")
    query.stop()
  }
}
