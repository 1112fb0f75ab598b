package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rec(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRecord(id, kind, s"$kind/x", bytes)

  test("decode stub is deterministic and schema-complete through mapPartitions") {
    val media = Seq(
      rec(1, "image", "hello world".getBytes("UTF-8")),
      rec(2, "video", Array.tabulate(100)(_.toByte))
    ).toDS()
    val feats = MediaPipeline.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L))
    val img = feats(0)
    assert(img.n_bytes == 11 && img.n_frames == 1)
    assert(img.width == 64 + 'h' % 64 && img.height == 64 + 'd' % 64)
    val vid = feats(1)
    assert(vid.n_frames == (1 + 100 % 30))
    // determinism: re-running yields identical features
    assert(MediaPipeline.extractFeatures(media).collect().sortBy(_.media_id).toSeq == feats.toSeq)
  }

  test("batched decode handles partitions larger than the batch size") {
    val many  = (1L to 1000L).map(i => rec(i, "audio", Array.fill(8)(i.toByte))).toDS().repartition(2)
    val feats = MediaPipeline.extractFeatures(many)
    assert(feats.count() == 1000)
    assert(feats.filter(_.n_bytes != 8).count() == 0)
  }

  test("frame sampling only touches video and is deterministic") {
    val media = Seq(
      rec(1, "image", Array.fill(50)(1.toByte)),
      rec(2, "video", Array.tabulate(200)(_.toByte))
    ).toDS()
    val frames = MediaPipeline.sampleFrames(media, frameSize = 10, everyN = 10)
    assert(frames.select("media_id").distinct().as[Long].collect().toSeq == Seq(2L))
    assert(frames.count() == 2) // slices 0 and 10 of 20 ten-byte slices
  }
}
