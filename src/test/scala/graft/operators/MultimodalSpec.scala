package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (10L, "abcd", "src0"),   // 0 % 3 = 0 → image
    (11L, "abcdefgh", "src4"), // 4 % 3 = 1 → audio
    (12L, "x" * 100, "src5"))  // 5 % 3 = 2 → video
    .toDF("doc_id", "text", "source")

  test("attachMedia produces a real binary column with modality from source") {
    val m = Multimodal.attachMedia(docs)
    assert(m.schema("media").dataType == BinaryType)
    val kinds = m.select("doc_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds == Map(10L -> "image", 11L -> "audio", 12L -> "video"))
    val bytes = m.filter(col("doc_id") === 10L).select("media").as[Array[Byte]].collect()(0)
    assert(new String(bytes, "UTF-8") == "abcd")
  }

  test("decodeMeta (stub) is deterministic arithmetic over byte length") {
    val meta = Multimodal.decodeMeta(spark, Multimodal.attachMedia(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(10L).n_bytes == 4 && meta(10L).width == 32 + 4 * 7 % 1888)
    assert(meta(10L).n_frames == 1)          // image
    assert(meta(12L).n_frames == 1 + 100 % 30) // video: 11 frames
  }

  test("sampleFrames strides through video frames only") {
    val frames = Multimodal.sampleFrames(spark, Multimodal.attachMedia(docs), stride = 4)
      .select("doc_id", "frame_idx").as[(Long, Long)].collect().toSeq.sorted
    // only doc 12 (video, 11 frames): indices 0,4,8
    assert(frames == Seq((12L, 0L), (12L, 4L), (12L, 8L)))
  }
}
