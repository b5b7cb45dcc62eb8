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

  test("resize (stub) shrinks payloads toward the target budget, binary in binary out") {
    val media = Multimodal.attachMedia(docs)
    val out = Multimodal.resize(spark, media, targetW = 5, targetH = 5)
    assert(out.toDF().schema("media").dataType == BinaryType)
    val byId = out.collect().map(r => r.doc_id -> r).toMap
    // doc 12: 100 bytes, budget 25 → stride 4 → 25 bytes kept
    assert(byId(12L).media.length == 25)
    assert(byId(12L).width == 5 && byId(12L).height == 5)
    // payloads under budget pass through whole (stride 1)
    assert(byId(10L).media.toSeq == "abcd".getBytes("UTF-8").toSeq)
    // deterministic across runs
    val again = Multimodal.resize(spark, media, 5, 5).collect()
      .map(r => r.doc_id -> r.media.toSeq).toMap
    assert(out.collect().map(r => r.doc_id -> r.media.toSeq).toMap == again)
    // a gigapixel budget must pass payloads through whole — the W×H
    // product overflows Int (65536² = 0) and once collapsed every byte
    val huge = Multimodal.resize(spark, media, 65536, 65536).collect()
      .map(r => r.doc_id -> r.media.length).toMap
    assert(huge(12L) == 100, s"overflowed budget truncated payload: $huge")
  }

  test("featureExtract (stub) yields fixed-dim deterministic embeddings that feed ANN") {
    val media = Multimodal.attachMedia(docs)
    val emb = Multimodal.featureExtract(spark, media, dim = 4)
    val rows = emb.collect().map(r => r.doc_id -> r.embedding.toSeq).toMap
    assert(rows.values.forall(_.size == 4))
    assert(rows.values.forall(_.forall(v => v >= 0f && v < 1000f)),
      "stub dims are small exact integers in float")
    val again = Multimodal.featureExtract(spark, media, dim = 4)
      .collect().map(r => r.doc_id -> r.embedding.toSeq).toMap
    assert(rows == again, "embeddings must reproduce bit-for-bit")
    // the bridge into the similarity tier: brute-force top-k over the
    // extracted embeddings ranks every (query, doc) pair
    val base = emb.toDF().select(col("doc_id").as("vec_id"), col("embedding"))
    val hits = Similarity.bruteForceTopK(
      base, base.limit(1), col("vec_id"), col("embedding"), k = 2)
    assert(hits.count() == 2, "media embeddings must rank through the ANN path")
  }

  test("sampleFrames strides through video frames only") {
    val frames = Multimodal.sampleFrames(spark, Multimodal.attachMedia(docs), stride = 4)
      .select("doc_id", "frame_idx").as[(Long, Long)].collect().toSeq.sorted
    // only doc 12 (video, 11 frames): indices 0,4,8
    assert(frames == Seq((12L, 0L), (12L, 4L), (12L, 8L)))
  }

  // ---- real-codec tier: actual PNG payloads through the same plumbing ----

  /** A solid-color w×h PNG, generated in-JVM (no fixtures on disk). */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    Multimodal.MediaDecode.encodePng(img)
  }

  private def mediaDf(rows: (Long, String, Array[Byte])*) =
    rows.toDF("doc_id", "kind", "media")

  test("decodeMeta reads REAL dimensions out of a PNG payload") {
    val png = pngBytes(20, 12, 0xff0000)
    val m = mediaDf((100L, "image", png), (101L, "audio", png))
    val meta = Multimodal.decodeMeta(spark, m).collect().map(x => x.doc_id -> x).toMap
    assert(meta(100L).width == 20 && meta(100L).height == 12,
      s"expected decoded 20x12, got ${meta(100L)}")
    assert(meta(100L).n_bytes == png.length && meta(100L).n_frames == 1)
    // a non-image kind never pays the decode, even with image bytes
    assert(meta(101L).width == 32 + png.length.toLong * 7 % 1888,
      "audio payload must take the stub path")
  }

  test("resize really resamples a PNG: output re-decodes at the target dims") {
    val m = mediaDf((100L, "image", pngBytes(20, 12, 0x00ff00)))
    val out = Multimodal.resize(spark, m, targetW = 8, targetH = 6)
      .collect().head
    val img = Multimodal.MediaDecode.decodeImage(out.media)
      .getOrElse(fail("resized payload is not a decodable image"))
    assert(img.getWidth == 8 && img.getHeight == 6)
    // solid green survives the bilinear resample exactly
    assert((img.getRGB(3, 3) & 0xffffff) == 0x00ff00)
    assert(out.width == 8 && out.height == 6)
  }

  test("featureExtract featurizes PIXELS for a decodable image") {
    // solid gray (100,100,100): every grid stripe's mean gray is exactly 100
    val m = mediaDf(
      (100L, "image", pngBytes(16, 16, 0x646464)),
      (101L, "image", "not an image".getBytes("UTF-8")))
    val rows = Multimodal.featureExtract(spark, m, dim = 4)
      .collect().map(r => r.doc_id -> r.embedding.toSeq).toMap
    assert(rows(100L) == Seq(100f, 100f, 100f, 100f),
      s"pixel path must average the raster, got ${rows(100L)}")
    // undecodable bytes fall back to the byte-stripe stub, same schema
    assert(rows(101L).size == 4 && rows(101L) != rows(100L))
  }

  test("JPEG payloads decode through the same path (magic sniff + ImageIO)") {
    val img = new java.awt.image.BufferedImage(
      24, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try { g2.setColor(java.awt.Color.BLUE); g2.fillRect(0, 0, 24, 10) }
    finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert(Multimodal.MediaDecode.looksLikeImage(jpeg), "JPEG SOI magic")
    val meta = Multimodal.decodeMeta(spark, mediaDf((100L, "image", jpeg)))
      .collect().head
    assert(meta.width == 24 && meta.height == 10,
      s"expected decoded 24x10, got $meta")
  }

  /** A header-only PNG whose IHDR declares `w`×`h` with a VALID CRC — the
    * decompression-bomb shape: a few dozen bytes on the wire, a
    * `w*h*4`-byte raster if a reader naively allocates. No IDAT follows,
    * so a full `ImageIO.read` would fail anyway; the point is that the
    * guard must reject on the HEADER, before any raster allocation.
    */
  private def bombPngHeader(w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(ihdr)
    d.writeBytes("IHDR")
    d.writeInt(w); d.writeInt(h)
    d.writeByte(8); d.writeByte(2) // bit depth 8, color type RGB
    d.writeByte(0); d.writeByte(0); d.writeByte(0)
    val chunk = ihdr.toByteArray
    out.writeInt(chunk.length - 4) // data length excludes the type tag
    out.write(chunk)
    val crc = new java.util.zip.CRC32()
    crc.update(chunk)
    out.writeInt(crc.getValue.toInt)
    bos.toByteArray
  }

  test("a decompression-bomb header is rejected by the pixel budget, raster never allocated") {
    // 100k × 100k ≈ 10 gigapixels ≈ 40 GB of raster ints if decoded —
    // far over any test heap, so completing AT ALL proves the header-only
    // peek; the explicit budget check is the documented contract
    val bomb = bombPngHeader(100000, 100000)
    assert(Multimodal.MediaDecode.looksLikeImage(bomb), "PNG magic intact")
    assert(Multimodal.MediaDecode.decodeImage(bomb).isEmpty,
      "over-budget header must route to the stub path")
    // a same-shaped header UNDER the budget gets past the guard (and then
    // fails on the missing IDAT — proving the budget check, not a parse
    // error, is what rejected the bomb)
    assert(Multimodal.MediaDecode.decodeImage(bombPngHeader(8, 8)).isEmpty)
    // the operator tier: the bomb flows through decodeMeta as a stub row
    val meta = Multimodal.decodeMeta(spark,
      mediaDf((100L, "image", bomb))).collect().head
    assert(meta.width == 32 + bomb.length.toLong * 7 % 1888,
      "bomb payload must take the deterministic stub path")
    // explicit budget knob: the same 20x12 real PNG decodes at the default
    // budget and is rejected when the budget is below its pixel count
    val png = pngBytes(20, 12, 0xff0000)
    assert(Multimodal.MediaDecode.decodeImage(png).isDefined)
    assert(Multimodal.MediaDecode.decodeImage(png, maxPixels = 100).isEmpty)
  }

  test("a truncated PNG falls back to the stub instead of failing the task") {
    val broken = pngBytes(20, 12, 0xff0000).take(30) // magic intact, body gone
    val meta = Multimodal.decodeMeta(spark,
      mediaDf((100L, "image", broken))).collect().head
    assert(meta.width == 32 + broken.length.toLong * 7 % 1888,
      "corrupt payload must take the deterministic stub path")
  }

  test("patchGrid tiles images row-major and clips edge tiles to the bounds") {
    // 100×70 at patch 64 → px ∈ {0,1}, py ∈ {0,1}; right/bottom tiles clip
    val meta = Seq((1L, "image", 100L, 70L), (2L, "video", 100L, 70L))
      .toDF("doc_id", "kind", "width", "height")
    val got = Multimodal.patchGrid(meta, patch = 64)
      .select("doc_id", "px", "py", "x0", "y0", "w", "h")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 0L, 0L, 0L, 64L, 64L),
      (1L, 1L, 0L, 64L, 0L, 36L, 64L),
      (1L, 0L, 1L, 0L, 64L, 64L, 6L),
      (1L, 1L, 1L, 64L, 64L, 36L, 6L)))
    // every byte of the image is covered exactly once: Σ w·h = width·height
    val covered = Multimodal.patchGrid(meta, patch = 64)
      .agg(org.apache.spark.sql.functions.sum(col("w") * col("h")))
      .as[Long].collect().head
    assert(covered == 100L * 70L)
  }
}
