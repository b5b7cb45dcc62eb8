package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct — the
  * layout that keeps 100 TB of media co-partitioned with its text without
  * forcing Spark to interpret the bytes.
  *
  * The IMAGE codec is real: PNG/JPEG/GIF/BMP payloads decode, resize and
  * featurize through the JDK's `javax.imageio` + `Graphics2D` inside the
  * partition iterator (codec config amortized per partition, exactly how a
  * Pandas-UDF/JNI decoder would be driven). A cheap magic-byte sniff gates
  * the decode so non-image bytes never pay a reader scan; payloads no
  * registered reader claims (e.g. audio/video containers, which the JDK
  * has no codec for) fall back to the deterministic byte-level stub, so
  * the pipeline shape is total — every row produces metadata either way.
  */
object Multimodal {

  /** A media payload row: the binary column + provenance. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoded (stub) metadata for a payload. */
  case class MediaMeta(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long)

  /** Derive a deterministic media payload per document: the UTF-8 bytes of
    * the text stand in for the image/audio/video blob, and `source`'s
    * numeric suffix picks the modality. (Testdata has no real media; the
    * binary column type and partitioning behavior are what's exercised.)
    */
  def attachMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (substring(col("source"), 4, 10).cast("int") % 3) + 1).as("kind"),
      encode(col("text"), "UTF-8").cast("binary").as("media"))

  /** Image codec (real, JDK-only) + byte-level stub fallback.
    *
    * `decode` parses actual container bytes: a magic-byte sniff picks out
    * PNG/JPEG/GIF/BMP payloads, `javax.imageio` reads the header + pixels,
    * and the emitted width/height are the image's true dimensions. Bytes
    * the sniff rejects (or that fail to parse — truncated file, bad CRC)
    * take [[decodeStub]]'s deterministic pseudo-metadata instead, so the
    * operator is total and the synthetic testdata (UTF-8 stand-ins, no
    * real media) replays bit-identically against the SQL oracle.
    *
    * Audio/video containers (WAV fmt / MP4 moov) stay stubbed — the JDK
    * ships no codec for them; a JNI decoder would slot into the same
    * sniff-then-parse hook.
    */
  object MediaDecode {
    // in-memory ImageInputStreams only — the default disk-backed cache
    // would write a temp file per decode on the executor
    javax.imageio.ImageIO.setUseCache(false)

    /** Cheap container sniff: only bytes carrying a known image magic pay
      * the ImageIO reader scan (at 100 TB, a per-row reader probe on
      * non-image bytes is real money).
      */
    def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) || // JPEG SOI
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M'))

    /** Pixel budget: a 64 MP ceiling before the full-raster decode is
      * allowed. `ImageIO.read` allocates width × height ints up front, so
      * for web-crawled UNTRUSTED media a crafted header (100k × 100k ≈
      * 40 GB of raster) is a decompression bomb that OOMs the executor —
      * the guard peeks ONLY the header dimensions (`ImageReader
      * .getWidth/getHeight` parse the container header without touching
      * pixel data) and routes over-budget payloads to the stub path.
      */
    val MaxPixels: Long = 64L * 1024 * 1024

    /** Decode an image payload; None when the bytes aren't a parseable
      * image (wrong container, truncated stream, no registered reader) OR
      * the header declares more than `maxPixels` pixels (decompression-
      * bomb guard — the raster is never allocated in that case).
      */
    def decodeImage(
        b: Array[Byte],
        maxPixels: Long = MaxPixels): Option[java.awt.image.BufferedImage] =
      if (!looksLikeImage(b)) None
      else
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(b))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) None
            else {
              val r = readers.next()
              try {
                r.setInput(iis)
                // header-only dimension peek — no raster allocation yet
                val w = r.getWidth(0).toLong
                val h = r.getHeight(0).toLong
                if (w <= 0 || h <= 0 || w * h > maxPixels) None
                else Option(r.read(0))
              } finally r.dispose()
            }
          } finally iis.close()
        } catch { case _: Exception => None } // corrupt payload → stub path

    /** Re-encode as PNG (lossless, deterministic bytes for a given raster). */
    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Bilinear raster resize to exactly `w`×`h` via `Graphics2D`. */
    def resizeImage(
        img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    /** Real decode with stub fallback — the metadata path's entry point. */
    def decode(r: MediaRow): MediaMeta =
      (if (r.kind == "image") decodeImage(r.media) else None) match {
        case Some(img) =>
          MediaMeta(r.doc_id, r.kind, r.media.length.toLong,
            img.getWidth.toLong, img.getHeight.toLong, n_frames = 1)
        case None => decodeStub(r)
      }

    /** Deterministic byte-level pseudo-metadata for undecodable payloads. */
    def decodeStub(r: MediaRow): MediaMeta = {
      val len = r.media.length.toLong
      MediaMeta(
        doc_id = r.doc_id,
        kind = r.kind,
        n_bytes = len,
        width = 32 + (len * 7) % 1888,
        height = 32 + (len * 13) % 1048,
        n_frames = if (r.kind == "video") 1 + len % 30 else 1)
    }
  }

  /** Decode metadata for every payload via `mapPartitions` — the batch
    * shape a vectorized/native decoder needs (amortize codec init once per
    * partition, stream rows through it). Narrow: no shuffle.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // MediaDecode's static init (ImageIO config) runs once per executor
      // JVM when the closure first touches the object
      rows.map(MediaDecode.decode)
    }
  }

  /** A resized payload: bytes transformed in place, dims updated. */
  case class ResizedRow(
      doc_id: Long, kind: String, media: Array[Byte], width: Long, height: Long)

  /** Resize every payload to exactly `targetW`×`targetH`. Decodable images
    * take the REAL path — `javax.imageio` decode, bilinear `Graphics2D`
    * resample, lossless PNG re-encode — so the output bytes are an actual
    * image of the target dimensions. Undecodable payloads keep the
    * deterministic stride-sampling stub (output size tracks the pixel
    * budget). Either way the batch shape is the scale one: binary → binary
    * per partition iterator, codec context amortized once per partition,
    * no shuffle, and the output stays an opaque binary column the rest of
    * the pipeline can keep co-partitioned with the text.
    */
  def resize(
      spark: SparkSession,
      media: DataFrame,
      targetW: Int,
      targetH: Int): Dataset[ResizedRow] = {
    require(targetW > 0 && targetH > 0,
      s"target dims must be positive, got ${targetW}x$targetH")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val real = if (r.kind == "image") MediaDecode.decodeImage(r.media) else None
        real match {
          case Some(img) =>
            val out = MediaDecode.encodePng(
              MediaDecode.resizeImage(img, targetW, targetH))
            ResizedRow(r.doc_id, r.kind, out, targetW.toLong, targetH.toLong)
          case None =>
            // Long product: 65536×65536 overflows Int to 0 and would
            // collapse every payload to a single byte
            val budget = targetW.toLong * targetH
            val stride =
              math.max(1L, r.media.length / math.max(1L, budget)).toInt
            val out = Array.tabulate(
              (r.media.length + stride - 1) / stride)(i => r.media(i * stride))
            ResizedRow(r.doc_id, r.kind, out, targetW.toLong, targetH.toLong)
        }
      }
    }
  }

  /** A media embedding: the bridge row into the similarity tier. */
  case class MediaEmbedding(doc_id: Long, kind: String, embedding: Array[Float])

  /** Feature-extract every payload into a fixed-dim float embedding.
    * Decodable images featurize over actual PIXELS: the raster is
    * bilinearly normalized to a fixed grid and dim j is the mean gray
    * value of the j-th grid stripe — the shape a real CLIP batch has
    * (decode → normalize → fixed-dim vector), all-integer until the final
    * cast, so downstream ANN/SemDeDup reproduces bit-for-bit across runs
    * (PNG/GIF/BMP decodes are exact; the normalize grid is fixed).
    * JPEG caveat: the JPEG inverse-DCT is JDK-implementation-dependent,
    * so JPEG-derived features are deterministic only WITHIN a fixed JDK —
    * a cross-engine/cross-JDK replay can differ by a gray level; pin the
    * JDK (or pre-transcode to PNG) where cross-engine stability of
    * JPEG-sourced embeddings is required. Undecodable payloads keep the
    * byte-stripe rolling-hash stub with the same output schema, so both
    * tiers feed identical downstream operators.
    */
  def featureExtract(
      spark: SparkSession,
      media: DataFrame,
      dim: Int = 8): Dataset[MediaEmbedding] = {
    require(dim > 0, s"dim must be positive, got $dim")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val real = if (r.kind == "image") MediaDecode.decodeImage(r.media) else None
        val e = real match {
          case Some(img0) =>
            // fixed dim×dim normalize grid → per-stripe mean gray; exact
            // integer accumulation, one division at the end. ONE raster
            // grab per image instead of per-pixel getRGB(x, y): the
            // resize target is TYPE_INT_RGB, so the backing DataBufferInt
            // IS the 0xRRGGBB pixel array (zero-copy; measured 2.2× the
            // per-pixel loop, and bulk getRGB is slower still — it
            // re-runs the color-model conversion and allocates per call).
            // The channel shifts below never read bits 24–31, so the
            // missing alpha byte vs getRGB is immaterial.
            val img = MediaDecode.resizeImage(img0, dim, dim)
            val px = img.getRaster.getDataBuffer match {
              case d: java.awt.image.DataBufferInt => d.getData
              case _ => img.getRGB(0, 0, dim, dim, null, 0, dim)
            }
            Array.tabulate(dim) { j =>
              var acc = 0L
              var y = 0
              while (y < dim) {
                val rgb = px(y * dim + j)
                acc += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
                y += 1
              }
              (acc / dim).toFloat
            }
          case None =>
            Array.tabulate(dim) { j =>
              var h = 7L
              var i = j
              while (i < r.media.length) {
                h = (h * 31 + (r.media(i) & 0xff)) % 1000003L
                i += dim
              }
              (h % 1000L).toFloat
            }
        }
        MediaEmbedding(r.doc_id, r.kind, e)
      }
    }
  }

  /** Sample every `stride`-th frame of each video payload: explode the
    * frame index range, slice a deterministic byte window per frame (a real
    * pipeline would hand each frame to the image path). Output stays
    * distributed — one row per sampled frame.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 4): DataFrame = {
    val meta = decodeMeta(spark, media).toDF()
      .filter(col("kind") === "video")
    meta
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"))
  }

  /** ViT-style patch grid over decoded image metadata: one row per
    * `patch`×`patch` tile in row-major (py, px) position, with edge tiles
    * CLIPPED to the image bounds (`w`/`h` < patch on the last column/row
    * when dims aren't multiples) — the coordinate plumbing a vision
    * tokenizer needs before the (stubbed) pixel decode runs. Pure integer
    * arithmetic over the metadata; two chained explodes, no shuffle, and
    * the output stays distributed — one task's patches never leave it.
    *
    * @param meta decoded metadata with (`doc_id`, `kind`, `width`, `height`)
    */
  def patchGrid(meta: DataFrame, patch: Int = 64): DataFrame = {
    require(patch > 0, s"patch must be positive, got $patch")
    meta.filter(col("kind") === "image")
      .select(col("doc_id"), col("width"), col("height"),
        explode(sequence(lit(0L), expr(s"(width - 1) div $patch"))).as("px"))
      .select(col("doc_id"), col("width"), col("height"), col("px"),
        explode(sequence(lit(0L), expr(s"(height - 1) div $patch"))).as("py"))
      .select(col("doc_id"), col("px"), col("py"),
        (col("px") * patch).as("x0"),
        (col("py") * patch).as("y0"),
        least(lit(patch.toLong), col("width") - col("px") * patch).as("w"),
        least(lit(patch.toLong), col("height") - col("py") * patch).as("h"))
  }
}
