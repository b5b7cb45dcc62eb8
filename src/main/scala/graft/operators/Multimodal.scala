package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct — the
  * layout that keeps 100 TB of media co-partitioned with its text without
  * forcing Spark to interpret the bytes.
  *
  * The actual codec work (`decode`) is a STUB — this container has no
  * image/audio libraries — but the Spark-side plumbing is real and tested:
  * typed `Dataset` schema, `mapPartitions` batch shape (one iterator per
  * partition, exactly how a Pandas-UDF/JNI decoder would be driven), and
  * explode-based frame sampling. Swap [[MediaDecode.decodeStub]] for a real
  * decoder and nothing else changes.
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

  /** STUB decoder: deterministic pseudo-metadata from the byte length.
    * A real implementation would parse the container header (JPEG SOF /
    * WAV fmt / MP4 moov) right here, per element, inside the partition
    * iterator.
    */
  object MediaDecode {
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
      // real codecs would initialize their native context here, once
      rows.map(MediaDecode.decodeStub)
    }
  }

  /** A resized payload: bytes transformed in place, dims updated. */
  case class ResizedRow(
      doc_id: Long, kind: String, media: Array[Byte], width: Long, height: Long)

  /** Resize every payload to a target pixel budget — STUB resampler
    * (keeps every stride-th byte so output size tracks targetW×targetH),
    * but the batch shape is the real one: binary → binary per partition
    * iterator, codec context amortized once per partition, no shuffle,
    * output stays an opaque binary column the rest of the pipeline can
    * keep co-partitioned with the text.
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
      // a real resampler would set up its native context here, once
      rows.map { r =>
        // Long product: 65536×65536 overflows Int to 0 and would collapse
        // every payload to a single byte
        val budget = targetW.toLong * targetH
        val stride =
          math.max(1L, r.media.length / math.max(1L, budget)).toInt
        val out = Array.tabulate(
          (r.media.length + stride - 1) / stride)(i => r.media(i * stride))
        ResizedRow(r.doc_id, r.kind, out, targetW.toLong, targetH.toLong)
      }
    }
  }

  /** A media embedding: the bridge row into the similarity tier. */
  case class MediaEmbedding(doc_id: Long, kind: String, embedding: Array[Float])

  /** Feature-extract every payload into a fixed-dim float embedding —
    * STUB featurizer (dim j = affine rolling hash over the j-strided byte
    * stripe, small exact integers cast to float), but deterministic, so
    * everything downstream of it — ANN ranking, SemDeDup, near-dup
    * thresholds — reproduces bit-for-bit across runs; the real CLIP/CLAP
    * batch would slot into the same partition iterator with the same
    * output schema and feed the identical downstream operators.
    */
  def featureExtract(
      spark: SparkSession,
      media: DataFrame,
      dim: Int = 8): Dataset[MediaEmbedding] = {
    require(dim > 0, s"dim must be positive, got $dim")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val e = Array.tabulate(dim) { j =>
          var h = 7L
          var i = j
          while (i < r.media.length) {
            h = (h * 31 + (r.media(i) & 0xff)) % 1000003L
            i += dim
          }
          (h % 1000L).toFloat
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
