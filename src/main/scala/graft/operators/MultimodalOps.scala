package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.3 #35).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column with
  * typed metadata alongside — the parquet encoding a 100 TB media corpus
  * actually uses. Decode / frame-sample / feature-extract run as
  * `Dataset.mapPartitions`: the executor-side batch-iterator shape (the JVM
  * analogue of `mapInPandas`) — one codec context per partition, streaming
  * row-by-row, no driver collect, no shuffle.
  *
  * The codec itself is a clearly-marked deterministic STUB
  * ([[decodeStub]]): this container ships no image/audio libraries, so the
  * stub derives frame geometry and pixel bytes from the payload
  * deterministically. Everything around it — schema, partitioning, batch
  * shape, feature extraction — is the real pipeline and is what
  * MultimodalOpsSpec pins.
  */
object MultimodalOps {

  /** One media document: opaque payload + typed metadata. */
  case class MediaDoc(doc_id: Long, media: Array[Byte], mime: String, n_bytes: Long)

  /** One decoded, feature-extracted frame. */
  case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      features: Array[Double]
  )

  /** Wrap a documents table as a media table: payload = UTF-8 bytes of the
    * text (deterministic stand-in for real image bytes), mime cycled, typed
    * metadata columns. Pure projection — scales with the scan.
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")
      ).as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")
    )

  /** STUB CODEC — deterministic fake decode standing in for a real
    * image/audio library (none available in this container). Geometry is a
    * pure function of the payload; "pixels" are the payload bytes tiled to
    * width×height. A real deployment swaps only this function.
    */
  def decodeStub(media: Array[Byte], frameIdx: Int): (Int, Int, Array[Byte]) = {
    val n = media.length.max(1)
    val width = 16 + (n + frameIdx) % 48
    val height = 16 + (n * 7 + frameIdx * 3) % 48
    val px = new Array[Byte](width * height)
    var i = 0
    while (i < px.length) {
      px(i) = if (media.isEmpty) 0 else media((i + frameIdx) % media.length)
      i += 1
    }
    (width, height, px)
  }

  /** Frame count for a payload: 1 frame per 256 bytes, capped at 24 —
    * deterministic, so specs can assert exact output cardinality.
    */
  def frameCount(nBytes: Long): Int = (1L + nBytes / 256L).min(24L).toInt

  /** Nearest-neighbor resize of a row-major grayscale buffer — real image
    * math (only the pixels' provenance is stubbed). Training pipelines
    * normalize frames to a fixed geometry before feature extraction; this
    * is that step.
    */
  def resize(
      px: Array[Byte],
      w: Int,
      h: Int,
      targetW: Int,
      targetH: Int
  ): Array[Byte] = {
    val out = new Array[Byte](targetW * targetH)
    var y = 0
    while (y < targetH) {
      val sy = y * h / targetH
      var x = 0
      while (x < targetW) {
        out(y * targetW + x) = px(sy * w + x * w / targetW)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 16-bin normalized byte histogram — the stand-in feature extractor
    * (real pipelines put an embedding model here; the batch shape is the
    * same: bytes in, fixed-width vector out).
    */
  def featureHistogram(pixels: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    var i = 0
    while (i < pixels.length) {
      bins((pixels(i) & 0xff) >>> 4) += 1.0
      i += 1
    }
    if (pixels.nonEmpty) {
      var b = 0
      while (b < 16) { bins(b) /= pixels.length; b += 1 }
    }
    bins
  }

  /** Decode every `frameStride`-th frame of each document, resize to a
    * fixed geometry, and extract features. One pass, partition-preserving
    * (narrow), executor-only. `targetSize <= 0` skips the resize.
    */
  def decodeFrames(
      media: Dataset[MediaDoc],
      frameStride: Int = 1,
      targetSize: Int = 32
  ): Dataset[FrameFeatures] = {
    implicit val enc = Encoders.product[FrameFeatures]
    media.mapPartitions { docs =>
      // Per-partition setup would open the real codec context here.
      docs.flatMap { doc =>
        (0 until frameCount(doc.n_bytes) by frameStride).iterator.map { fi =>
          val (w, h, px) = decodeStub(doc.media, fi)
          val (ow, oh, opx) =
            if (targetSize > 0) (targetSize, targetSize, resize(px, w, h, targetSize, targetSize))
            else (w, h, px)
          FrameFeatures(doc.doc_id, fi, ow, oh, featureHistogram(opx))
        }
      }
    }
  }
}
