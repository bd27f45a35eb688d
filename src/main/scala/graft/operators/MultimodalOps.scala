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
  * Still images decode for REAL through the JDK's own codec
  * ([[decodeImage]]: `javax.imageio` — PNG/BMP/GIF/JPEG, no external
  * dependency); payloads ImageIO cannot parse (exotic codecs, audio,
  * video — no decoders in this container) fall back to the clearly-marked
  * deterministic STUB ([[decodeStub]]), which derives frame geometry and
  * pixel bytes from the payload deterministically. Everything around the
  * codec seam — schema, partitioning, batch shape, feature extraction —
  * is the same real pipeline either way.
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

  private def toLuma(img: java.awt.image.BufferedImage): (Int, Int, Array[Byte]) = {
    val w = img.getWidth
    val h = img.getHeight
    // Bulk getRGB: one color-model conversion pass for the whole frame
    // (per-pixel getRGB(x,y) costs a conversion + bounds check per
    // call — 10-50x slower on the executor hot path, same output).
    val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      val rgb = rgbs(i)
      px(i) = (((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000).toByte
      i += 1
    }
    (w, h, px)
  }

  /** REAL CODEC, multi-frame — decode every frame of an image payload
    * through the JDK's `javax.imageio` sequence reader (PNG/BMP/JPEG = one
    * frame; animated GIF = its real frame sequence) to row-major grayscale
    * buffers via the ITU-R BT.601 integer luma. Frames are decoded
    * independently (GIF disposal/compositing is out of scope — feature
    * extraction treats frames as samples, not a playback surface) and
    * capped at 1024 per document so a malicious payload can't balloon one
    * row. Returns None for payloads ImageIO has no reader for — the caller
    * falls back to [[decodeStub]], which is also where audio/video land in
    * this container. Deterministic: integer arithmetic only.
    */
  def decodeImageFrames(media: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Byte])]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(media))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = math.min(r.getNumImages(true), 1024)
          if (n <= 0) None
          else Some(Vector.tabulate(n)(i => toLuma(r.read(i))))
        } finally {
          r.dispose()
          iis.close()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** First real frame of an image payload (see [[decodeImageFrames]]). */
  def decodeImage(media: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeImageFrames(media).map(_.head)

  /** STUB CODEC — deterministic fake decode standing in for the codecs the
    * JDK lacks (audio/video; exotic image formats). Geometry is a pure
    * function of the payload; "pixels" are the payload bytes tiled to
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
    *
    * Image payloads go through the REAL JDK codec first
    * ([[decodeImageFrames]]) — a still image is one frame, an animated GIF
    * is its true frame sequence sampled at `frameStride`; anything ImageIO
    * can't read (and all audio/video in this container) takes the stub's
    * deterministic multi-frame path.
    */
  def decodeFrames(
      media: Dataset[MediaDoc],
      frameStride: Int = 1,
      targetSize: Int = 32
  ): Dataset[FrameFeatures] = {
    implicit val enc = Encoders.product[FrameFeatures]
    media.mapPartitions { docs =>
      // Per-partition setup would open heavier codec contexts here.
      def emit(docId: Long, fi: Int, w: Int, h: Int, px: Array[Byte]): FrameFeatures = {
        val (ow, oh, opx) =
          if (targetSize > 0) (targetSize, targetSize, resize(px, w, h, targetSize, targetSize))
          else (w, h, px)
        FrameFeatures(docId, fi, ow, oh, featureHistogram(opx))
      }
      docs.flatMap { doc =>
        val real =
          if (doc.mime != null && doc.mime.startsWith("image/")) decodeImageFrames(doc.media)
          else None
        real match {
          case Some(frames) =>
            (0 until frames.length by frameStride).iterator.map { fi =>
              val (w, h, px) = frames(fi)
              emit(doc.doc_id, fi, w, h, px)
            }
          case None =>
            (0 until frameCount(doc.n_bytes) by frameStride).iterator.map { fi =>
              val (w, h, px) = decodeStub(doc.media, fi)
              emit(doc.doc_id, fi, w, h, px)
            }
        }
      }
    }
  }
}
