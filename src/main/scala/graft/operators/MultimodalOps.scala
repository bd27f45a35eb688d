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

  /** Open an ImageIO reader over the payload, or None if the JDK has no
    * codec for it; releases the reader and stream either way.
    */
  private def withImageReader[T](media: Array[Byte])(f: javax.imageio.ImageReader => Option[T]): Option[T] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(media))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val r = readers.next()
        try { r.setInput(iis); f(r) }
        finally { r.dispose(); iis.close() }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame GIF placement + disposal from the frame's native metadata;
    * (0, 0, "none") for formats without it (still formats, or a reader
    * that refuses the tree).
    */
  private def gifFrameMeta(r: javax.imageio.ImageReader, i: Int): (Int, Int, String) =
    try {
      val tree = r.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
      var left = 0; var top = 0; var disposal = "none"
      val kids = tree.getChildNodes
      var j = 0
      while (j < kids.getLength) {
        kids.item(j) match {
          case e: org.w3c.dom.Element if e.getNodeName == "ImageDescriptor" =>
            left = e.getAttribute("imageLeftPosition").toInt
            top = e.getAttribute("imageTopPosition").toInt
          case e: org.w3c.dom.Element if e.getNodeName == "GraphicControlExtension" =>
            disposal = e.getAttribute("disposalMethod")
          case _ => ()
        }
        j += 1
      }
      (left, top, disposal)
    } catch { case scala.util.control.NonFatal(_) => (0, 0, "none") }

  /** GIF logical screen size from the stream metadata, if present. */
  private def logicalScreen(r: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val tree = r.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
      val kids = tree.getChildNodes
      var out: Option[(Int, Int)] = None
      var j = 0
      while (j < kids.getLength) {
        kids.item(j) match {
          case e: org.w3c.dom.Element if e.getNodeName == "LogicalScreenDescriptor" =>
            out = Some((e.getAttribute("logicalScreenWidth").toInt,
              e.getAttribute("logicalScreenHeight").toInt))
          case _ => ()
        }
        j += 1
      }
      out
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL CODEC, multi-frame, LAZY — decode only every `frameStride`-th
    * frame of an image payload through the JDK's `javax.imageio` reader
    * (PNG/BMP/JPEG = one frame; animated GIF = its real frame sequence) to
    * `(frameIdx, width, height, luma)` with the ITU-R BT.601 integer luma.
    * Unsampled frames are never decoded and at most ONE decoded frame is
    * held at a time (`r.read(i)` per sampled index), so memory is bounded
    * by a frame, not the sequence; the sequence is capped at 1024 frames
    * so a malicious payload can't balloon one row.
    *
    * `composite = false` (default) decodes frames independently — feature
    * extraction treats frames as samples. Delta-encoded GIFs (frames that
    * paint a sub-rectangle of the logical screen) yield misleading
    * per-frame luma that way, so `composite = true` instead plays the
    * sequence against a persistent canvas: each frame draws at its
    * ImageDescriptor offset, the sampled snapshot is the canvas, and the
    * frame's disposal method is applied before the next
    * (doNotDispose keeps, restoreToBackgroundColor clears the frame's
    * rect — GIF background renders as black luma 0 — restoreToPrevious
    * reverts the draw). Compositing must still DECODE every frame (deltas
    * depend on priors) but only materializes luma for sampled indices.
    * Returns None for payloads ImageIO has no reader for — the caller
    * falls back to [[decodeStub]]. Deterministic: integer arithmetic only.
    */
  def decodeImageFramesSampled(
      media: Array[Byte],
      frameStride: Int = 1,
      composite: Boolean = false
  ): Option[IndexedSeq[(Int, Int, Int, Array[Byte])]] =
    withImageReader(media) { r =>
      val n = math.min(r.getNumImages(true), 1024)
      if (n <= 0) None
      else if (!composite) {
        Some((0 until n by frameStride).toVector.map { i =>
          val (w, h, px) = toLuma(r.read(i))
          (i, w, h, px)
        })
      } else {
        import java.awt.image.BufferedImage
        val out = Vector.newBuilder[(Int, Int, Int, Array[Byte])]
        var canvas: BufferedImage = null
        var i = 0
        while (i < n) {
          val frame = r.read(i)
          val (left, top, disposal) = gifFrameMeta(r, i)
          if (canvas == null) {
            val (cw, ch) = logicalScreen(r).getOrElse((left + frame.getWidth, top + frame.getHeight))
            canvas = new BufferedImage(cw max (left + frame.getWidth), ch max (top + frame.getHeight),
              BufferedImage.TYPE_INT_RGB)
          }
          val prev =
            if (disposal == "restoreToPrevious")
              canvas.getRGB(0, 0, canvas.getWidth, canvas.getHeight, null, 0, canvas.getWidth)
            else null
          val g = canvas.createGraphics()
          g.drawImage(frame, left, top, null)
          g.dispose()
          if (i % frameStride == 0) {
            val (w, h, px) = toLuma(canvas)
            out += ((i, w, h, px))
          }
          disposal match {
            case "restoreToBackgroundColor" =>
              val g2 = canvas.createGraphics()
              g2.setColor(java.awt.Color.BLACK)
              g2.fillRect(left, top, frame.getWidth, frame.getHeight)
              g2.dispose()
            case "restoreToPrevious" =>
              canvas.setRGB(0, 0, canvas.getWidth, canvas.getHeight, prev, 0, canvas.getWidth)
            case _ => ()
          }
          i += 1
        }
        Some(out.result())
      }
    }

  /** Every frame, decoded independently (see [[decodeImageFramesSampled]]). */
  def decodeImageFrames(media: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Byte])]] =
    decodeImageFramesSampled(media).map(_.map { case (_, w, h, px) => (w, h, px) })

  /** First real frame of an image payload — reads frame 0 directly (no
    * sequence scan, no other frame ever decoded).
    */
  def decodeImage(media: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    withImageReader(media)(r => Some(toLuma(r.read(0))))

  /** 64-bit difference hash (dHash) of a grayscale buffer — the standard
    * perceptual near-dup sketch for image corpora (LAION-scale dedup):
    * resize to 9×8 (nearest-neighbor, deterministic), bit (y·8+x) = 1 iff
    * the right neighbor is brighter. Robust to re-encoding, scaling, and
    * small edits; hamming distance between sketches counts perceptual
    * difference, so the whole simhash banding machinery (8 byte-bands,
    * pigeonhole-complete for hamming ≤ 7) applies unchanged.
    */
  def dhash64(px: Array[Byte], w: Int, h: Int): Long = {
    val g = resize(px, w, h, 9, 8)
    var sig = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((g(y * 9 + x + 1) & 0xff) > (g(y * 9 + x) & 0xff)) sig |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    sig
  }

  /** dHash of an encoded image payload through the REAL codec path
    * (ImageIO decode → BT.601 luma → [[dhash64]]). Throws on undecodable
    * bytes — perceptual hashing garbage would silently poison a dedup.
    */
  def imageDhash(media: Array[Byte]): Long = {
    val (w, h, px) = decodeImage(media).getOrElse(
      throw new IllegalArgumentException("imageDhash: payload is not a decodable image"))
    dhash64(px, w, h)
  }

  /** Deterministic BMP test image for the image-dedup pipeline: a smooth
    * three-wave luma field keyed by `seed` (distinct seeds give distinct
    * wave parameters → far-apart dHashes), rendered through the real
    * ImageIO BMP WRITER so the payload is genuine codec bytes — the dedup
    * pipeline then exercises the actual decode path, not a synthetic
    * buffer. `perturb` adds a small deterministic ripple (±3 luma), the
    * re-encode/minor-edit regime a perceptual hash must absorb.
    */
  def renderTestImage(seed: Long, size: Int = 16, perturb: Boolean = false): Array[Byte] = {
    val fx = 0.5 + (seed % 5) * 0.3
    val fy = 0.5 + ((seed / 5) % 5) * 0.3
    val p1 = (seed % 17).toDouble / 17.0 * 2 * math.Pi
    val p2 = (seed % 101).toDouble / 101.0 * 2 * math.Pi
    val img = new java.awt.image.BufferedImage(size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      var v = 128.0 + 70.0 * math.sin(fx * x + fy * y + p1) + 40.0 * math.sin(0.9 * x - 0.7 * y + p2)
      if (perturb) v += 3.0 * math.sin(1.3 * x + 1.7 * y + (seed % 7).toDouble)
      val l = math.max(0, math.min(255, v.round.toInt))
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

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
    * ([[decodeImageFramesSampled]] — only the sampled frames decode) — a
    * still image is one frame, an animated GIF is its true frame sequence
    * sampled at `frameStride` (composited against the playback canvas when
    * `composite = true`); anything ImageIO can't read (and all audio/video
    * in this container) takes the stub's deterministic multi-frame path.
    */
  def decodeFrames(
      media: Dataset[MediaDoc],
      frameStride: Int = 1,
      targetSize: Int = 32,
      composite: Boolean = false
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
          if (doc.mime != null && doc.mime.startsWith("image/"))
            decodeImageFramesSampled(doc.media, frameStride, composite)
          else None
        real match {
          case Some(frames) =>
            frames.iterator.map { case (fi, w, h, px) => emit(doc.doc_id, fi, w, h, px) }
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
