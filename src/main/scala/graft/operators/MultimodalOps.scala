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
  * dependency), and WAV audio decodes for REAL through
  * `javax.sound.sampled` ([[decodeAudio]] — header + PCM frames, 8/16-bit,
  * multi-channel averaged); payloads the JDK cannot parse (exotic image
  * codecs, MP3/OGG, video — no decoders in this container) fall back to
  * the clearly-marked deterministic STUB ([[decodeStub]] / the flagged
  * arm of [[audioFeatures]]), which derives features from the payload
  * deterministically. Everything around the codec seam — schema,
  * partitioning, batch shape, feature extraction — is the same real
  * pipeline either way.
  */
object MultimodalOps {

  // r17: ImageIO's createImageInputStream/write default to DISK-backed
  // cache streams (FileCacheImageInput/OutputStream) for non-File
  // sources — every encode/decode of an in-memory byte[] spools through a
  // temp file in java.io.tmpdir. Under 32 concurrent codec tasks that is
  // a create/write/delete syscall storm per image, pure overhead on a
  // pipeline whose payloads already sit in memory. Memory-cached streams
  // produce byte-identical codec output (same readers/writers, different
  // scratch backing); every image spec and the perceptual-hash oracles
  // pin the results.
  javax.imageio.ImageIO.setUseCache(false)

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

  // 32-point DCT-II cosine table with orthonormal scale factors, shared by
  // every phash64 call (the kernel runs once per image inside a
  // mapPartitions — rebuilding 1024 cosines per row would dominate the
  // 8×8 readout).
  private val PhashN = 32
  private val phashCos: Array[Array[Double]] = Array.tabulate(PhashN, PhashN) { (u, x) =>
    val a = if (u == 0) math.sqrt(1.0 / PhashN) else math.sqrt(2.0 / PhashN)
    a * math.cos((2 * x + 1) * u * math.Pi / (2.0 * PhashN))
  }

  /** 64-bit perceptual hash (pHash): resize to 32×32, 2-D orthonormal
    * DCT-II (separable — rows then columns), keep the top-left 8×8
    * low-frequency block, threshold each coefficient against the MEDIAN of
    * the 63 non-DC coefficients. Where [[dhash64]] signs LOCAL
    * adjacent-pixel differences of a 9×8 downsample — differences that in
    * smooth regions are smaller than sensor noise, so dither flips them —
    * each pHash readout aggregates ALL 1024 resized pixels, so iid noise
    * cancels (measured on 2000 dense-spectrum images at crop=1+dither±26:
    * pHash recall@7 = 97.8% vs dHash 38.7%). Two measured caveats that
    * shape the fixtures: the hash is meaningful only on images whose
    * spectrum is DENSE and decaying (on a pure sinusoid most AC readouts
    * sit in the numeric noise floor, the median lands in that floor, and
    * those bits are coin flips — recall ~0 for even a 1-px edit), and
    * crops beyond ~3% of the edge rescale spatial frequency enough to
    * shift energy across DCT bins (border=2 of 64 px: recall 87%). The DC
    * bit is effectively constant (DC ≫ median for any non-degenerate
    * image); harmless under byte-banding, and keeping the full 8×8 block
    * is the standard formulation.
    */
  def phash64(px: Array[Byte], w: Int, h: Int): Long = {
    val n = PhashN
    val g = resize(px, w, h, n, n)
    // Row pass: t(u, y) = Σ_x C(u,x) · g(y,x) — only u < 8 is ever read.
    val t = Array.ofDim[Double](8, n)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        val cu = phashCos(u)
        var s = 0.0
        var x = 0
        while (x < n) { s += cu(x) * (g(y * n + x) & 0xff); x += 1 }
        t(u)(y) = s
        u += 1
      }
      y += 1
    }
    // Column pass restricted to the 8×8 readout: F(u,v) = Σ_y C(v,y) · t(u,y).
    val f = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val cv = phashCos(v)
        var s = 0.0
        var yy = 0
        while (yy < n) { s += cv(yy) * t(u)(yy); yy += 1 }
        f(v * 8 + u) = s
        v += 1
      }
      u += 1
    }
    // Median of the 63 non-DC coefficients = 32nd smallest.
    val sorted = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (f(i) > med) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** pHash of an encoded image payload through the REAL codec path
    * (ImageIO decode → BT.601 luma → [[phash64]]). Throws on undecodable
    * bytes, same contract as [[imageDhash]].
    */
  def imagePhash(media: Array[Byte]): Long = {
    val (w, h, px) = decodeImage(media).getOrElse(
      throw new IllegalArgumentException("imagePhash: payload is not a decodable image"))
    phash64(px, w, h)
  }

  /** Add seeded uniform ±`amp` luma dither to an encoded image and
    * re-encode — the sensor-noise / dither / re-quantization half of the
    * re-framed-repost edit. This is the regime where the two perceptual
    * hashes genuinely separate (measured on 2000 dense-spectrum images,
    * crop=1 + amp=26: pHash recall@7 = 97.8%, dHash = 38.7%): dHash signs
    * adjacent-pixel DIFFERENCES of a 9×8 downsample, which in smooth
    * regions are smaller than the noise, while each pHash DCT readout
    * aggregates all 1024 resized pixels so iid noise cancels.
    */
  /** Encode a row-major luma buffer as BMP through the real ImageIO
    * writer, with ONE bulk setRGB — the write-side twin of [[toLuma]]'s
    * bulk-getRGB rule (per-pixel setRGB pays a color-model conversion and
    * bounds check per call; 10-50× slower on the render hot path, same
    * bytes out).
    */
  private def lumaToBmp(luma: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgbs = new Array[Int](w * h)
    var i = 0
    while (i < rgbs.length) { val l = luma(i); rgbs(i) = (l << 16) | (l << 8) | l; i += 1 }
    img.setRGB(0, 0, w, h, rgbs, 0, w)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  def ditherImage(media: Array[Byte], amp: Int, seed: Long): Array[Byte] = {
    val (w, h, px) = decodeImage(media).getOrElse(
      throw new IllegalArgumentException("ditherImage: payload is not a decodable image"))
    val rnd = new java.util.Random(seed)
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      val l0 = px(i) & 0xff
      out(i) = math.max(0, math.min(255, l0 + rnd.nextInt(2 * amp + 1) - amp))
      i += 1
    }
    lumaToBmp(out, w, h)
  }

  /** Crop `border` pixels off every edge of an encoded image and re-encode
    * through the real BMP writer — the geometric half of the re-framed
    * repost edit (a thumbnail with the chrome trimmed). Decode → luma crop
    * → encode, so BOTH codec directions are the real path.
    */
  def cropImage(media: Array[Byte], border: Int): Array[Byte] = {
    val (w, h, px) = decodeImage(media).getOrElse(
      throw new IllegalArgumentException("cropImage: payload is not a decodable image"))
    val cw = w - 2 * border
    val ch = h - 2 * border
    require(cw > 0 && ch > 0, s"cropImage: border $border exceeds image ${w}x$h")
    val out = new Array[Int](cw * ch)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        out(y * cw + x) = px((y + border) * w + (x + border)) & 0xff
        x += 1
      }
      y += 1
    }
    lumaToBmp(out, cw, ch)
  }

  /** Deterministic LOW-FREQUENCY BMP test image for the crop/zoom near-dup
    * fixture: luma is a seed-keyed mix of sinusoids at INTEGER cycle counts
    * per image edge (1..6 cycles — DCT bins 2..12 at any render size), so
    * the image's energy lives where [[phash64]] reads. This is the regime
    * pHash's crop claim is about — real photographs are low-frequency
    * dominated — whereas [[renderTestImage]]'s near-Nyquist gratings
    * (fx up to 1.7 rad/px) alias under the crop's re-resize and scramble
    * EVERY frequency-domain hash (measured: recall ~0 for both pHash and
    * dHash). Cycles-per-image parameterization means a border crop of b px
    * only rescales frequencies by size/(size−2b) ≈ 1.07 at size=64, b=2 —
    * energy stays in its bin neighborhood. Rendered through the real
    * ImageIO BMP writer like every other fixture.
    */
  def renderSmoothTestImage(seed: Long, size: Int = 64): Array[Byte] = {
    // Seed-keyed DENSE decaying spectrum: every (u,v) in the 8×8
    // low-frequency block carries a coefficient with 1/f-ish magnitude and
    // a seeded random sign/scale. Natural images have exactly this shape,
    // and pHash's median threshold depends on it: with a SPARSE spectrum
    // (a few pure sinusoids) ~57 of the 63 AC readouts sit in the numeric
    // noise floor, the median lands inside that floor, and those bits are
    // coin flips under any edit (measured: recall ~0 even for a 1-px crop
    // of a pure low-frequency grating).
    val rnd = new java.util.Random(seed * 0x9e3779b97f4a7c15L + 0x1234567L)
    val coef = Array.ofDim[Double](8, 8)
    for (u <- 0 until 8; v <- 0 until 8; if u + v > 0) {
      val mag = 160.0 / (1.0 + u + v)
      coef(u)(v) = (rnd.nextDouble() * 2.0 - 1.0) * mag
    }
    // Evaluate the inverse DCT-II basis SEPARABLY (the basis at render
    // size maps onto the hash's 32×32 basis under subsampling): per row y
    // fold the v-axis into 8 partials (64 mul-adds), then each pixel is an
    // 8-term dot product — 8 ops/px instead of 63 (this render runs twice
    // per document in the phash pipeline's hot mapPartitions).
    val cosT = Array.tabulate(8, size)((u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * size)))
    val out = new Array[Int](size * size)
    val rowAcc = new Array[Double](8)
    var y = 0
    while (y < size) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += coef(u)(v) * cosT(v)(y); v += 1 }
        rowAcc(u) = acc
        u += 1
      }
      var x = 0
      while (x < size) {
        var l = 128.0
        var uu = 0
        while (uu < 8) { l += rowAcc(uu) * cosT(uu)(x); uu += 1 }
        out(y * size + x) = math.max(0, math.min(255, l.round.toInt))
        x += 1
      }
      y += 1
    }
    lumaToBmp(out, size, size)
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
    val out = new Array[Int](size * size)
    for (y <- 0 until size; x <- 0 until size) {
      var v = 128.0 + 70.0 * math.sin(fx * x + fy * y + p1) + 40.0 * math.sin(0.9 * x - 0.7 * y + p2)
      if (perturb) v += 3.0 * math.sin(1.3 * x + 1.7 * y + (seed % 7).toDouble)
      out(y * size + x) = math.max(0, math.min(255, v.round.toInt))
    }
    lumaToBmp(out, size, size)
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

  // ------------------------------------------------------------------
  // Audio: real WAV decode through the JDK's own codec
  // (javax.sound.sampled — no external dependency), mirroring the image
  // path. MP3/OGG/video stay on the deterministic stub (no JDK decoder);
  // everything around the codec seam — mapPartitions shape, feature
  // extraction, fingerprinting — is the same real pipeline either way.
  // ------------------------------------------------------------------

  /** Deterministic 16-bit mono PCM WAV: a two-sine mix keyed by `seed`
    * (distinct seeds → distinct spectra → far-apart fingerprints), written
    * through the REAL `AudioSystem` WAV encoder so [[decodeAudio]]
    * exercises a genuine header + PCM parse. `amp` scales the waveform —
    * the volume knob the fingerprint must be invariant to.
    */
  /** The pre-quantization waveform [[synthWav]] encodes: a two-sine mix
    * under a seed-keyed low-frequency amplitude ENVELOPE. Exposed so gates
    * can compare DECODED samples against the exact source signal
    * (quantization noise only — no analytic slack; note certain seeds make
    * f1 = f2, a coherent sum whose RMS differs from the incoherent
    * two-tone formula, which is why the gate compares against THIS, not a
    * closed form). The envelope is what gives the energy-contour
    * fingerprint its entropy: a STATIONARY tone has a near-flat contour,
    * its 64 window-comparison bits collapse to ~3.5k distinct values per
    * 10k clips, identical-fingerprint groups grow with the corpus, and the
    * band self-join's pair table goes QUADRATIC (measured: 141k pairs at
    * 10k sigs → 556k at 20k before this envelope existed; a first fix
    * with three smooth seed-keyed sinusoids still left only ~25 effective
    * bits — phase-neighbor clips landed within hamming 7 and organic
    * pairs kept a quadratic term). Real speech/music is envelope-varying
    * — the fixture now is too: a seeded PIECEWISE level sequence (97
    * segments, each an independent level in [0.3, 1.0] — scale-free in
    * i/n, so any sampleRate/nSamples keeps the same contour shape; 97 is
    * coprime to the fingerprint's 64 median-thresholded windows, so
    * segment and window boundaries never align systematically), multiplied onto the tone
    * mix — each window's energy is then an independent draw and the 64
    * contour bits are ~iid per seed (measured: cross-seed pairs at
    * hamming ≤ 7 drop to zero at 20k sigs). Volume scaling multiplies
    * every window energy by the same v², so the contour comparisons — and
    * the fingerprint's volume invariance — are untouched.
    */
  def synthSamples(seed: Long, sampleRate: Int, nSamples: Int, amp: Double): Array[Double] = {
    val rnd = new java.util.Random(seed * 0x9e3779b97f4a7c15L + 0xa0d10L)
    // CONTINUOUS seed-keyed tone frequencies and phases. The fingerprint's
    // windows are SUB-PERIOD at these clip lengths (12-36 samples of a
    // 200-800 Hz carrier), so window energy is carrier-phase dominated —
    // with the original 17×13 discrete (f1, f2) grid, clips sharing a
    // grid cell shared most contour bits and still paired within
    // hamming 7 (the residual quadratic term after the envelope fix).
    // Continuous frequencies make the carrier contour per-seed too.
    val f1 = 220.0 + rnd.nextDouble() * 380.0
    val f2 = 440.0 + rnd.nextDouble() * 360.0
    val ph1 = rnd.nextDouble() * 2 * math.Pi
    val ph2 = rnd.nextDouble() * 2 * math.Pi
    val levels = Array.fill(97)(0.3 + 0.7 * rnd.nextDouble())
    Array.tabulate(nSamples) { i =>
      val t = i.toDouble / sampleRate
      val env = levels(math.min(96, i * 97 / nSamples))
      amp * env * (0.6 * math.sin(2 * math.Pi * f1 * t + ph1) +
        0.4 * math.sin(2 * math.Pi * f2 * t + ph2))
    }
  }

  // r17: every AudioSystem.getAudioInputStream / AudioSystem.write call
  // resolves its SPI providers through a per-call `static synchronized`
  // registry lookup — with 32 executor threads doing two calls per clip the
  // lock serializes the codec stage (measured: the same q_dedup_audio codec
  // work costs ~28 task-seconds on 8 threads but ~100 on 32, wall barely
  // improving). Resolve the SAME providers ONCE through the public
  // java.util.ServiceLoader SPI and replicate AudioSystem's own first-
  // provider-that-accepts loop; the bytes are still parsed/written by the
  // identical JDK codec classes (WaveFileReader/WaveFileWriter), so output
  // is byte-identical — AudioSpec and the audio dedup oracles pin it. If
  // the loader finds no providers (exotic deployment), fall back to the
  // AudioSystem calls.
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }
  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** AudioSystem.getAudioInputStream over the once-resolved providers:
    * each reader either parses or resets the stream and throws
    * UnsupportedAudioFileException (the SPI contract), exactly as the
    * registry loop behaves.
    */
  private def openAudioStream(is: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
    if (audioReaders.isEmpty) return javax.sound.sampled.AudioSystem.getAudioInputStream(is)
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(is)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException("Stream of unsupported format")
  }

  /** AudioSystem.write for one file type over the once-resolved providers
    * (first writer supporting the type — the registry loop's pick).
    */
  private def writeAudio(
      ais: javax.sound.sampled.AudioInputStream,
      tpe: javax.sound.sampled.AudioFileFormat.Type,
      out: java.io.OutputStream): Unit =
    audioWriters.find(_.isFileTypeSupported(tpe, ais)) match {
      case Some(w) => w.write(ais, tpe, out): Unit
      case None    => javax.sound.sampled.AudioSystem.write(ais, tpe, out): Unit
    }

  def synthWav(seed: Long, sampleRate: Int, nSamples: Int, amp: Double): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0 && amp > 0 && amp <= 1.0, "synthWav: bad params")
    val wave = synthSamples(seed, sampleRate, nSamples, amp)
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = math.max(-32767, math.min(32767, math.round(wave(i) * 32767.0))).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    writeAudio(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: parse the container header and PCM frames via
    * `AudioSystem`. Returns (sampleRate, channels, bitsPerSample, frames,
    * samples normalized to [-1, 1], channels averaged); None for payloads
    * the JDK cannot parse (MP3/OGG/video → the stub seam, exactly like
    * ImageIO's None on exotic codecs). Supports the 8/16-bit PCM shapes
    * WAV actually uses.
    */
  def decodeAudio(media: Array[Byte]): Option[(Int, Int, Int, Long, Array[Double])] =
    try {
      val ais = openAudioStream(new java.io.ByteArrayInputStream(media))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        // The sample-conversion loop below assumes little-endian 16-bit
        // SIGNED and 8-bit UNSIGNED PCM (the shapes WAV actually uses).
        // Anything else AudioSystem can parse — big-endian AIFF/AU,
        // signed 8-bit AIFF — would decode to byte-swapped or offset
        // garbage, so those fall to the flagged stub seam instead.
        val enc = fmt.getEncoding
        val shapeOk =
          (bits == 16 && enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            !fmt.isBigEndian) ||
            (bits == 8 && enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
        if (!shapeOk) None
        else {
          val raw = ais.readAllBytes()
          val bytesPerSample = bits / 8
          val nFrames = raw.length / (bytesPerSample * ch)
          val out = new Array[Double](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * bytesPerSample
              val v =
                if (bits == 16) {
                  val lo = raw(o) & 0xff
                  val hi = raw(o + 1).toInt
                  ((hi << 8) | lo).toShort.toDouble / 32768.0
                } else (raw(o) & 0xff).toDouble / 127.5 - 1.0 // 8-bit WAV is unsigned
              acc += v
              c += 1
            }
            out(f) = acc / ch
            f += 1
          }
          Some((fmt.getSampleRate.toInt, ch, bits, nFrames.toLong, out))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Root-mean-square loudness of a normalized sample buffer. */
  def audioRms(samples: Array[Double]): Double =
    if (samples.isEmpty) 0.0
    else math.sqrt(samples.map(s => s * s).sum / samples.length)

  /** 64-bit energy-profile fingerprint: energy over 64 equal windows,
    * bit w = energy(w) > MEDIAN of the 64 window energies — the audio
    * analogue of [[phash64]]'s median threshold. Median thresholding makes
    * it VOLUME-INVARIANT exactly (scaling every sample scales every window
    * energy AND their median by the same v², preserving comparisons up to
    * quantization noise), so re-levelled copies of a clip fingerprint to
    * within a few bits while different material lands far apart. The
    * first design compared CONSECUTIVE windows (sign-of-delta, the dhash
    * shape) and had a measured degenerate attractor: clips whose
    * half-period-scale windows resonate with the carrier produce a strict
    * high/low/high/low energy alternation regardless of their envelope,
    * so ~0.5% of all clips collapsed onto the single fingerprint
    * 0xAAAA…, that identical-sig group grew linearly with the corpus, and
    * the band self-join's pair output went quadratic (141k pairs at 10k
    * sigs → 556k at 20k). Against the median, an alternating sequence's
    * bits still follow each window's ABSOLUTE level — which the
    * seed-keyed envelope randomizes — so the attractor class disappears:
    * zero exact collisions and a ~2.6e-6 hamming ≤ 7 rate over 12.5M
    * cross-seed pairs (the residual is adjacent-bit run correlation from
    * windows sharing envelope segments — the irreducible floor of any
    * 64-bit sketch at a fixed radius; planted pairs now dominate the
    * table at every measured scale: 5 120 pairs at 10k sigs of which
    * 5 000 planted, vs 141k before).
    */
  def audioFingerprint64(samples: Array[Double]): Long = {
    if (samples.length < 64) return 0L
    val win = samples.length / 64
    val e = new Array[Double](64)
    var w = 0
    while (w < 64) {
      var acc = 0.0
      var i = w * win
      val end = i + win
      while (i < end) { acc += samples(i) * samples(i); i += 1 }
      e(w) = acc
      w += 1
    }
    val sorted = java.util.Arrays.copyOf(e, 64)
    java.util.Arrays.sort(sorted)
    // Lower median (32nd smallest): an ODD split point so exactly-equal
    // halves can't leave a bit pattern that flips wholesale under noise.
    val med = sorted(31)
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (e(b) > med) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** One decoded audio clip's features. */
  case class AudioFeatures(
      doc_id: Long,
      decoded: Boolean,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      rms: Double,
      fingerprint: Long
  )

  /** Executor-side audio feature extraction over a media table — same
    * mapPartitions contract as [[decodeFrames]]: one decode per row,
    * streaming, no shuffle. Real WAV parses feed real features; payloads
    * the JDK cannot decode fall back to deterministic stub features
    * (flagged `decoded = false`) so the pipeline shape survives a mixed
    * corpus.
    */
  def audioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val ds = media.select("doc_id", "media").as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.map { case (docId, payload) =>
        decodeAudio(payload) match {
          case Some((sr, ch, _, frames, samples)) =>
            AudioFeatures(
              docId, decoded = true, sr, ch, frames,
              if (sr > 0) frames * 1000L / sr else 0L,
              audioRms(samples), audioFingerprint64(samples))
          case None =>
            val n = if (payload == null) 0 else payload.length
            AudioFeatures(
              docId, decoded = false, 0, 0, n.toLong, 0L, 0.0,
              // Deterministic stub fingerprint from the payload bytes.
              payload != null match {
                case true  => payload.foldLeft(1125899906842597L)((h, b) => h * 31 + b)
                case false => 0L
              })
        }
      }
    }(Encoders.product[AudioFeatures])
  }
}
