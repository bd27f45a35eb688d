package graft.sources

/** ISO-BMFF (MP4) box-structure parser — the VIDEO arm of the multimodal
  * surface made real at the container level (reference scope: the engine's
  * multimodal family treats media as opaque binary + typed metadata; image
  * and audio decode are real (javax.imageio / javax.sound), video DECODE
  * has no JDK codec — but the CONTAINER is pure byte framing, the WarcLite
  * discipline: 4-byte big-endian size + 4cc type, nested container boxes,
  * leaf payloads sliced byte-exactly). "Lite" = the box framing plus the
  * leaf fields a metadata pipeline actually reads:
  *
  *   - `ftyp`: major brand, minor version, compatible brands,
  *   - `moov/mvhd` (v0 AND v1 FullBox layouts): timescale, duration,
  *   - `moov/trak/tkhd` (v0/v1): track id,
  *   - `moov/trak/mdia/hdlr`: handler type (vide/soun),
  *   - `moov/trak/mdia/minf/stbl/stsd`: entry count + first entry's codec
  *     fourcc,
  *   - `mdat`: payload size only (the codec bitstream stays opaque — that
  *     is the documented decode-stub seam, unchanged).
  *
  * Framing defects fail loudly (truncated header, box overrunning its
  * container, size < 8): corpus integrity over partial salvage. 64-bit
  * `largesize` (size == 1) and size == 0 ("to end of file") are declared
  * out of Lite scope with a named error — at 100 TB those appear on real
  * >4 GiB captures and the parser must say so rather than misparse.
  * Unknown box types are SKIPPED by size, exactly per spec — that is what
  * makes the format forward-compatible.
  */
object Mp4Lite {

  final case class Box(boxType: String, offset: Int, payload: Array[Byte], children: Seq[Box])
  final case class Track(trackId: Long, handler: String, codec: String)
  final case class Meta(
      majorBrand: String,
      minorVersion: Long,
      compatibleBrands: Seq[String],
      mvhdVersion: Int,
      timescale: Long,
      duration: Long,
      tracks: Seq[Track],
      mdatBytes: Long) {
    /** Presentation duration in milliseconds (integer floor — both the
      * fixture and any oracle restatement use exact integer arithmetic). */
    def durationMs: Long = if (timescale == 0) 0L else duration * 1000L / timescale
  }

  private val containers = Set("moov", "trak", "mdia", "minf", "stbl")

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String = new String(b, off, 4, "US-ASCII")

  /** Parse one sibling run of boxes in [from, until). Container boxes
    * recurse; leaves carry their payload bytes. */
  def parseBoxes(b: Array[Byte], from: Int, until: Int): Seq[Box] = {
    val out = Seq.newBuilder[Box]
    var pos = from
    while (pos < until) {
      require(pos + 8 <= until, s"mp4: truncated box header at offset $pos")
      val size = u32(b, pos)
      val t = fourcc(b, pos + 4)
      require(size != 0, s"mp4: box '$t' at $pos uses size=0 (to-EOF) — outside the Lite scope")
      require(size != 1, s"mp4: box '$t' at $pos uses 64-bit largesize — outside the Lite scope")
      require(size >= 8, s"mp4: box '$t' at $pos has illegal size $size")
      val end = pos + size
      require(end <= until, s"mp4: box '$t' at $pos (size $size) overruns its container")
      val kids =
        if (containers(t)) parseBoxes(b, pos + 8, end.toInt)
        else Seq.empty
      val payload =
        if (containers(t)) Array.empty[Byte]
        else java.util.Arrays.copyOfRange(b, pos + 8, end.toInt)
      out += Box(t, pos, payload, kids)
      pos = end.toInt
    }
    out.result()
  }

  /** Extract the metadata table row from one MP4 byte blob. */
  def parse(bytes: Array[Byte]): Meta = {
    val boxes = parseBoxes(bytes, 0, bytes.length)
    require(boxes.nonEmpty && boxes.head.boxType == "ftyp",
      s"mp4: stream must open with ftyp (got ${boxes.headOption.map(_.boxType)})")
    val ftyp = boxes.head.payload
    require(ftyp.length >= 8, "mp4: ftyp payload too short")
    val brands = (8 until ftyp.length by 4).takeWhile(_ + 4 <= ftyp.length)
      .map(o => fourcc(ftyp, o))

    val moov = boxes.find(_.boxType == "moov")
      .getOrElse(throw new IllegalArgumentException("mp4: no moov box"))
    val mvhd = moov.children.find(_.boxType == "mvhd")
      .getOrElse(throw new IllegalArgumentException("mp4: no moov/mvhd box"))
    val mv = mvhd.payload
    val mvhdVersion = mv(0) & 0xff
    val (timescale, duration) = mvhdVersion match {
      case 0 => (u32(mv, 12), u32(mv, 16))
      case 1 => (u32(mv, 20), u64(mv, 24))
      case v => throw new IllegalArgumentException(s"mp4: mvhd version $v")
    }

    val tracks = moov.children.filter(_.boxType == "trak").map { trak =>
      val tk = trak.children.find(_.boxType == "tkhd")
        .getOrElse(throw new IllegalArgumentException("mp4: trak without tkhd")).payload
      val trackId = (tk(0) & 0xff) match {
        case 0 => u32(tk, 12)
        case 1 => u32(tk, 20)
        case v => throw new IllegalArgumentException(s"mp4: tkhd version $v")
      }
      val mdia = trak.children.find(_.boxType == "mdia")
        .getOrElse(throw new IllegalArgumentException("mp4: trak without mdia"))
      val handler = mdia.children.find(_.boxType == "hdlr")
        .map(h => fourcc(h.payload, 8))
        .getOrElse(throw new IllegalArgumentException("mp4: mdia without hdlr"))
      val codec = (for {
        minf <- mdia.children.find(_.boxType == "minf")
        stbl <- minf.children.find(_.boxType == "stbl")
        stsd <- stbl.children.find(_.boxType == "stsd")
        if u32(stsd.payload, 4) >= 1 && stsd.payload.length >= 16
      } yield fourcc(stsd.payload, 12))
        .getOrElse(throw new IllegalArgumentException("mp4: track without an stsd entry"))
      Track(trackId, handler, codec)
    }

    val mdatBytes = boxes.filter(_.boxType == "mdat").map(_.payload.length.toLong).sum
    Meta(fourcc(ftyp, 0), u32(ftyp, 4), brands, mvhdVersion, timescale, duration, tracks, mdatBytes)
  }

  // ---- write half (fixture synthesis + the container's egress seam) ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Assemble one box (size header derived — the WarcLite.write rule). */
  def box(boxType: String, payload: Array[Byte]): Array[Byte] = {
    require(boxType.length == 4, s"mp4: box type must be a 4cc: $boxType")
    be32(8L + payload.length) ++ boxType.getBytes("US-ASCII") ++ payload
  }

  def container(boxType: String, children: Array[Byte]*): Array[Byte] =
    box(boxType, children.flatten.toArray)

  /** A full v0/v1 `mvhd` payload with only timescale/duration set (other
    * fields zeroed — rate/volume/matrix are presentation hints the
    * metadata row does not read). */
  def mvhdPayload(version: Int, timescale: Long, duration: Long): Array[Byte] = version match {
    case 0 =>
      val p = new Array[Byte](100)
      System.arraycopy(be32(timescale), 0, p, 12, 4)
      System.arraycopy(be32(duration), 0, p, 16, 4)
      p
    case 1 =>
      val p = new Array[Byte](112)
      p(0) = 1
      System.arraycopy(be32(timescale), 0, p, 20, 4)
      System.arraycopy(be32(duration >>> 32), 0, p, 24, 4)
      System.arraycopy(be32(duration & 0xffffffffL), 0, p, 28, 4)
      p
  }

  def tkhdPayload(version: Int, trackId: Long): Array[Byte] = version match {
    case 0 =>
      val p = new Array[Byte](84)
      System.arraycopy(be32(trackId), 0, p, 12, 4)
      p
    case 1 =>
      val p = new Array[Byte](96)
      p(0) = 1
      System.arraycopy(be32(trackId), 0, p, 20, 4)
      p
  }

  def hdlrPayload(handler: String): Array[Byte] = {
    val p = new Array[Byte](25) // fullbox(4) + pre_defined(4) + 4cc + reserved(12) + NUL name
    System.arraycopy(handler.getBytes("US-ASCII"), 0, p, 8, 4)
    p
  }

  def stsdPayload(codec: String): Array[Byte] = {
    val entry = box(codec, new Array[Byte](8)) // minimal sample entry; codec 4cc is the read field
    val head = new Array[Byte](8)              // fullbox(4) + entry_count(4)
    System.arraycopy(be32(1L), 0, head, 4, 4)
    head ++ entry
  }

  def ftypPayload(major: String, minor: Long, brands: Seq[String]): Array[Byte] =
    major.getBytes("US-ASCII") ++ be32(minor) ++ brands.flatMap(_.getBytes("US-ASCII"))
}
