package graft.sources

/** WARC-record parser (ISO 28500 / the Common Crawl container format) —
  * the crawl family's CONTAINER input: robots.txt said what MAY be fetched,
  * the sitemap what the site advertises, the frontier what the link graph
  * wants — a crawler's OUTPUT is a stream of WARC records, and a training
  * pipeline's first ingest step is exactly this parse. "Lite" = the
  * version/header/payload framing of the spec (the part that determines
  * record boundaries and therefore corpus integrity), not the full
  * registry of defined header semantics:
  *
  *   - records start with a `WARC/<version>` magic line; anything else
  *     fails loudly (untrusted input — resynchronizing silently would hide
  *     corruption and mis-attribute payload bytes to the wrong URL),
  *   - named headers (`Name: value`, case-preserved names, first-colon
  *     split) up to the first blank line,
  *   - a payload of EXACTLY `Content-Length` BYTES — the defining property
  *     of the format: payloads are binary-safe because framing is
  *     length-driven, never delimiter-driven, so a payload containing
  *     `\r\n\r\n` (or another record's magic) must parse intact,
  *   - a closing `\r\n\r\n` after every payload, then the next record or
  *     end of stream.
  *
  * Parsing is byte-exact (`Array[Byte]`, ASCII header decode, payload
  * returned as raw bytes): Content-Length counts octets, and a parser that
  * slices by characters corrupts every multi-byte document after the first.
  */
object WarcLite {

  final case class Record(headers: Map[String, String], payload: Array[Byte]) {
    def header(name: String): Option[String] = headers.get(name)
  }

  private val crlfCrlf = Array[Byte]('\r', '\n', '\r', '\n')

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Serialize records as one concatenated WARC stream — the write half of
    * the container round trip (Common Crawl pipelines WRITE warc too; the
    * parse half alone covers only ingest). Byte-exact mirror of [[parse]]:
    * `WARC/1.0` magic, `Name: value` headers (sorted by name so the stream
    * is deterministic regardless of Map iteration order), a derived
    * `Content-Length` counting payload OCTETS, CRLFCRLF, the payload's raw
    * bytes, CRLFCRLF. Callers must not supply Content-Length (it is framing,
    * derived from the payload — a caller-supplied lie would corrupt every
    * record after it), and header names/values must be CR/LF-free (names
    * also colon-free) or the record could not re-parse — both fail loudly.
    */
  def write(records: Seq[Record]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      require(!r.headers.keys.exists(_.equalsIgnoreCase("Content-Length")),
        "WARC write: Content-Length is derived from the payload, not caller-supplied")
      r.headers.foreach { case (k, v) =>
        require(k.nonEmpty && !k.exists(c => c == '\r' || c == '\n' || c == ':'),
          s"WARC write: illegal header name: $k")
        require(!v.exists(c => c == '\r' || c == '\n'),
          s"WARC write: header value for $k contains CR/LF")
      }
      val sb = new StringBuilder("WARC/1.0\r\n")
      r.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb.append(k).append(": ").append(v).append("\r\n")
      }
      sb.append("Content-Length: ").append(r.payload.length).append("\r\n\r\n")
      out.write(sb.toString.getBytes("US-ASCII"))
      out.write(r.payload)
      out.write(crlfCrlf)
    }
    out.toByteArray
  }

  /** Parse a concatenated record stream. Malformed framing (bad magic, a
    * header line without a colon, a missing/non-numeric Content-Length, a
    * payload running past the stream, or a missing record terminator)
    * throws — corpus integrity over partial salvage, the SitemapXml
    * discipline.
    */
  def parse(stream: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var pos = 0
    while (pos < stream.length) {
      val headerEnd = indexOf(stream, crlfCrlf, pos)
      require(headerEnd >= 0, s"WARC: record at offset $pos has no header terminator")
      val headerBlock = new String(stream, pos, headerEnd - pos, "US-ASCII")
      val lines = headerBlock.split("\r\n", -1)
      require(lines.head.startsWith("WARC/"),
        s"WARC: record at offset $pos lacks the WARC/ magic (got: ${lines.head.take(20)})")
      val headers = lines.tail.map { l =>
        val c = l.indexOf(':')
        require(c > 0, s"WARC: malformed header line at offset $pos: $l")
        l.substring(0, c).trim -> l.substring(c + 1).trim
      }.toMap
      // Case-insensitive lookup for the ONE framing-critical header: WARC
      // header names are case-insensitive (ISO 28500 §5.1 inherits RFC 822
      // field-name rules), and a conformant record spelling it
      // "content-length" must frame, not throw. Other headers keep their
      // case-preserved names — only framing gets the relaxed lookup.
      val len = headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Content-Length") => v
      }.flatMap(_.toIntOption)
      require(len.nonEmpty, s"WARC: record at offset $pos has no numeric Content-Length")
      val payloadStart = headerEnd + 4
      val payloadEnd = payloadStart + len.get
      require(payloadEnd + 4 <= stream.length,
        s"WARC: record at offset $pos overruns the stream (Content-Length ${len.get})")
      require(
        stream(payloadEnd) == '\r' && stream(payloadEnd + 1) == '\n' &&
          stream(payloadEnd + 2) == '\r' && stream(payloadEnd + 3) == '\n',
        s"WARC: record at offset $pos is not terminated by CRLFCRLF after its payload")
      out += Record(headers, java.util.Arrays.copyOfRange(stream, payloadStart, payloadEnd))
      pos = payloadEnd + 4
    }
    out.result()
  }
}
