package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcLite

/** Hand cases for the WARC framing parser: length-driven binary safety
  * (the format's defining property), byte-exact multibyte payloads,
  * multi-record streams, and loud failure on every framing defect.
  */
class WarcLiteSpec extends AnyFunSuite {

  private def rec(uri: String, payload: String, extra: String = ""): String = {
    val bytes = payload.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"${extra}Content-Length: $bytes\r\n\r\n$payload\r\n\r\n"
  }

  test("multi-record stream parses in order with case-preserved headers") {
    val stream = (rec("http://h/a", "alpha") + rec("http://h/b", "beta")).getBytes("UTF-8")
    val rs = WarcLite.parse(stream)
    assert(rs.map(_.header("WARC-Target-URI")) == Seq(Some("http://h/a"), Some("http://h/b")))
    assert(rs.map(r => new String(r.payload, "UTF-8")) == Seq("alpha", "beta"))
    assert(rs.head.header("WARC-Type").contains("response"))
  }

  test("binary safety: payloads containing CRLFCRLF and fake magic parse intact") {
    // Framing is Content-Length-driven — a delimiter-driven parser would
    // split this payload at the embedded blank line or resync on the fake
    // magic, mis-attributing bytes to a phantom record.
    val evil = "part1\r\n\r\nWARC/1.0\r\npart2"
    val rs = WarcLite.parse((rec("http://h/x", evil) + rec("http://h/y", "tail")).getBytes("UTF-8"))
    assert(rs.size == 2)
    assert(new String(rs.head.payload, "UTF-8") == evil)
    assert(new String(rs(1).payload, "UTF-8") == "tail")
  }

  test("Content-Length counts OCTETS: multibyte payloads slice byte-exactly") {
    val multi = "café 💡" // é = 2 bytes, the emoji = 4
    val rs = WarcLite.parse(rec("http://h/m", multi).getBytes("UTF-8"))
    assert(rs.size == 1 && new String(rs.head.payload, "UTF-8") == multi)
    assert(rs.head.payload.length == multi.getBytes("UTF-8").length)
  }

  test("Content-Length lookup is case-insensitive (header names are RFC-822 style)") {
    // A conformant writer may spell the framing header any case; only the
    // LOOKUP relaxes — names stay case-preserved for the caller.
    val raw = "WARC/1.0\r\nWARC-Type: response\r\ncontent-length: 4\r\n\r\nbody\r\n\r\n"
    val rs = WarcLite.parse(raw.getBytes("UTF-8"))
    assert(rs.size == 1 && new String(rs.head.payload, "UTF-8") == "body")
    assert(rs.head.headers.contains("content-length"), "original spelling preserved")
  }

  test("empty payloads are legal records") {
    val rs = WarcLite.parse(rec("http://h/e", "").getBytes("UTF-8"))
    assert(rs.size == 1 && rs.head.payload.isEmpty)
  }

  test("write→parse round trip is the identity, including binary-hostile payloads") {
    val payloads = Seq(
      "plain", "", "part1\r\n\r\nWARC/1.0\r\npart2", "café 💡",
      new String(Array[Char](0, 1, 31, 127)) // control bytes survive length framing
    )
    val recs = payloads.zipWithIndex.map { case (p, i) =>
      WarcLite.Record(
        Map("WARC-Type" -> "response", "WARC-Target-URI" -> s"http://h/$i"),
        p.getBytes("UTF-8"))
    }
    val back = WarcLite.parse(WarcLite.write(recs))
    assert(back.map(r => new String(r.payload, "UTF-8")) == payloads)
    assert(back.map(_.header("WARC-Target-URI").get) == payloads.indices.map(i => s"http://h/$i"))
    assert(back.forall(_.header("WARC-Type").contains("response")))
  }

  test("write is byte-deterministic: header order does not depend on Map iteration") {
    val a = Map("B-Header" -> "2", "A-Header" -> "1", "WARC-Type" -> "x")
    val b = Map("WARC-Type" -> "x", "A-Header" -> "1", "B-Header" -> "2")
    val wa = WarcLite.write(Seq(WarcLite.Record(a, "p".getBytes)))
    val wb = WarcLite.write(Seq(WarcLite.Record(b, "p".getBytes)))
    assert(java.util.Arrays.equals(wa, wb))
  }

  test("write rejects caller-supplied Content-Length and unframeable header text") {
    def bad(r: WarcLite.Record) = intercept[IllegalArgumentException](WarcLite.write(Seq(r)))
    bad(WarcLite.Record(Map("Content-Length" -> "3"), "abc".getBytes))
    bad(WarcLite.Record(Map("content-length" -> "3"), "abc".getBytes)) // any case
    bad(WarcLite.Record(Map("Bad:Name" -> "v"), Array.empty))
    bad(WarcLite.Record(Map("Name" -> "line1\r\nline2"), Array.empty))
    bad(WarcLite.Record(Map("" -> "v"), Array.empty))
  }

  test("framing defects fail loudly: magic, header colon, length, overrun, terminator") {
    def bad(s: String) = intercept[IllegalArgumentException](WarcLite.parse(s.getBytes("UTF-8")))
    bad("HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n\r\n\r\n") // no magic
    bad("WARC/1.0\r\nNoColonHere\r\nContent-Length: 0\r\n\r\n\r\n\r\n") // colon-less header
    bad("WARC/1.0\r\nContent-Length: many\r\n\r\n\r\n\r\n") // non-numeric length
    bad("WARC/1.0\r\n\r\n") // no Content-Length at all
    bad("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n") // payload overruns stream
    bad(rec("http://h/t", "ok").dropRight(1)) // truncated terminator
  }
}
