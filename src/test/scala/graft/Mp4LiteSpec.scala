package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Mp4Lite
import graft.sources.Mp4Lite._

/** Hand cases for the ISO-BMFF box parser: framing (nesting, unknown-box
  * skip, loud failure on every defect), both FullBox version layouts, the
  * track walk, and the write→parse fixture identity q_mp4_meta rides.
  */
class Mp4LiteSpec extends AnyFunSuite {

  private def minimal(
      mvhdV: Int = 0,
      tkhdV: Int = 0,
      timescale: Long = 1000,
      duration: Long = 5000): Array[Byte] =
    box("ftyp", ftypPayload("isom", 512, Seq("isom", "mp41"))) ++
      container(
        "moov",
        box("mvhd", mvhdPayload(mvhdV, timescale, duration)),
        container(
          "trak",
          box("tkhd", tkhdPayload(tkhdV, 7)),
          container(
            "mdia",
            box("hdlr", hdlrPayload("vide")),
            container("minf", container("stbl", box("stsd", stsdPayload("avc1"))))))) ++
      box("mdat", Array[Byte](1, 2, 3))

  test("minimal one-track file parses: brand, clock, track walk, mdat size") {
    val m = Mp4Lite.parse(minimal())
    assert(m.majorBrand == "isom" && m.minorVersion == 512)
    assert(m.compatibleBrands == Seq("isom", "mp41"))
    assert(m.timescale == 1000 && m.duration == 5000 && m.durationMs == 5000)
    assert(m.tracks == Seq(Track(7, "vide", "avc1")))
    assert(m.mdatBytes == 3)
  }

  test("FullBox v1 layouts read the shifted field offsets") {
    val m = Mp4Lite.parse(minimal(mvhdV = 1, tkhdV = 1, timescale = 90000, duration = 450000))
    assert(m.mvhdVersion == 1)
    assert(m.timescale == 90000 && m.duration == 450000 && m.durationMs == 5000)
    assert(m.tracks.head.trackId == 7)
  }

  test("unknown box types are skipped by size (forward compatibility)") {
    val ftypLen = box("ftyp", ftypPayload("isom", 512, Seq("isom", "mp41"))).length
    val withFree =
      box("ftyp", ftypPayload("isom", 0, Nil)) ++
        box("wide", Array.fill(11)(0x55.toByte)) ++ // unknown-to-reader
        minimal().drop(ftypLen)                     // the moov+mdat tail
    val m = Mp4Lite.parse(withFree)
    assert(m.tracks.size == 1 && m.timescale == 1000 && m.mdatBytes == 3)
  }

  test("two-track files walk every trak in order") {
    val two =
      box("ftyp", ftypPayload("isom", 0, Nil)) ++
        container(
          "moov",
          box("mvhd", mvhdPayload(0, 1000, 100)),
          container(
            "trak",
            box("tkhd", tkhdPayload(0, 1)),
            container("mdia", box("hdlr", hdlrPayload("vide")),
              container("minf", container("stbl", box("stsd", stsdPayload("avc1")))))),
          container(
            "trak",
            box("tkhd", tkhdPayload(1, 2)),
            container("mdia", box("hdlr", hdlrPayload("soun")),
              container("minf", container("stbl", box("stsd", stsdPayload("mp4a")))))))
    val m = Mp4Lite.parse(two)
    assert(m.tracks == Seq(Track(1, "vide", "avc1"), Track(2, "soun", "mp4a")))
    assert(m.mdatBytes == 0)
  }

  test("framing defects fail loudly: truncation, overrun, bad size, largesize, no-ftyp") {
    def bad(b: Array[Byte]) = intercept[IllegalArgumentException](Mp4Lite.parse(b))
    val ok = minimal()
    bad(ok.dropRight(1))                                // last box overruns
    bad(ok ++ Array[Byte](0, 0, 0, 9))                  // truncated trailing header
    bad(box("mdat", Array.empty) ++ ok)                 // does not open with ftyp
    val tiny = box("ftyp", ftypPayload("isom", 0, Nil))
    bad(tiny ++ Array[Byte](0, 0, 0, 4, 'f', 'r', 'e', 'e'))      // size < 8
    bad(tiny ++ Array[Byte](0, 0, 0, 1, 'm', 'd', 'a', 't'))      // largesize out of scope
    bad(tiny ++ Array[Byte](0, 0, 0, 0, 'm', 'd', 'a', 't'))      // size 0 out of scope
  }

  test("the q_mp4_meta fixture round-trips its generator parameters") {
    for (k <- 0L to 12L) {
      val m = Mp4Lite.parse(SimilarityQueries.mp4Fixture(k))
      assert(m.mvhdVersion == (k % 2).toInt)
      assert(m.durationMs == 1000 + (k * 37) % 90000)
      assert(m.tracks.map(_.handler) ==
        (if (k % 3 == 0) Seq("vide") else Seq("vide", "soun")))
      assert(m.mdatBytes == k % 50 + 1)
    }
  }
}
