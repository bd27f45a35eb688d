package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand byte cases for the charset-detection cascade (the SAME
  * TextQueries.charsetCascade the registered query runs): every arm of the
  * BOM → structural-UTF-8 → fallback decision, including the UTF-16BE
  * branch the corpus fixture never plants, stated as explicit hex.
  */
class CharsetDetectSpec extends AnyFunSuite with SparkSpec {

  private def detect(hexBytes: String): (String, Boolean, String) = {
    val row = spark.range(1)
      .select(TextQueries.charsetCascade(unhex(lit(hexBytes))).as("d"))
      .select(col("d.bom"), col("d.valid_utf8"), col("d.charset"))
      .head()
    (row.getString(0), row.getBoolean(1), row.getString(2))
  }

  test("BOM arms: UTF-8 BOM, UTF-16LE and UTF-16BE BOMs win over payload validity") {
    assert(detect("EFBBBF41") == (("utf-8", true, "utf-8"))) // BOM + 'A'
    // UTF-16LE 'hi' — payload 680069 00 is structurally valid UTF-8 (NULs
    // legal), which is exactly why the BOM must decide first.
    assert(detect("FFFE68006900") == (("utf-16", true, "utf-16le")))
    assert(detect("FEFF00680069") == (("utf-16", true, "utf-16be")))
  }

  test("structural arms: valid multibyte passes; overlong/truncated/stray bytes fall back") {
    assert(detect("68C3A9") == ((null, true, "utf-8"))) // h + é, no BOM
    assert(detect("68C0A0") == ((null, false, "windows-1252"))) // overlong space
    assert(detect("68C3") == ((null, false, "windows-1252"))) // truncated lead
    assert(detect("68E9") == ((null, false, "windows-1252"))) // stray Latin-1 é
    assert(detect("68A0") == ((null, false, "windows-1252"))) // bare continuation
  }

  test("a BOM'd but corrupt payload keeps the BOM verdict and reports invalidity honestly") {
    // Real crawls ship these: the BOM says utf-8, the payload lost bytes.
    // The cascade trusts the BOM for charset but valid_utf8 carries the
    // evidence downstream (q_encoding_artifacts territory).
    assert(detect("EFBBBF68C0A0") == (("utf-8", false, "utf-8")))
  }
}
