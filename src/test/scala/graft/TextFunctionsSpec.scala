package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).as[T].head()

  test("tokenCount counts whitespace tokens") {
    assert(one[Int](tokenCount(col("text")), "the quick  brown\tfox") == 4)
  }

  test("regexTokenCount splits alpha runs, digits, punctuation") {
    // "ab12,c" -> [ab] [1] [2] [,] [c]
    assert(one[Int](regexTokenCount(col("text")), "ab12,c") == 5)
  }

  test("alphaRatio and punctRatio") {
    assert(one[Double](alphaRatio(col("text")), "ab.,") == 0.5)
    assert(one[Double](punctRatio(col("text")), "ab.,") == 0.5)
  }

  test("langId picks the dominant marker language, und when none") {
    assert(one[String](langId(col("text")), "the cat and the dog is here") == "en")
    assert(one[String](langId(col("text")), "der hund und die katze ist da") == "de")
    assert(one[String](langId(col("text")), "xyzzy plugh") == "und")
  }

  test("docFingerprint is deterministic and word-order sensitive") {
    val a = one[Long](docFingerprint(col("text")), "hello world foo")
    val b = one[Long](docFingerprint(col("text")), "hello world foo")
    val c = one[Long](docFingerprint(col("text")), "foo world hello")
    assert(a == b)
    assert(a != c)
    assert(a >= 0 && a < 1000000007L)
  }

  test("stopwordRatio on a half-stopword sentence") {
    assert(one[Double](stopwordRatio(col("text")), "the dog") == 0.5)
  }
}
