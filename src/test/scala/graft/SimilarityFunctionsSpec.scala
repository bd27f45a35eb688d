package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimilarityFunctions._

class SimilarityFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("shingles yields the w-2 distinct 3-grams") {
    val out = Seq("a b c d e")
      .toDF("text")
      .select(shingles(col("text")).as("sh"))
      .as[Seq[String]]
      .head()
    assert(out == Seq("a b c", "b c d", "c d e"))
  }

  test("minhash signature: identical shingle sets give identical signatures") {
    val df = Seq("x y z w v", "x y z w v", "p q r s t")
      .toDF("text")
      .select(minhashSignature(hashedShingles(shingles(col("text")))).as("sig"))
      .as[Seq[Long]]
      .collect()
    assert(df(0) == df(1))
    assert(df(0) != df(2))
    assert(df(0).length == 64)
    assert(df(0).forall(v => v >= 0 && v < 1000000007L))
  }

  test("near-identical texts agree on most minhash rows, unrelated on few") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 55).map(i => s"w$i").mkString(" ") // 55/60 prefix overlap
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val sigs = Seq(base, near, far)
      .toDF("text")
      .select(minhashSignature(hashedShingles(shingles(col("text")))).as("sig"))
      .as[Seq[Long]]
      .collect()
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(0), sigs(1)) > 40, s"near pair agreed on ${agree(sigs(0), sigs(1))}/64")
    assert(agree(sigs(0), sigs(2)) < 10, s"far pair agreed on ${agree(sigs(0), sigs(2))}/64")
  }

  test("jaccard of distinct-element arrays") {
    val out = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(jaccard(col("x"), col("y")).as("j"))
      .as[Double]
      .head()
    assert(out == 0.5)
  }

  test("hamming distance over sign arrays") {
    val out = Seq((Seq(1L, 0L, 1L, 1L), Seq(1L, 1L, 1L, 0L)))
      .toDF("x", "y")
      .select(hamming(col("x"), col("y")).as("h"))
      .as[Int]
      .head()
    assert(out == 2)
  }

  test("simhash: identical texts identical, disjoint texts differ") {
    val sigs = Seq("aa bb cc dd ee", "aa bb cc dd ee", "zz yy xx ww vv")
      .toDF("text")
      .select(simhashSigns("text").as("s"))
      .as[Seq[Long]]
      .collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 64 && sigs(0).forall(v => v == 0L || v == 1L))
  }

  test("cosine similarity is exact on known vectors") {
    val out = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("x", "y")
      .select(cosine(col("x"), col("y")).as("c"))
      .as[Double]
      .collect()
    assert(out(0) == 0.0)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("lshBucket: same vector same bucket, bucket count bounded by 2^planes") {
    val planes = hyperplanes(4, 8)
    val vecs = (1 to 50).map(i => Seq.fill(8)((i % 7).toFloat + 0.1f * i))
    val buckets = vecs
      .toDF("v")
      .select(lshBucket(col("v"), planes).as("b"))
      .as[String]
      .collect()
    assert(buckets.distinct.length <= 16)
    assert(buckets(0).length == 4)
  }

  test("bind evaluates its argument once per row (plan sanity)") {
    // A bound nondeterministic expression must yield equal values when the
    // binding is referenced twice — proof of single evaluation.
    val out = spark
      .range(100)
      .select(bind(rand(7))(v => (v === v) && (v + 1 > v)).as("ok"))
      .as[Boolean]
      .collect()
    assert(out.forall(identity))
  }
}
