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

  test("shingles: short docs yield empty, repeats dedup, whitespace runs collapse") {
    val out = Seq("a b", "x y z x y z x y z", "  p\t q\n r  ")
      .toDF("text")
      .select(shingles(col("text")).as("sh"))
      .as[Seq[String]]
      .collect()
    assert(out(0) == Seq.empty)
    assert(out(1) == Seq("x y z", "y z x", "z x y"))
    assert(out(2) == Seq("p q r"))
  }

  test("hashedShingles matches xxhash64(shingle) mod P") {
    val expected = Seq("a b c d e")
      .toDF("text")
      .select(transform(shingles(col("text")), x => pmod(xxhash64(x), lit(P))).as("h"))
      .as[Seq[Long]]
      .head()
    val got = Seq("a b c d e")
      .toDF("text")
      .select(hashedShingles(col("text")).as("h"))
      .as[Seq[Long]]
      .head()
    assert(got == expected)
    assert(got.forall(v => v >= 0 && v < P))
  }

  test("minhash signature: identical shingle sets give identical signatures") {
    val df = Seq("x y z w v", "x y z w v", "p q r s t")
      .toDF("text")
      .select(minhashSignature(hashedShingles(col("text"))).as("sig"))
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
      .select(minhashSignature(hashedShingles(col("text"))).as("sig"))
      .as[Seq[Long]]
      .collect()
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(0), sigs(1)) > 40, s"near pair agreed on ${agree(sigs(0), sigs(1))}/64")
    assert(agree(sigs(0), sigs(2)) < 10, s"far pair agreed on ${agree(sigs(0), sigs(2))}/64")
  }

  test("minhash bands: 16 bands; equal sigs share all, near sigs share some") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 55).map(i => s"w$i").mkString(" ")
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val bands = Seq(base, base, near, far)
      .toDF("text")
      .select(minhashBands(hashedShingles(col("text"))).as("b"))
      .as[Seq[Long]]
      .collect()
    def shared(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(bands(0).length == 16)
    assert(shared(bands(0), bands(1)) == 16)
    assert(shared(bands(0), bands(2)) > 0, "near-dup pair must land in a shared band")
    assert(shared(bands(0), bands(3)) == 0)
  }

  test("jaccard of distinct-element arrays") {
    val out = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(jaccard(col("x"), col("y")).as("j"))
      .as[Double]
      .head()
    assert(out == 0.5)
  }

  test("simhash64: identical texts identical, disjoint texts differ; hammingPacked counts bit flips") {
    val sigs = Seq("aa bb cc dd ee", "aa bb cc dd ee", "zz yy xx ww vv")
      .toDF("text")
      .select(simhash64(col("text")).as("s"))
      .as[Long]
      .collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    val h = Seq((sigs(0), sigs(0)), (0L, -1L), (5L, 6L))
      .toDF("x", "y")
      .select(hammingPacked(col("x"), col("y")).as("h"))
      .as[Int]
      .collect()
    assert(h(0) == 0)
    assert(h(1) == 64)
    assert(h(2) == 2) // 101 xor 110 = 011
  }

  test("simhash byte bands cover hamming-close pairs (pigeonhole)") {
    val bands = Seq("aa bb cc dd ee")
      .toDF("text")
      .select(simhashByteBands(simhash64(col("text"))).as("b"))
      .as[Seq[Long]]
      .head()
    assert(bands.length == 8)
    assert(bands.forall(v => v >= 0 && v <= 255))
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

  test("cosine matches the interpreted zip_with/aggregate fold on doubles") {
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")), lit(0.0), _ + _)
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    }
    val vecs = Seq(
      (Seq(0.3f, -1.2f, 4.5f, 0.01f), Seq(2.0f, 0.5f, -0.25f, 3.125f)),
      (Seq(1.5f, 2.25f, -0.75f, 8.0f), Seq(-1.0f, 0.125f, 6.5f, 0.5f))
    )
    val both = vecs
      .toDF("x", "y")
      .select(cosine(col("x"), col("y")).as("native"), hofCosine(col("x"), col("y")).as("hof"))
      .as[(Double, Double)]
      .collect()
    both.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
  }

  test("lshBucket: same vector same bucket, bucket id bounded by 2^planes") {
    val planes = hyperplanes(4, 8)
    val vecs = (1 to 50).map(i => Seq.fill(8)((i % 7).toFloat + 0.1f * i))
    val buckets = vecs
      .toDF("v")
      .select(lshBucket(col("v"), planes).as("b"))
      .as[Long]
      .collect()
    assert(buckets.distinct.length <= 16)
    assert(buckets.forall(b => b >= 0 && b < 16))
  }

  test("native sketch functions are SQL-callable via GraftExtensions") {
    val out = spark
      .sql("SELECT simhash64('aa bb cc') AS s, cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[(Long, Double)]
      .head()
    val direct = Seq("aa bb cc").toDF("t").select(simhash64(col("t"))).as[Long].head()
    assert(out._1 == direct)
    assert(out._2 == 1.0)

    // word_rep_stats: 'aa aa bb' → top share 2/3, dup fraction 1/3.
    val rep = spark
      .sql("SELECT word_rep_stats('aa aa bb') AS r")
      .selectExpr("r[0]", "r[1]")
      .as[(Double, Double)]
      .head()
    assert(math.abs(rep._1 - 2.0 / 3) < 1e-12 && math.abs(rep._2 - 1.0 / 3) < 1e-12)

    // Round-5 kernels: entropy of 4 distinct chars = ln 4; 'the table'
    // fully merges to 2 BPE tokens; 32-char windows of a 33-char string = 2.
    val r5 = spark
      .sql("""SELECT char_entropy('abcd') AS e, bpe_token_count('the table') AS b,
             |       size(char_window_hashes64(repeat('x', 16) || repeat('y', 17))) AS w
             |""".stripMargin.replace("\n", " "))
      .as[(Double, Int, Int)]
      .head()
    assert(math.abs(r5._1 - math.log(4)) < 1e-12)
    assert(r5._2 == 2)
    assert(r5._3 == 2)

    // Round-7 kernel: boilerplate compresses hard through the SQL surface.
    val r7 = spark
      .sql("SELECT deflate_ratio(repeat('spam ', 400)) AS r")
      .as[Double]
      .head()
    assert(r7 > 0.0 && r7 < 0.05)
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
