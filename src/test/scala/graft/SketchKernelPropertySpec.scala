package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchImpl

/** Property tests for the compiled sketch kernels against straight-line
  * reference implementations (String.split / sliding windows / plain folds).
  * The kernels operate on unsafe byte formats with hand-rolled tokenization —
  * exactly the code most likely to harbor boundary bugs, so it gets
  * randomized coverage. (scalacheck Gen driven directly with fixed seeds —
  * deterministic, no scalatestplus bridge needed.)
  */
class SketchKernelPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val wsGen = Gen.nonEmptyListOf(Gen.oneOf(' ', ' ', '\t', '\n', '\r', '\f')).map(_.mkString)
  private val textGen: Gen[String] = for {
    words <- Gen.listOf(wordGen)
    seps <- Gen.listOfN(words.length + 1, wsGen)
    lead <- Gen.oneOf("", " ", "\t ")
  } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString

  private def refTokens(s: String): Array[String] =
    s.trim.split("\\s+").filter(_.nonEmpty)

  private def refShingles(s: String, n: Int): Seq[String] = {
    val t = refTokens(s)
    if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).distinct.toSeq
  }

  test("shingleNGrams matches trim/split/sliding/distinct on arbitrary whitespace") {
    for {
      s <- samples(textGen, 300)
      n <- 1 to 4
    } {
      val got = SketchImpl
        .shingleNGrams(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString)
        .toSeq
      assert(got == refShingles(s, n), s"text=${s.replace("\n", "\\n")} n=$n")
    }
  }

  test("hashedShingles ∈ [0,P), deduplicated, same cardinality as string shingles") {
    for (s <- samples(textGen, 300)) {
      val hs = SketchImpl.hashedShingles(UTF8String.fromString(s), 3)
      val arr = (0 until hs.numElements()).map(hs.getLong)
      assert(arr.forall(v => v >= 0 && v < SketchImpl.P))
      assert(arr.distinct.length == arr.length, "hashed shingles must be de-duplicated")
      assert(arr.length == refShingles(s, 3).length)
    }
  }

  test("hashedShingles64: deduplicated, full 64-bit range, mod-P of it equals hashedShingles") {
    for (s <- samples(textGen, 300)) {
      val h64 = SketchImpl.hashedShingles64(UTF8String.fromString(s), 3)
      val arr64 = (0 until h64.numElements()).map(h64.getLong)
      assert(arr64.distinct.length == arr64.length, "64-bit shingles must be de-duplicated")
      assert(arr64.length == refShingles(s, 3).length)
      // Same underlying xxhash64 stream: reducing mod P reproduces the
      // minhash-domain form (up to its own mod-P dedup collapsing).
      val hp = SketchImpl.hashedShingles(UTF8String.fromString(s), 3)
      val arrP = (0 until hp.numElements()).map(hp.getLong)
      assert(arr64.map(v => ((v % SketchImpl.P) + SketchImpl.P) % SketchImpl.P).distinct.sorted == arrP.sorted)
    }
  }

  test("simhash64 ignores vote magnitude: tripling every token leaves the sketch unchanged") {
    for (words <- samples(Gen.nonEmptyListOf(wordGen), 200)) {
      val base = words.mkString(" ")
      val tripled = (words ++ words ++ words).mkString(" ")
      val h1 = SketchImpl.simhash64(UTF8String.fromString(base))
      val h3 = SketchImpl.simhash64(UTF8String.fromString(tripled))
      assert(h1 == h3, s"simhash must depend on vote signs, not magnitudes: $base")
    }
  }

  test("minhash signature: each seat is the min of the seat-hash over the shingle set") {
    def seatHash(j: Int, x: Long): Long = {
      val v = (2L * j + 1L) * x + j * 12582917L
      ((v % SketchImpl.P) + SketchImpl.P) % SketchImpl.P
    }
    for (hs0 <- samples(Gen.nonEmptyListOf(Gen.choose(0L, SketchImpl.P - 1)), 200)) {
      val hs = hs0.distinct
      val sig = SketchImpl.minhashSignature(ArrayData.toArrayData(hs.toArray), 64)
      for (j <- 0 until 64) {
        assert(sig.getLong(j) == hs.map(seatHash(j, _)).min)
      }
    }
  }

  test("minhash containment: adding shingles can only lower each seat") {
    val g = for {
      a <- Gen.nonEmptyListOf(Gen.choose(0L, SketchImpl.P - 1))
      extra <- Gen.listOf(Gen.choose(0L, SketchImpl.P - 1))
    } yield (a, extra)
    for ((a, extra) <- samples(g, 200)) {
      val sigA = SketchImpl.minhashSignature(ArrayData.toArrayData(a.distinct.toArray), 64)
      val sigAB = SketchImpl.minhashSignature(ArrayData.toArrayData((a ++ extra).distinct.toArray), 64)
      for (j <- 0 until 64) assert(sigAB.getLong(j) <= sigA.getLong(j))
    }
  }

  test("cosine: scale invariance, symmetry, |cos| <= 1") {
    val vecGen = Gen.choose(2, 64).flatMap(d => Gen.listOfN(d, Gen.choose(-100.0, 100.0)))
    val g = for { v <- vecGen; k <- Gen.choose(0.1, 10.0) } yield (v, k)
    for ((v, k) <- samples(g, 300) if v.exists(_ != 0.0)) {
      val a = ArrayData.toArrayData(v.toArray)
      val b = ArrayData.toArrayData(v.map(_ * k).toArray)
      assert(math.abs(SketchImpl.cosine(a, b, false, false) - 1.0) < 1e-9, "cos(v, k*v) must be 1")
      val x = ArrayData.toArrayData(v.reverse.toArray)
      val xy = SketchImpl.cosine(a, x, false, false)
      val yx = SketchImpl.cosine(x, a, false, false)
      assert(math.abs(xy - yx) < 1e-12, "cosine must be symmetric")
      assert(math.abs(xy) <= 1.0 + 1e-9)
    }
  }

  test("lshBucket: deterministic, bounded by 2^planes, negation flips every decisive plane") {
    val dim = 8
    val planes = graft.functions.SimilarityFunctions.hyperplanes(4, dim)
    val flat = planes.flatten.toArray
    for (v <- samples(Gen.listOfN(dim, Gen.choose(-10.0, 10.0)), 300)) {
      val dots = planes.map(p => p.zip(v).map { case (w, x) => w * x }.sum)
      val a = ArrayData.toArrayData(v.toArray)
      val b1 = SketchImpl.lshBucket(a, flat, 4, dim, false)
      assert(b1 == SketchImpl.lshBucket(a, flat, 4, dim, false))
      assert(b1 >= 0 && b1 < 16)
      if (dots.forall(d => math.abs(d) > 1e-9)) {
        val bn = SketchImpl.lshBucket(ArrayData.toArrayData(v.map(-_).toArray), flat, 4, dim, false)
        assert((b1 ^ bn) == 15, "negating the vector must flip every strictly-signed plane bit")
      }
    }
  }

  test("markerCounts matches split+lowercase+set-membership counting") {
    val sets = Seq(Seq("the", "a", "of"), Seq("der", "und"), Seq("xyzzy"))
    val jsets = sets.map { ms =>
      val h = new java.util.HashSet[UTF8String]()
      ms.foreach(m => h.add(UTF8String.fromString(m)))
      h
    }.toArray
    val mixedCase = textGen.map(s => s.zipWithIndex.map { case (c, i) => if (i % 2 == 0) c.toUpper else c }.mkString)
    for (s <- samples(Gen.oneOf(textGen, mixedCase, Gen.const("The A of DER und the")), 300)) {
      val got = SketchImpl.markerCounts(UTF8String.fromString(s), jsets)
      val toks = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val want = sets.map(ms => toks.count(ms.contains))
      assert((0 until got.numElements()).map(got.getInt) == want, s"text=$s")
    }
  }

  test("wordRepStats matches split+groupBy reference counting") {
    for (s <- samples(textGen, 300)) {
      val got = SketchImpl.wordRepStats(UTF8String.fromString(s))
      val toks = refTokens(s.toLowerCase)
      if (toks.isEmpty) {
        assert(got.getDouble(0).isNaN && got.getDouble(1).isNaN, s"text=$s")
      } else {
        val counts = toks.groupBy(identity).map(_._2.length)
        val top = counts.max.toDouble / toks.length
        val dup = (toks.length - counts.size).toDouble / toks.length
        assert(got.getDouble(0) == top && got.getDouble(1) == dup,
          s"text=${s.replace("\n", "\\n")}")
      }
    }
  }

  test("pqEncode/pqCosine: codes in range, centroid vectors reconstruct exactly") {
    val (m, ksub, dsub) = (4, 4, 2)
    val rng = new scala.util.Random(7)
    val books = Array.fill(m * ksub * dsub)(rng.nextDouble() * 2 - 1)
    val bits = 2 // log2(ksub)
    // A vector assembled FROM codebook centroids must encode back to
    // exactly those centroid indices, and its ADC cosine must equal the
    // exact cosine (reconstruction is lossless for codebook points).
    for (_ <- 1 to 100) {
      val picks = Array.fill(m)(rng.nextInt(ksub))
      val v = Array.tabulate(m * dsub)(i => books((i / dsub * ksub + picks(i / dsub)) * dsub + i % dsub))
      val vd = ArrayData.toArrayData(v)
      val code = SketchImpl.pqEncode(vd, books, m, ksub, dsub, false)
      for (sub <- 0 until m)
        assert(((code >>> (sub * bits)) & ((1L << bits) - 1)).toInt == picks(sub))
      val adc = SketchImpl.pqCosine(vd, code, books, m, ksub, dsub, false)
      assert(math.abs(adc - 1.0) < 1e-9, s"self-ADC of a codebook point must be 1, got $adc")
    }
    // Arbitrary vectors: code stays within m*bits bits, ADC stays in [-1,1].
    for (v <- samples(Gen.listOfN(m * dsub, Gen.choose(-5.0, 5.0)), 200) if v.exists(_ != 0.0)) {
      val vd = ArrayData.toArrayData(v.toArray)
      val code = SketchImpl.pqEncode(vd, books, m, ksub, dsub, false)
      assert((code >>> (m * bits)) == 0L)
      val adc = SketchImpl.pqCosine(vd, code, books, m, ksub, dsub, false)
      assert(adc >= -1.0 - 1e-9 && adc <= 1.0 + 1e-9)
    }
  }

  test("normalizeText: NFC composition, whitespace collapse, trim, idempotence") {
    import org.apache.spark.unsafe.types.UTF8String
    def norm(s: String): String = SketchImpl.normalizeText(UTF8String.fromString(s)).toString
    // Decomposed e + combining acute composes to the single codepoint é.
    assert(norm("café") == "café")
    // Already-composed text is untouched (the isNormalized fast path).
    assert(norm("café") == "café")
    // Whitespace runs collapse, leading/trailing trim, all ASCII ws kinds.
    assert(norm("  a\t\tb\r\nc \f d  ") == "a b c d")
    assert(norm("") == "" && norm(" \t\n ") == "")
    // Idempotence over generated whitespace-ragged texts, and parity with
    // the token stream: tokenization sees identical words before/after.
    for (s <- samples(textGen, 200)) {
      val once = norm(s)
      assert(norm(once) == once, s"not idempotent on ${s.take(40)}")
      assert(refTokens(once).toSeq == refTokens(s).toSeq, "tokens must survive normalization")
    }
  }

  test("cosine throws loudly on dimension mismatch") {
    val a = ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = ArrayData.toArrayData(Array(1.0, 2.0))
    intercept[IllegalArgumentException](SketchImpl.cosine(a, b, false, false))
  }

  test("charWindowHashes64 rolling hash matches a direct per-window recompute") {
    // Direct O(n·w) evaluation of the same polynomial, no rolling update —
    // any roll-out/roll-in bug diverges immediately.
    def direct(s: String, w: Int): Seq[Long] = {
      val p = SketchImpl.M61
      def mul(a: Long, b: Long): Long = {
        val bi = (BigInt(a) * BigInt(b)) mod BigInt(p)
        bi.toLong
      }
      val cps = s.codePoints().toArray
      if (cps.length < w) Seq.empty
      else cps.toSeq.sliding(w).map { win =>
        win.foldLeft(0L)((acc, c) => (mul(acc, 1000003L) + c) % p)
      }.toSeq.distinct
    }
    val gen = for {
      len <- Gen.choose(0, 120)
      cs <- Gen.listOfN(len, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', 'é', 'ß', '中')))
    } yield cs.mkString
    for {
      s <- samples(gen, 200)
      w <- Seq(2, 5, 32)
    } {
      val got = {
        val a = SketchImpl.charWindowHashes64(UTF8String.fromString(s), w)
        (0 until a.numElements()).map(a.getLong)
      }
      assert(got == direct(s, w), s"text=$s w=$w")
    }
  }

  test("charWindowHashes64: equal windows hash equal across documents, distinct per doc") {
    val a = SketchImpl.charWindowHashes64(UTF8String.fromString("abcdefgh shared-tail"), 8)
    val b = SketchImpl.charWindowHashes64(UTF8String.fromString("zzzzzzzz shared-tail"), 8)
    val sa = (0 until a.numElements()).map(a.getLong).toSet
    val sb = (0 until b.numElements()).map(b.getLong).toSet
    // " shared-tail" contributes identical 8-char windows to both.
    assert((sa & sb).size >= 4)
    val dup = SketchImpl.charWindowHashes64(UTF8String.fromString("ababababab"), 2)
    // windows of "ababababab" at w=2: only "ab" and "ba" distinct.
    assert(dup.numElements() == 2)
  }

  test("charEntropy matches a reference computation and is maximal for distinct chars") {
    def ref(s: String): Double = {
      val cps = s.codePoints().toArray
      if (cps.isEmpty) 0.0
      else {
        val n = cps.length.toDouble
        cps.groupBy(identity).values.map(_.length / n).map(p => -p * math.log(p)).sum
      }
    }
    for (s <- samples(textGen, 300)) {
      val got = SketchImpl.charEntropy(UTF8String.fromString(s))
      assert(math.abs(got - ref(s)) < 1e-9, s"text=$s got=$got ref=${ref(s)}")
    }
    assert(SketchImpl.charEntropy(UTF8String.fromString("")) == 0.0)
    assert(SketchImpl.charEntropy(UTF8String.fromString("aaaa")) == 0.0)
    // n distinct chars → exactly ln(n) nats.
    assert(math.abs(SketchImpl.charEntropy(UTF8String.fromString("abcd")) - math.log(4)) < 1e-12)
  }

  test("bpeTokenCount matches a regex-pre-tokenized reference merge loop") {
    import graft.functions.TextFunctions.demoBpeMerges
    val ranks = new java.util.HashMap[String, Integer]()
    demoBpeMerges.zipWithIndex.foreach { case (p, i) => ranks.put(p, i) }
    // The reference pre-tokenizes with the GPT-2 pattern via java.util.regex
    // — a genuinely different implementation from the kernel's hand-rolled
    // scanner (alternation order and class semantics come from the regex
    // engine), then runs an immutable-Vector merge loop.
    val pre = java.util.regex.Pattern.compile(
      "'(?:s|t|re|ve|m|ll|d)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+")
    def mergeWord(w: String): Int = {
      var parts = w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
      var go = parts.length > 1
      while (go) {
        val cand = parts.indices.dropRight(1)
          .flatMap(j => Option(ranks.get(parts(j) + " " + parts(j + 1))).map(r => (r.toInt, j)))
        if (cand.isEmpty) go = false
        else {
          val (_, j) = cand.minBy(_._1)
          parts = parts.patch(j, Seq(parts(j) + parts(j + 1)), 2)
          if (parts.length <= 1) go = false
        }
      }
      parts.length
    }
    def ref(s: String): Int = {
      val m = pre.matcher(s.toLowerCase(java.util.Locale.ROOT))
      var total = 0
      while (m.find()) total += mergeWord(m.group())
      total
    }
    // The segments kernel shares the scan+merge pipeline: its symbol count
    // must equal the count kernel, and stripping the joining spaces must
    // rebuild exactly the pre-tokenized (whitespace-free) text.
    def segmentsAgree(s: String): Unit = {
      val seg = SketchImpl.bpeSegments(UTF8String.fromString(s), ranks).toString
      val nSym = seg.split(" ").count(_.nonEmpty)
      assert(nSym == SketchImpl.bpeTokenCount(UTF8String.fromString(s), ranks),
        s"segments count mismatch for: $s → $seg")
      val m = pre.matcher(s.toLowerCase(java.util.Locale.ROOT))
      val rebuilt = new StringBuilder
      while (m.find()) rebuilt.append(m.group())
      assert(seg.replace(" ", "") == rebuilt.toString,
        s"segments must rebuild the pre-tokenized text: $s → $seg")
    }
    for (s <- samples(textGen, 300)) {
      val got = SketchImpl.bpeTokenCount(UTF8String.fromString(s), ranks)
      assert(got == ref(s), s"text=${s.replace("\n", "\\n")} got=$got ref=${ref(s)}")
      segmentsAgree(s)
    }
    // Mixed-script / punctuation shapes: contractions split per the GPT-2
    // alternation ("don't" → don|'t), an apostrophe inside a punctuation
    // run stays in the run ("!!!'ll" → !!!'|ll), accents and CJK are
    // letters, numbers split from letters ("data123" → data|123), and
    // \p{N} is wider than ASCII digits ("Ⅻ²" is one number run).
    for (s <- Seq(
        "don't stop, we'll go — they've 'd it.",
        "héllo, wörld!! füße … 数据 処理 123,456.78",
        "data123 ¼½ Ⅻ² a,b,,c ''ll '' x'y",
        "!!!'ll (quo'te) [a]{b}<c> 's alone",
        " nbsp\tand\nnewlines  double  spaces "
      )) {
      val got = SketchImpl.bpeTokenCount(UTF8String.fromString(s), ranks)
      assert(got == ref(s), s"mixed text=$s got=$got ref=${ref(s)}")
      segmentsAgree(s)
    }
    // Known segment streams, merge-table effects visible in the symbols.
    assert(SketchImpl.bpeSegments(UTF8String.fromString("The Table"), ranks).toString == "the table")
    assert(SketchImpl.bpeSegments(UTF8String.fromString("data"), ranks).toString == "d at a")
    // Known merges: "the" fully merges (t h → th, th e → the) and so does
    // "table" (l e, t a, ta b, tab le). "data" stops at 3: "a t" (rank 9)
    // fires before "d a" (rank 34), yielding [d, at, a] with no further
    // applicable pair — greedy rank order matters, exactly like real BPE.
    assert(SketchImpl.bpeTokenCount(UTF8String.fromString("the table"), ranks) == 2)
    assert(SketchImpl.bpeTokenCount(UTF8String.fromString("data"), ranks) == 3)
    // A word with no applicable merges stays at its character count.
    assert(SketchImpl.bpeTokenCount(UTF8String.fromString("xyz"), ranks) == 3)
    // Pre-tokenization boundaries hold REGARDLESS of the merge table: a
    // hostile table trying to merge across "the," cannot — the comma is
    // its own segment, so the count stays 1 (the) + 1 (,).
    val hostile = new java.util.HashMap[String, Integer]()
    Seq("t h", "th e", "the ,", "e ,").zipWithIndex.foreach { case (p, i) => hostile.put(p, i) }
    assert(SketchImpl.bpeTokenCount(UTF8String.fromString("the,"), hostile) == 2,
      "merges must never cross a pre-tokenization boundary")
  }

  test("bpe fertility moves only through the merge table; merges.txt loader round-trips") {
    import graft.functions.TextFunctions.{demoBpeMerges, loadBpeMerges}
    val texts = Seq("the quick table scans data fast", "she'll keyed rows, slow!")
    def count(s: String, merges: Seq[String]): Int = {
      val r = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case (p, i) => r.put(p, i) }
      SketchImpl.bpeTokenCount(UTF8String.fromString(s), r)
    }
    // Same text + same table → same count (the pre-tokenizer is fixed);
    // a SUPERSET table can only merge more, never less.
    // Chain-consistent with the demo table's greedy order: "q u" (demo)
    // fires first, so the extensions continue from "qu".
    val extended = demoBpeMerges ++ Seq("qu i", "c k", "qui ck", "s h", "sh e")
    for (t <- texts) {
      assert(count(t, demoBpeMerges) == count(t, demoBpeMerges))
      assert(count(t, extended) <= count(t, demoBpeMerges),
        s"a superset merge table may only lower the token count: $t")
    }
    assert(count(texts.head, extended) < count(texts.head, demoBpeMerges),
      "the added merges must actually fire on 'quick'")
    // merges.txt round trip: the standard file format feeds the same
    // parameter and reproduces the in-memory table's counts exactly.
    val f = java.io.File.createTempFile("merges", ".txt")
    try {
      val w = new java.io.PrintWriter(f, "UTF-8")
      w.println("#version: 0.2")
      demoBpeMerges.foreach(w.println)
      w.close()
      val loaded = loadBpeMerges(f.getPath)
      assert(loaded == demoBpeMerges, "loader must preserve rank order and skip the header")
      for (t <- texts) assert(count(t, loaded) == count(t, demoBpeMerges))
    } finally f.delete()
  }

  test("float and double element paths agree") {
    for (v <- samples(Gen.listOfN(16, Gen.choose(-8f, 8f)), 200)) {
      val f = ArrayData.toArrayData(v.toArray)
      val d = ArrayData.toArrayData(v.map(_.toDouble).toArray)
      val cf = SketchImpl.cosine(f, f, true, true)
      val cd = SketchImpl.cosine(d, d, false, false)
      if (v.exists(_ != 0f)) {
        assert(math.abs(cf - 1.0) < 1e-6 && math.abs(cd - 1.0) < 1e-12)
        assert(
          SketchImpl.lshBucket(f, Array.fill(16)(0.5), 1, 16, true) ==
            SketchImpl.lshBucket(d, Array.fill(16)(0.5), 1, 16, false)
        )
      }
    }
  }

  test("deflateRatio: ordering (repetitive < prose < random), bounds, determinism") {
    import org.apache.spark.unsafe.types.UTF8String
    def r(s: String): Double = SketchImpl.deflateRatio(UTF8String.fromString(s))
    // Property gates only — never exact ratios (a zlib revision may move
    // them slightly, the ORDER and bounds are invariant).
    val repetitive = "spam " * 400
    val prose = ("the quick brown fox jumps over the lazy dog while a query " +
      "scans a table and the window sorts each group by key ") * 10
    // Deterministic pseudo-random bytes (LCG over printable ASCII).
    val rnd = new StringBuilder
    var x = 0x2545F4914F6CDD1DL
    for (_ <- 0 until 4000) { x = x * 6364136223846793005L + 1442695040888963407L; rnd += (33 + ((x >>> 33) % 94)).toChar }
    val random = rnd.toString
    assert(r(repetitive) < 0.05, s"boilerplate must compress hard: ${r(repetitive)}")
    assert(r(repetitive) < r(prose) && r(prose) < r(random),
      s"ordering must hold: ${r(repetitive)} < ${r(prose)} < ${r(random)}")
    assert(r(random) > 0.8, s"incompressible text must stay near 1.0: ${r(random)}")
    assert(r("") == 1.0, "empty text is defined as ratio 1.0")
    for (t <- samples(textGen, 100)) {
      val v = r(t)
      assert(v > 0.0 && v <= 1.5, s"ratio out of bounds for ${t.take(40)}: $v")
      assert(v == r(t), "kernel must be deterministic")
    }
  }
}
