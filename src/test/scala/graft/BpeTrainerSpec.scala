package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.BpeTrainer

/** BPE merge-table TRAINING (BpeTrainer) — the learn side of the tokenizer
  * lifecycle, pinned against the hand-computable Sennrich worked example
  * and proven to compose with the native APPLY kernels (bpe_segments /
  * bpe_token_count): merges learned here change tokenization there, with
  * zero segmentation drift because both sides share one pre-tokenizer scan.
  */
class BpeTrainerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // The Sennrich et al. 2016 worked example: {'low':5,'lower':2,
  // 'newest':6,'widest':3}. Hand-derived merge sequence under (count DESC,
  // pair ASC) tie-breaking:
  //   round 1: (e,s)=9 ties (s,t)=9 → "e s" wins lexicographically
  //   round 2: (es,t)=9 → "es t"
  //   round 3: (l,o)=7 ties (o,w)=7 → "l o"
  //   round 4: (lo,w)=7 → "lo w"
  //   round 5: (e,w)=6 ties (n,e)=6 and (w,est)=6 → "e w"
  private val sennrich = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("learnMerges reproduces the Sennrich worked example, with counts") {
    val learned = BpeTrainer.learnMerges(sennrich, 5)
    assert(learned.map(_._1) == Seq("e s", "es t", "l o", "lo w", "e w"))
    assert(learned.map(_._2) == Seq(9L, 9L, 7L, 7L, 6L))
  }

  test("learnMerges is deterministic and stops when every word is fully merged") {
    val a = BpeTrainer.learnMerges(sennrich, 1000)
    val b = BpeTrainer.learnMerges(sennrich, 1000)
    assert(a == b)
    // 4 words, 6+5+3+... total symbols: the loop must terminate well under
    // the requested 1000 with every word collapsed to one symbol.
    assert(a.size < 30)
    assert(BpeTrainer.wellFormed(a.map(_._1)))
  }

  test("learned merges drive the NATIVE apply kernel: newest → n ew est") {
    val merges = BpeTrainer.learnMerges(sennrich, 5).map(_._1)
    val seg = Seq("newest").toDF("text")
      .select(TextFunctions.bpeSegments(col("text"), merges).as("s"))
      .as[String].head()
    assert(seg == "n ew est")
    val cnt = Seq("newest").toDF("text")
      .select(TextFunctions.bpeTokenCount(col("text"), merges).as("c"))
      .as[Int].head()
    assert(cnt == 3)
  }

  test("wellFormed rejects symbols no earlier merge produced") {
    assert(BpeTrainer.wellFormed(Seq("a b", "ab c")))
    assert(!BpeTrainer.wellFormed(Seq("ab c"))) // "ab" never produced
    assert(!BpeTrainer.wellFormed(Seq("a "))) // malformed pair
    assert(BpeTrainer.wellFormed(Nil))
  }

  test("wordFrequencies pre-tokenizes with the kernel scan and orders (count DESC, word ASC)") {
    val docs = Seq(
      "The cat, the CAT!",
      "don't stop the cat"
    ).toDF("text")
    val dict = BpeTrainer.wordFrequencies(docs, col("text"), 100)
    // pre-tokens: [the cat , the cat !] + [don 't stop the cat] — "cat" and
    // "the" tie at 3 and the ASC word tie-break puts "cat" first.
    assert(dict.take(2) == Seq(("cat", 3L), ("the", 3L)))
    assert(dict.contains(("'t", 1L)))
    assert(dict.contains((",", 1L)))
    // ties (count 1) are code-point ordered: "!" < "'t" < "," < "don" < "stop"
    val ones = dict.filter(_._2 == 1L).map(_._1)
    assert(ones == ones.sorted(BpeTrainer.codePointOrder))
  }

  test("wordFrequencies truncation keeps the frequency head") {
    val docs = Seq("a a a b b c").toDF("text")
    assert(BpeTrainer.wordFrequencies(docs, col("text"), 2).map(_._1) == Seq("a", "b"))
  }

  test("end-to-end: learned table strictly compresses the training corpus") {
    val docs = Seq.tabulate(50)(i => s"the rain in spain number $i falls mainly").toDF("text")
    val merges = BpeTrainer.learnBpeMerges(docs, col("text"), k = 16, maxDictWords = 64)
    assert(merges.size == 16)
    assert(BpeTrainer.wellFormed(merges))
    val Seq((merged, base)) = docs
      .agg(
        sum(TextFunctions.bpeTokenCount(col("text"), merges)).as("m"),
        sum(TextFunctions.bpeTokenCount(col("text"), Seq.empty)).as("b"))
      .as[(Long, Long)].collect().toSeq
    assert(merged < base, s"learned merges must reduce token count ($merged vs $base)")
  }

  test("codePointOrder equals UTF-8 byte order, including supplementary plane") {
    // U+10000 (surrogate pair in UTF-16) must sort ABOVE U+FFFD: byte order
    // says so; java.lang.String.compareTo disagrees (high surrogate 0xD800
    // < 0xFFFD) — the exact trap the custom comparator exists to avoid.
    val supp = new String(Character.toChars(0x10000))
    assert(BpeTrainer.codePointOrder.compare(supp, "�") > 0)
    assert("�".compareTo(supp) > 0) // String order is the wrong one
    assert(BpeTrainer.codePointOrder.compare("a", "ab") < 0)
    assert(BpeTrainer.codePointOrder.compare("b", "ab") > 0)
    assert(BpeTrainer.codePointOrder.compare("", "") == 0)
  }

  test("bpe_words kernel: lowercase, contractions, punct runs, number runs") {
    val w = Seq("Don't STOP!! 3cats").toDF("text")
      .select(TextFunctions.bpeWords(col("text")).as("w")).as[String].head()
    assert(w == "don 't stop !! 3 cats")
    val empty = Seq("   ").toDF("text")
      .select(TextFunctions.bpeWords(col("text")).as("w")).as[String].head()
    assert(empty == "")
  }
}
