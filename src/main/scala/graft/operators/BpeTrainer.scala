package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** BPE merge-table TRAINING — the missing third of the tokenizer lifecycle
  * (learn merges → segment → id lookup; apply-side kernels live in
  * [[graft.functions.SketchImpl]], id lookup in q_token_ids). The algorithm
  * is the public Sennrich et al. 2016 learn_bpe shape (arXiv:1508.07909,
  * the one GPT-2's merges.txt was built with): collapse the corpus to a
  * word-frequency dictionary, then iteratively merge the most frequent
  * adjacent symbol pair.
  *
  * Scale split — the part that must be distributed is the word count, and
  * ONLY that part: a 100 TB corpus collapses to its pre-token vocabulary
  * through one partial-agg'd groupBy (map-side combine makes the exchange
  * vocabulary-sized, not corpus-sized), and the merge loop itself runs over
  * the top-`maxDictWords` dictionary rows — bounded driver state, the same
  * contract as the kmeans/PQ/classifier trainers (512-4096-row samples).
  * Truncating the dictionary to its frequency head is standard practice
  * (the tail's pair counts cannot outvote the head's) and is what makes the
  * driver loop corpus-size-independent.
  *
  * Determinism contract (cross-engine verifiable, q_bpe_train's oracle):
  * every ordering in the pipeline is total — dictionary truncation orders
  * by (count DESC, word ASC), pair selection by (count DESC, pair ASC) —
  * with string ties broken in CODE-POINT order, which equals UTF-8 byte
  * order, which is both Spark's UTF8String comparison and DuckDB's binary
  * collation. java.lang.String.compareTo (UTF-16 code-unit order) disagrees
  * with all three on supplementary-plane characters, so it is deliberately
  * not used.
  */
object BpeTrainer {

  /** Lexicographic CODE-POINT order — equals UTF-8 byte order (Spark's and
    * DuckDB's string comparison); differs from String.compareTo only on
    * supplementary-plane characters, where compareTo's surrogate code units
    * sort below some BMP characters.
    */
  val codePointOrder: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** The word-frequency dictionary: pre-tokenize every document with the
    * SAME native kernel the apply side uses (bpe_words — zero train/apply
    * segmentation drift), count, keep the top `maxDictWords` by
    * (count DESC, word ASC). One partial-agg'd shuffle on the word key,
    * then a TakeOrdered head — the only corpus-scale work in training.
    */
  def wordFrequencies(
      docs: DataFrame,
      textCol: Column,
      maxDictWords: Int
  ): Seq[(String, Long)] = {
    require(maxDictWords > 0 && maxDictWords <= 65536,
      s"dictionary is driver state — keep it bounded (got $maxDictWords)")
    docs
      .select(explode(split(graft.functions.TextFunctions.bpeWords(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxDictWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
  }

  /** The Sennrich merge loop over a word-frequency dictionary: up to `k`
    * rounds of (count adjacent symbol pairs at every position, weighted by
    * word frequency) → (merge the winner everywhere, leftmost
    * non-overlapping). Returns each learned merge as ("left right",
    * pair count at learn time) in rank order; stops early only when no
    * adjacent pair remains (every dict word fully merged).
    */
  def learnMerges(dict: Seq[(String, Long)], k: Int): Seq[(String, Long)] = {
    require(k >= 0 && k <= 200000, s"merge table must stay vocab-scale (got $k)")
    // Words as mutable symbol buffers; symbols start as single code points.
    val words: Array[(mutable.ArrayBuffer[String], Long)] = dict.map { case (w, c) =>
      val syms = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += w.substring(i, i + Character.charCount(cp))
        i += Character.charCount(cp)
      }
      (syms, c)
    }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, Long)]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val key = (syms(j), syms(j + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((left, right), cnt) = counts.minBy { case ((l, r), c) =>
          // max count, then min "left right" in code-point order: negate the
          // count and let the pair string order directly.
          (-c, s"$l $r")
        }(Ordering.Tuple2(Ordering.Long, codePointOrder))
        merges += (s"$left $right" -> cnt)
        val fused = left + right
        words.foreach { case (syms, _) =>
          var j = 0
          while (j < syms.length - 1) {
            if (syms(j) == left && syms(j + 1) == right) {
              syms(j) = fused
              syms.remove(j + 1)
            }
            j += 1
          }
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** End-to-end: distributed word count, bounded driver merge loop. The
    * result feeds [[graft.functions.TextFunctions.bpeTokenCount]]/
    * [[graft.functions.TextFunctions.bpeSegments]] directly (rank order =
    * list order), exactly like a loaded merges.txt.
    */
  def learnBpeMerges(
      docs: DataFrame,
      textCol: Column,
      k: Int,
      maxDictWords: Int = 4096
  ): Seq[String] =
    learnMerges(wordFrequencies(docs, textCol, maxDictWords), k).map(_._1)

  /** Well-formedness of a learned table: every merge's two symbols are
    * single code points or concatenations produced by EARLIER merges — the
    * prefix-closure property that makes the table applicable greedily.
    */
  def wellFormed(merges: Seq[String]): Boolean = {
    val produced = mutable.HashSet.empty[String]
    merges.forall { m =>
      val sp = m.indexOf(' ')
      if (sp <= 0 || sp >= m.length - 1) false
      else {
        val l = m.substring(0, sp)
        val r = m.substring(sp + 1)
        def known(s: String): Boolean =
          produced.contains(s) || s.codePointCount(0, s.length) == 1
        val ok = known(l) && known(r) && !l.contains(' ') && !r.contains(' ')
        produced += (l + r)
        ok
      }
    }
  }
}
