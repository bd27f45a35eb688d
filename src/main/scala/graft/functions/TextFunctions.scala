package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data pipelines (SURVEY.md §2.3).
  *
  * All are single-pass, codegen-friendly expressions built from Spark's
  * built-in higher-order functions — no UDFs, no JVM object churn per row —
  * so they run inside WholeStageCodegen and scale linearly with input bytes.
  */
object TextFunctions {

  /** Whitespace tokens of a text column. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish pre-tokenizer count: alpha runs, single digits, punctuation. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / length(text)

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text)

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  /** Canonical text normalization: Unicode NFC composition + ASCII
    * whitespace collapse + trim (native [[NormalizeText]] expression) —
    * run it BEFORE hashing/shingling so composed and decomposed spellings
    * of the same text dedup together.
    */
  def normalizeText(text: Column): Column = toCol(NormalizeText(toExpr(text)))

  /** Shannon entropy (nats) of the character distribution (native
    * [[CharEntropy]] expression) — low/extreme values flag binary junk,
    * base64 blobs, and single-character spam.
    */
  def charEntropy(text: Column): Column = toCol(CharEntropy(toExpr(text)))

  /** A small deterministic English-ish BPE merge table (rank order) for the
    * demo tokenizer. Production swaps in a real tokenizer's merges file via
    * the same parameter — the kernel and plan shape are identical.
    */
  val demoBpeMerges: Seq[String] = Seq(
    "t h", "th e", "a n", "an d", "i n", "e r", "o n", "r e", "o r",
    "a t", "e n", "e s", "s t", "a r", "o u", "l e", "i s", "i t",
    "a l", "c h", "o m", "u e", "v e", "r y", "u s", "w h", "wh e",
    "q u", "qu e", "b a", "ba t", "t a", "ta b", "tab le", "d a", "da t",
    "dat a", "s c", "sc a", "sca n", "k e", "ke y", "r o", "ro w",
    "f a", "fa s", "fas t", "s l", "sl o", "slo w"
  )

  /** BPE token count under a merge table (native [[BpeTokenCount]]
    * expression, GPT-2 pre-tokenization before merging) — the
    * tokenizer-aware form of [[tokenCount]]; with [[tokenCount]] it yields
    * fertility (BPE tokens per word), the out-of-domain/noise signal real
    * curation pipelines gate on. The pre-tokenizer is fixed; fertility
    * numbers change only via the merge table (property-pinned in
    * SketchKernelPropertySpec).
    */
  def bpeTokenCount(text: Column, merges: Seq[String] = demoBpeMerges): Column =
    toCol(BpeTokenCount(toExpr(text), merges))

  /** The merged BPE symbol sequence itself, space-joined (native
    * [[BpeSegments]] expression) — the true token stream a training
    * pipeline materializes before id lookup; token count of this string
    * equals [[bpeTokenCount]] by construction (spec-pinned).
    */
  def bpeSegments(text: Column, merges: Seq[String] = demoBpeMerges): Column =
    toCol(BpeSegments(toExpr(text), merges))

  /** The lowercased pre-token stream, space-joined (native [[BpeWords]]
    * expression, no merges applied) — the word units BPE TRAINING counts
    * frequencies over; sharing the apply kernels' pre-tokenizer scan keeps
    * train and apply segmentation drift-free by construction.
    */
  def bpeWords(text: Column): Column = toCol(BpeWords(toExpr(text)))

  /** Load a GPT-2-format merges file: one "left right" pair per line, rank
    * = line order; blank and '#'-prefixed header/comment lines skipped —
    * the standard public artifact (merges.txt) a production tokenizer
    * ships, consumed driver-side (bounded: [[BpeTokenCount]] enforces
    * vocab-scale) and shipped to executors as a plan constant.
    */
  def loadBpeMerges(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally src.close()
  }

  /** Per-set marker counts of the lowercased tokens — ONE compiled
    * tokenization pass for all sets (native [[MarkerCounts]] expression).
    */
  def markerCounts(text: Column, sets: Seq[Seq[String]]): Column =
    toCol(MarkerCounts(toExpr(text), sets))

  /** How many lowercase whitespace tokens fall in a marker set. */
  def markerScore(text: Column, markers: Seq[String]): Column =
    element_at(markerCounts(text, Seq(markers)), 1)

  /** [top_word_share, dup_word_frac] of the lowercased tokens — the Gopher
    * repetition signals in one compiled pass (native [[WordRepStats]]).
    */
  def wordRepStats(text: Column): Column = toCol(WordRepStats(toExpr(text)))

  /** Fraction of whitespace tokens that are common English stopwords. */
  def stopwordRatio(text: Column): Column =
    markerScore(text, Seq("the", "a", "of", "and", "to", "in", "is")).cast("double") /
      tokenCount(text)

  /** DEFLATE compression ratio (compressed/raw bytes, native
    * [[DeflateRatio]] expression) — boilerplate compresses far below
    * prose; random blobs sit near 1.0. Gate LOW ratios as templated junk
    * and HIGH ratios as binary/encrypted spillage.
    */
  def deflateRatio(text: Column): Column = toCol(DeflateRatio(toExpr(text)))

  /** Native robots longest-match election over a parsed-rule array
    * (struct<prefix, allow, rx>): the best matching rule as
    * struct<l, allow, prefix>, NULL when nothing matches. One compiled loop
    * with a shared pattern cache — spec-pinned element-identical to the
    * HOF form (TextQueries.robotsBestMatchRx), which recompiles every
    * non-foldable regex per row.
    */
  def robotsMatch(rules: Column, path: Column): Column =
    toCol(RobotsMatch(toExpr(rules), toExpr(path)))

  /** σ(bias + Σ_tokens weights[bucket(token)]) — the serving pass of the
    * hashing-trick logistic classifier (native [[LinearTextScore]]
    * expression, one fused pass per row). Train with
    * [[TextClassifier.train]]; the weight vector is the hash DIMENSION
    * (bounded plan constant), never the vocabulary.
    */
  def linearTextScore(text: Column, weights: Seq[Double], bias: Double): Column =
    toCol(LinearTextScore(toExpr(text), weights, bias))

  /** Language marker sets (tiny, deterministic n-gram-heuristic stand-in). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "es", "una", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Predicted language: argmax of marker scores, first-listed wins ties,
    * 'und' when no marker hits at all.
    *
    * All language scores come from ONE [[MarkerCounts]] kernel call per row
    * (let-bound so the argmax cascade can reference them freely); the
    * cascade itself is plain codegen'd conditionals.
    */
  def langId(text: Column): Column = {
    import SimilarityFunctions.bind
    bind(markerCounts(text, langMarkers.map(_._2))) { sc =>
      langMarkers.zipWithIndex.foldRight(lit("und")) { case (((l, _), i), rest) =>
        val s = element_at(sc, i + 1)
        val beatsAll = langMarkers.indices
          .filter(_ != i)
          .map(j => s >= element_at(sc, j + 1))
          .reduce(_ && _)
        when(s > 0 && beatsAll, lit(l)).otherwise(rest)
      }
    }
  }

  /** Polynomial rolling-hash fingerprint over whitespace tokens.
    *
    * Each word maps to `31*len + codepoint(firstChar)`, folded with
    * `acc*131 + x (mod 1e9+7)` — integer-exact and portable (the DuckDB
    * oracle computes the identical fold), so fingerprints are comparable
    * across engines and stable under repartitioning.
    */
  def docFingerprint(text: Column): Column =
    aggregate(
      transform(
        wsTokens(text),
        w => (length(w) * 31 + ascii(substring(w, 1, 1))).cast("long")
      ),
      lit(0L),
      (acc, x) => (acc * 131 + x) % 1000000007L
    )
}
