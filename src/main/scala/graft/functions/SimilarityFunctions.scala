package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity / dedup sketches for LLM-data pipelines (SURVEY.md §2.3).
  *
  * Everything here is a pure column expression over Spark's higher-order
  * functions: sketches are computed in one distributed pass, and candidate
  * generation uses LSH banding so the pair space is bounded by bucket
  * co-occupancy — never an O(n²) cross join. That is the property that keeps
  * these operators viable at 100 TB.
  *
  * EVAL-ONCE DISCIPLINE: Catalyst's interpreted higher-order functions
  * re-evaluate any expression referenced *inside a lambda body* once per
  * element, and `CollapseProject` happily inlines an upstream column into
  * that position. A naive `transform(sequence(0,63), j -> f(shingles(text)))`
  * therefore tokenizes the document 64 times per row — quadratic, and
  * observed to be ~1000× slower on real documents. Every function here is
  * structured so expensive sub-expressions appear only in argument position
  * (evaluated once per row), using `bind` as an explicit per-row let-binding
  * where needed.
  */
object SimilarityFunctions {

  private val P = 1000000007L

  /** Per-row let-binding: evaluates `e` exactly once per row and passes the
    * bound value (a cheap lambda variable) to `f`. Implemented as
    * `transform(array(e), v => f(v))[1]` — the array constructor is argument
    * position, so `e` cannot be re-evaluated no matter how the consumer uses
    * the binding. Cost: one single-element array allocation per row.
    */
  def bind(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), v => f(v)), 1)

  /** Whitespace tokens, evaluated once per row. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles of a text column.
    *
    * Built with `zip_with` over shifted slices of the (let-bound) token
    * array, so tokenization runs once per row — never once per shingle.
    * For a document of w tokens (w ≥ n) this yields the w-n+1 n-grams.
    */
  def shingles(text: Column, n: Int = 3): Column =
    bind(tokens(text)) { t =>
      val joined = (2 to n).foldLeft(t) { (acc, k) =>
        zip_with(acc, slice(t, lit(k), greatest(size(t), lit(1))), (a, b) => concat(a, lit(" "), b))
      }
      array_distinct(slice(joined, lit(1), greatest(size(t) - (n - 1), lit(1))))
    }

  /** Each shingle hashed once into [0, p). Input in argument position. */
  def hashedShingles(sh: Column): Column =
    transform(sh, x => pmod(xxhash64(x), lit(P)))

  /** MinHash signature (array<long> of length k) over pre-hashed shingles.
    *
    * Hash family: h_j(x) = ((2j+1)·x + j·12582917) mod p, p = 1e9+7 —
    * deterministic and integer-exact. ONE pass over the shingle array: an
    * `aggregate` carries k running minima and updates all k per element,
    * instead of k separate scans (which would re-evaluate the input k times).
    */
  def minhashSignature(hs: Column, k: Int = 64): Column =
    aggregate(
      hs,
      array_repeat(lit(P), k),
      (acc, h) =>
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(k - 1)),
            j => pmod((j * 2 + 1) * h + j * lit(12582917L), lit(P))
          ),
          (a, b) => least(a, b)
        )
    )

  /** LSH band hashes for a minhash signature: `b` bands of `r` rows. Docs
    * sharing any (band_index, band_hash) are candidate pairs.
    * `sig` is referenced inside the lambda (once per band) — callers must
    * pass a bound variable or attribute, e.g. via [[bind]] /
    * [[minhashBands]].
    */
  def bandHashes(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), bi => xxhash64(bi, slice(sig, bi * r + 1, lit(r))))

  /** shingles → hashed shingles → signature → band hashes, eval-once. */
  def minhashBands(sh: Column, k: Int = 64, b: Int = 16, r: Int = 4): Column =
    bind(minhashSignature(hashedShingles(sh), k))(sig => bandHashes(sig, b, r))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    bind(size(array_intersect(a, b)).cast("double")) { inter =>
      inter / (size(a) + size(b) - inter)
    }

  /** SimHash sign vector (array<long> of 64 0/1 signs) over the whitespace
    * tokens of `textCol` (a column name / SQL expression).
    *
    * For each token, xxhash64 gives 64 bits; bit i votes +1/-1 on sign i.
    * One `aggregate` pass (tokenization in argument position). Kept as a
    * sign array (not packed into a long) so banding and hamming distance
    * stay plain array expressions. Built as a SQL expression because
    * shift-by-column isn't exposed in the Scala functions API.
    */
  def simhashSigns(textCol: String): Column = expr(
    s"""transform(
       |  aggregate(
       |    split(trim($textCol), '\\\\s+'),
       |    array_repeat(CAST(0 AS BIGINT), 64),
       |    (acc, t) -> zip_with(acc,
       |      transform(sequence(0, 63),
       |        i -> IF((shiftright(xxhash64(t), i) & 1) = 1, CAST(1 AS BIGINT), CAST(-1 AS BIGINT))),
       |      (a, v) -> a + v)),
       |  c -> IF(c > 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))""".stripMargin
  )

  /** Hamming distance between two equal-length sign arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, lit(0)).otherwise(lit(1))), lit(0), _ + _)

  /** Band hashes over a simhash sign array: `b` bands of `r` signs.
    * Same caller contract as [[bandHashes]]. */
  def simhashBands(signs: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), bi => xxhash64(bi, slice(signs, bi * r + 1, lit(r))))

  /** Cosine similarity of two numeric arrays, accumulated in double in
    * element order — bit-identical to the DuckDB oracle's fold.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")), lit(0.0), _ + _)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Deterministic random hyperplanes for sign-LSH over embeddings:
    * `planes(nPlanes, dim)` — fixed seed so bucketing is reproducible.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH bucket id for an embedding: concatenated signs of the dot
    * product against each (fixed, seeded) hyperplane.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val signs = planes.map { p =>
      val w = typedLit(p)
      val d = aggregate(zip_with(vec, w, (x, y) => x.cast("double") * y), lit(0.0), _ + _)
      when(d >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(signs: _*)
  }
}
