package graft.functions

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels behind the native sketch expressions (NativeExpressions).
  *
  * Every method here is a plain static JVM function over Spark's unsafe row
  * formats (`UTF8String`, `ArrayData`), callable directly from generated
  * whole-stage-codegen Java. This replaces the interpreted higher-order
  * function pipelines that computed the same sketches ~100× slower (Catalyst
  * evaluates HOF lambdas interpreted, allocating per-element arrays; a 64-seat
  * minhash over a 50-shingle doc churned ~6,400 interpreted expression evals
  * per row — here it is one tight loop).
  *
  * Hash conventions are kept bit-identical to the previous HOF implementation
  * (and Spark's `xxhash64`): token/shingle hashes are
  * `XXH64(bytes, seed=42) mod (1e9+7)`, and the minhash family is
  * `h_j(x) = ((2j+1)·x + j·12582917) mod (1e9+7)`.
  */
object SketchImpl {
  final val P = 1000000007L
  final val SEED = 42L

  /** Java-regex `\s` byte set (ASCII): space, \t, \n, \x0B, \f, \r. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 9 && b <= 13)

  /** Token [start,end) byte bounds over whitespace runs — the compiled
    * equivalent of `split(trim(text), "\\s+")`. Returns a flat array of
    * 2·w ints.
    */
  private def tokenBounds(b: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    val len = b.length
    // count tokens
    while (i < len) {
      while (i < len && isWs(b(i))) i += 1
      if (i < len) { n += 1; while (i < len && !isWs(b(i))) i += 1 }
    }
    val out = new Array[Int](2 * n)
    i = 0
    var t = 0
    while (i < len) {
      while (i < len && isWs(b(i))) i += 1
      if (i < len) {
        out(2 * t) = i
        while (i < len && !isWs(b(i))) i += 1
        out(2 * t + 1) = i
        t += 1
      }
    }
    out
  }

  /** 64-bit SimHash over whitespace tokens: bit i of each token's xxhash64
    * votes ±1 on counter i; result bit i = (counter i > 0).
    */
  def simhash64(s: UTF8String): Long = {
    val b = s.getBytes
    val bounds = tokenBounds(b)
    val counters = new Array[Int](64)
    var t = 0
    while (t < bounds.length) {
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + bounds(t), bounds(t + 1) - bounds(t), SEED)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
        i += 1
      }
      t += 2
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Builds the single-space-joined byte image of tokens [i, i+n). */
  private def joinShingle(b: Array[Byte], bounds: Array[Int], i: Int, n: Int): Array[Byte] = {
    var len = n - 1
    var j = 0
    while (j < n) { len += bounds(2 * (i + j) + 1) - bounds(2 * (i + j)); j += 1 }
    val out = new Array[Byte](len)
    var pos = 0
    j = 0
    while (j < n) {
      if (j > 0) { out(pos) = ' '; pos += 1 }
      val st = bounds(2 * (i + j))
      val en = bounds(2 * (i + j) + 1)
      System.arraycopy(b, st, out, pos, en - st)
      pos += en - st
      j += 1
    }
    out
  }

  /** Distinct word n-gram shingles, in first-occurrence order. Documents with
    * fewer than n tokens yield an empty array.
    */
  def shingleNGrams(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val bounds = tokenBounds(b)
    val w = bounds.length / 2
    if (w < n) return new GenericArrayData(Array.empty[Any])
    val seen = new JLinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= w) {
      seen.add(UTF8String.fromBytes(joinShingle(b, bounds, i, n)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Distinct hashed n-gram shingles: `xxhash64(shingle) mod P`, in
    * first-occurrence order — the join-key form of [[shingleNGrams]] (longs
    * shuffle and compare far cheaper than strings).
    */
  def hashedShingles(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val bounds = tokenBounds(b)
    val w = bounds.length / 2
    if (w < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val seen = new JLinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + n <= w) {
      val sh = joinShingle(b, bounds, i, n)
      val h = XXH64.hashUnsafeBytes(sh, Platform.BYTE_ARRAY_OFFSET, sh.length, SEED)
      seen.add(((h % P) + P) % P)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct FULL-64-bit hashed n-gram shingles (`xxhash64(shingle)`, no
    * mod-P reduction) — the set-identity form: ~n²/2⁶⁴ pair collisions, so
    * intersections/counts over these agree with the string sets for any
    * realistic corpus. Use [[hashedShingles]] (mod P) only where minhash
    * needs the [0, P) domain.
    */
  def hashedShingles64(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val bounds = tokenBounds(b)
    val w = bounds.length / 2
    if (w < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val seen = new JLinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + n <= w) {
      val sh = joinShingle(b, bounds, i, n)
      seen.add(XXH64.hashUnsafeBytes(sh, Platform.BYTE_ARRAY_OFFSET, sh.length, SEED))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def minhashSigArray(hs: ArrayData, k: Int): Array[Long] = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val x = hs.getLong(i)
      var j = 0
      while (j < k) {
        // x ∈ [0, P): (2j+1)·x + j·12582917 stays well under Long.Max for k ≤ 64.
        val v = (2L * j + 1L) * x + j * 12582917L
        val vm = v % P
        if (vm < sig(j)) sig(j) = vm
        j += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash signature (k minima) over pre-hashed shingles. */
  def minhashSignature(hs: ArrayData, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(minhashSigArray(hs, k))

  /** MinHash LSH band hashes: signature → b bands of r seats, each band
    * chain-hashed with XXH64. Docs sharing any (band index, band hash) are
    * candidate pairs.
    */
  def minhashBands(hs: ArrayData, k: Int, b: Int, r: Int): ArrayData = {
    val sig = minhashSigArray(hs, k)
    val out = new Array[Long](b)
    var bi = 0
    while (bi < b) {
      var acc = XXH64.hashLong(bi.toLong, SEED)
      var i = bi * r
      val end = bi * r + r
      while (i < end) { acc = XXH64.hashLong(sig(i), acc); i += 1 }
      out(bi) = acc
      bi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Cosine similarity, double accumulation in element order — the same fold
    * the DuckDB oracle applies, so hashes match bit-for-bit.
    *
    * Dimension mismatch fails loudly: silently truncating to the shorter
    * array would return a plausible-but-wrong similarity. Zero-norm (e.g.
    * empty or all-zero) input yields NaN (0/0), matching DuckDB's
    * list_cosine_similarity.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine: dimension mismatch (${n} vs ${b.numElements()})")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Per-marker-set token membership counts over the lowercased whitespace
    * tokens of `s` — all sets counted in ONE tokenization pass (the
    * interpreted form re-ran filter+isin per language per row).
    * `sets` contains lowercased marker tokens.
    */
  def markerCounts(s: UTF8String, sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val lower = s.toLowerCase
    val b = lower.getBytes
    val bounds = tokenBounds(b)
    val counts = new Array[Int](sets.length)
    var t = 0
    while (t < bounds.length) {
      val tok = UTF8String.fromBytes(b, bounds(t), bounds(t + 1) - bounds(t))
      var i = 0
      while (i < sets.length) {
        if (sets(i).contains(tok)) counts(i) += 1
        i += 1
      }
      t += 2
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  /** Word repetition stats over the lowercased whitespace tokens of `s` in
    * ONE pass: [top_word_share, dup_word_frac] — the Gopher repetition
    * signals. Per-document stats are row-local, so this replaces an
    * explode → tf → agg pipeline (two shuffles, ×n_words row blowup) with
    * a zero-shuffle projection. Empty input yields NaNs (no tokens to
    * measure).
    */
  def wordRepStats(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val bounds = tokenBounds(b)
    val n = bounds.length / 2
    val out = new Array[Double](2)
    if (n == 0) { out(0) = Double.NaN; out(1) = Double.NaN }
    else {
      val m = new java.util.HashMap[UTF8String, Array[Int]](n * 2)
      var maxC = 0
      var t = 0
      while (t < bounds.length) {
        val tok = UTF8String.fromBytes(b, bounds(t), bounds(t + 1) - bounds(t))
        var c = m.get(tok)
        if (c == null) { c = new Array[Int](1); m.put(tok, c) }
        c(0) += 1
        if (c(0) > maxC) maxC = c(0)
        t += 2
      }
      out(0) = maxC.toDouble / n
      out(1) = (n - m.size).toDouble / n
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Product-quantization encode: split `v` into `m` contiguous subvectors
    * of `dsub` dims, pick the nearest (L2) of `ksub` codebook centroids per
    * subspace, and pack the code indices little-endian at
    * ceil(log2(ksub))-bits each into one long — a 64-float vector becomes a
    * 32-bit code at m=8, ksub=16. `codebooks` is flat
    * [sub][centroid][dim] row-major (m × ksub × dsub doubles).
    */
  def pqEncode(
      v: ArrayData,
      codebooks: Array[Double],
      m: Int,
      ksub: Int,
      dsub: Int,
      isFloat: Boolean
  ): Long = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros((ksub - 1).toLong).toInt
    var code = 0L
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d2 = 0.0
        var j = 0
        val cOff = (sub * ksub + c) * dsub
        while (j < dsub) {
          val diff = elem(v, sub * dsub + j, isFloat) - codebooks(cOff + j)
          d2 += diff * diff
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      code |= best.toLong << (sub * bits)
      sub += 1
    }
    code
  }

  /** Asymmetric-distance cosine: approximate cos(q, x) from x's PQ `code`
    * alone — dot and reconstruction norm accumulate over the coded
    * centroids, the query side stays exact. The classic ADC lookup
    * evaluated inline (ksub is small enough that the table buys nothing at
    * these sizes).
    */
  def pqCosine(
      q: ArrayData,
      code: Long,
      codebooks: Array[Double],
      m: Int,
      ksub: Int,
      dsub: Int,
      isFloat: Boolean
  ): Double = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros((ksub - 1).toLong).toInt
    val mask = (1L << bits) - 1
    var dot = 0.0
    var nq = 0.0
    var nc = 0.0
    var sub = 0
    while (sub < m) {
      val c = ((code >>> (sub * bits)) & mask).toInt
      val cOff = (sub * ksub + c) * dsub
      var j = 0
      while (j < dsub) {
        val qj = elem(q, sub * dsub + j, isFloat)
        val cj = codebooks(cOff + j)
        dot += qj * cj
        nq += qj * qj
        nc += cj * cj
        j += 1
      }
      sub += 1
    }
    dot / (math.sqrt(nq) * math.sqrt(nc))
  }

  /** Sign-LSH bucket id: bit p = (v · plane_p ≥ 0), planes row-major in
    * `flat` (nPlanes × dim).
    */
  def lshBucket(v: ArrayData, flat: Array[Double], nPlanes: Int, dim: Int, isFloat: Boolean): Long = {
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      val base = p * dim
      while (i < dim) { dot += elem(v, i, isFloat) * flat(base + i); i += 1 }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Canonical text normalization for dedup/tokenization parity: Unicode
    * NFC composition (é as one codepoint whether the source wrote it
    * composed or as e + combining acute — without this, byte-level dedup
    * and shingle hashes silently treat the two spellings as different
    * documents), then ASCII whitespace runs collapse to one space and the
    * result is trimmed. Idempotent. The NFC quick-check fast path makes
    * already-normalized ASCII (most corpora) a no-allocation walk.
    */
  /** Mersenne-61 modulus for the rolling character-window hash. */
  final val M61 = (1L << 61) - 1
  private final val WIN_BASE = 1000003L

  /** `a * b mod (2^61 - 1)` for `a, b < 2^61 - 1`, via the classic Mersenne
    * reduction: the 128-bit product `hi·2^64 + lo` folds with
    * `2^64 ≡ 2^3 (mod 2^61 − 1)`.
    */
  @inline private def mulM61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & M61)
    if (r >= M61) r -= M61
    r
  }

  /** Distinct rolling hashes of ALL `w`-code-point character windows of `s`
    * (stride 1), first-occurrence order — the exact-substring membership
    * device behind character-level decontamination. Polynomial hash over
    * code points mod 2^61−1: O(len) per row TOTAL (the roll is O(1) per
    * window — an xxhash64 per window would cost O(w·len)); collision
    * probability per unequal window pair is ≤ w/2^61 for inputs chosen
    * independently of the base constant (a degree-w difference polynomial
    * has ≤ w roots mod the prime). The base is FIXED, so inputs crafted
    * against it can force collisions — fine for curation/decontamination
    * counts, not a cryptographic guarantee. Cross-engine count agreement
    * otherwise carries the same honesty contract as the 64-bit shingle
    * kernels. Code points (not UTF-16 chars or bytes) so window
    * boundaries agree with DuckDB's character-counting substr.
    */
  def charWindowHashes64(s: UTF8String, w: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    // B^(w-1) mod M61 for the roll-out term.
    var bw1 = 1L
    var e = 0
    while (e < w - 1) { bw1 = mulM61(bw1, WIN_BASE); e += 1 }
    val seen = new JLinkedHashSet[java.lang.Long]()
    var h = 0L
    var i = 0
    while (i < w) { h = (mulM61(h, WIN_BASE) + cps(i)) % M61; i += 1 }
    seen.add(h)
    while (i < n) {
      h = (h + M61 - mulM61(cps(i - w), bw1)) % M61
      h = (mulM61(h, WIN_BASE) + cps(i)) % M61
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Shannon entropy (nats) of the code-point distribution of `s`, one
    * compiled pass per row — the binary-junk/gibberish detector (natural
    * text sits near ~2.5-3.2 nats; base64/hex junk and single-char spam
    * sit far outside). Returns 0.0 for the empty string.
    */
  def charEntropy(s: UTF8String): Double = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    while (i < n) {
      val k = Integer.valueOf(cps(i))
      val c = counts.get(k)
      if (c == null) counts.put(k, Array(1)) else c(0) += 1
      i += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  /** `\p{N}` in the Java regex sense — the GPT-2 pre-tokenizer's number
    * class (decimal digits, letter numbers, other numbers), deliberately
    * wider than `Character.isDigit`.
    */
  private def isNum(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
    t == Character.OTHER_NUMBER
  }

  /** Greedy BPE merge count of one pre-tokenized segment
    * `str[start, end)`: the segment starts as its code-point sequence,
    * then the lowest-rank adjacent pair merges repeatedly until no
    * mergeable pair remains — the GPT-2 merge loop. O(w²) worst case on
    * segment length; segments are short, so in practice linear.
    */
  private def mergedSegmentCount(
      str: String,
      start: Int,
      end: Int,
      ranks: java.util.HashMap[String, Integer],
      sb: java.lang.StringBuilder
  ): Int = {
    if (end - start <= 1) return end - start
    mergeSegmentParts(str, start, end, ranks, sb).size
  }

  /** The greedy merge loop itself, returning the merged symbol list of one
    * pre-tokenized segment (shared by the count and segments kernels).
    */
  private def mergeSegmentParts(
      str: String,
      start: Int,
      end: Int,
      ranks: java.util.HashMap[String, Integer],
      sb: java.lang.StringBuilder
  ): java.util.ArrayList[String] = {
    val parts = new java.util.ArrayList[String](end - start)
    var i = start
    while (i < end) {
      val cp = str.codePointAt(i)
      parts.add(str.substring(i, i + Character.charCount(cp)))
      i += Character.charCount(cp)
    }
    var done = parts.size <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < parts.size - 1) {
        sb.setLength(0)
        sb.append(parts.get(j)).append(' ').append(parts.get(j + 1))
        val r = ranks.get(sb.toString)
        if (r != null && r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        parts.set(bestIdx, parts.get(bestIdx) + parts.get(bestIdx + 1))
        parts.remove(bestIdx + 1)
        if (parts.size <= 1) done = true
      }
    }
    parts
  }

  /** BPE token count of `s` under a merge-rank table, segmented by the
    * GPT-2-style pre-tokenizer before any merge runs: the lowercased
    * (Locale.ROOT — default-locale lowercasing breaks cross-JVM
    * determinism) text splits into contraction suffixes
    * ('s 't 're 've 'm 'll 'd), letter runs (`\p{L}+`), number runs
    * (`\p{N}+`), and punctuation/symbol runs (`[^\s\p{L}\p{N}]+`) — the
    * public GPT-2 pattern (openai/gpt-2 encoder.py), so merges can never
    * cross a letter/number/punctuation boundary no matter what the merge
    * table contains. The one deliberate deviation: GPT-2 attaches a single
    * leading space to a run; a space-containing symbol cannot be expressed
    * in the "left right" merge-pair format this kernel consumes, so
    * whitespace only separates segments. A contraction wins only when a
    * segment STARTS at the apostrophe (mid-punctuation-run apostrophes
    * stay in the run), matching the regex alternation's semantics.
    * `ranks` maps "left right" → priority (lower merges first). One
    * compiled pass per row.
    */
  def bpeTokenCount(s: UTF8String, ranks: java.util.HashMap[String, Integer]): Int = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var total = 0
    val sb = new java.lang.StringBuilder(16)
    preTokenize(str, (start, end) => total += mergedSegmentCount(str, start, end, ranks, sb))
    total
  }

  /** BPE SEGMENTS of `s` — the actual tokenized form, not just its count:
    * the same pre-tokenize + greedy-merge pipeline as [[bpeTokenCount]],
    * emitting the merged symbols space-joined (symbols never contain
    * whitespace — the pre-tokenizer strips it — so the join is unambiguous
    * and engine-portable). With a real merges.txt this is the true token
    * stream a training pipeline materializes before id lookup.
    */
  def bpeSegments(s: UTF8String, ranks: java.util.HashMap[String, Integer]): UTF8String = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(16)
    val out = new java.lang.StringBuilder(str.length + (str.length >> 2))
    preTokenize(str, { (start, end) =>
      val parts = mergeSegmentParts(str, start, end, ranks, sb)
      var p = 0
      while (p < parts.size) {
        if (out.length > 0) out.append(' ')
        out.append(parts.get(p))
        p += 1
      }
    })
    UTF8String.fromString(out.toString)
  }

  /** The PRE-TOKEN stream itself (no merges applied): the lowercased
    * GPT-2-style segments space-joined — the "word" units BPE training
    * counts frequencies over. Shares [[preTokenize]] with the count and
    * segments kernels, so a merge table learned over these words applies
    * through [[bpeTokenCount]]/[[bpeSegments]] with zero segmentation
    * drift (the train/apply mismatch that silently inflates fertility).
    */
  def preTokens(s: UTF8String): UTF8String = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(str.length)
    preTokenize(str, { (start, end) =>
      if (out.length > 0) out.append(' ')
      out.append(str, start, end)
    })
    UTF8String.fromString(out.toString)
  }

  /** The GPT-2-style pre-tokenizer scan shared by the BPE kernels: invokes
    * `f(start, end)` for each segment of the (already lowercased) string —
    * contraction suffixes, letter runs, number runs, punctuation runs;
    * whitespace separates (see [[bpeTokenCount]] for the contract).
    */
  private def preTokenize(str: String, f: (Int, Int) => Unit): Unit = {
    val n = str.length
    var i = 0
    while (i < n) {
      val c0 = str.codePointAt(i)
      if (Character.isWhitespace(c0)) i += Character.charCount(c0)
      else {
        val start = i
        val contrLen =
          if (c0 == '\'' && i + 1 < n) {
            val c1 = str.charAt(i + 1)
            if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') 2
            else if (i + 2 < n && ((c1 == 'r' && str.charAt(i + 2) == 'e') ||
                       (c1 == 'v' && str.charAt(i + 2) == 'e') ||
                       (c1 == 'l' && str.charAt(i + 2) == 'l'))) 3
            else 0
          } else 0
        if (contrLen > 0) i += contrLen
        else if (Character.isLetter(c0)) {
          while (i < n && Character.isLetter(str.codePointAt(i)))
            i += Character.charCount(str.codePointAt(i))
        } else if (isNum(c0)) {
          while (i < n && isNum(str.codePointAt(i)))
            i += Character.charCount(str.codePointAt(i))
        } else {
          var run = true
          while (i < n && run) {
            val cp = str.codePointAt(i)
            if (Character.isWhitespace(cp) || Character.isLetter(cp) || isNum(cp)) run = false
            else i += Character.charCount(cp)
          }
        }
        f(start, i)
      }
    }
  }

  def normalizeText(s: UTF8String): UTF8String = {
    val raw = s.toString
    val composed =
      if (java.text.Normalizer.isNormalized(raw, java.text.Normalizer.Form.NFC)) raw
      else java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(composed.length)
    var pendingSpace = false
    var i = 0
    while (i < composed.length) {
      val c = composed.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** PCA projection of one vector: out(c) = Σ_j (x_j − mean_j) · basis_{c,j}
    * — the centering + top-k rotation a billion-vector embedding pipeline
    * applies before quantization/clustering (SemDeDup §3 preprocesses this
    * way). `basis` is nComp × dim row-major; one compiled pass per row,
    * O(nComp · dim) multiplies.
    */
  def pcaProject(
      v: ArrayData,
      mean: Array[Double],
      basis: Array[Double],
      nComp: Int,
      dim: Int,
      isFloat: Boolean
  ): ArrayData = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"pca_project: dimension mismatch (${v.numElements()} vs $dim)")
    val out = new Array[Double](nComp)
    var c = 0
    while (c < nComp) {
      var acc = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) { acc += (elem(v, j, isFloat) - mean(j)) * basis(off + j); j += 1 }
      out(c) = acc
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Two-level IVF cell assignment: argmax-cosine over `kc` coarse
    * centroids, then argmax-cosine over ONLY the winning cell's
    * sub-centroids — the standard two-level coarse quantizer (faiss
    * IVF-on-IVF shape). Returns the GLOBAL fine cell id
    * (`fineStart(coarse) + subIdx`). Per-row cost is
    * O((kc + cellWidth) · dim) = O(2√k · dim) when balanced — independent
    * of the total fine cell count k, which is what lets k track n/256
    * unbounded at 100 TB instead of capping at whatever a flat argmax can
    * compile. The query vector's own norm divides out of every argmax
    * comparison, so only dot / centroidNorm is computed; centroid norms
    * arrive precomputed (`coarseNorm`, `fineNorm`). Ties break to the
    * lowest index — deterministic for bit-identical centroids.
    *
    * Layout: `coarseFlat` is kc × dim row-major; `fineFlat` packs every
    * cell's sub-centroids contiguously, `fineStart` (length kc + 1, in
    * centroid units) delimits cell c's subs at [fineStart(c),
    * fineStart(c+1)) — every cell has ≥ 1 sub-centroid (the trainer
    * guarantees it).
    */
  def ivfAssign(
      v: ArrayData,
      dim: Int,
      coarseFlat: Array[Double],
      coarseNorm: Array[Double],
      fineFlat: Array[Double],
      fineNorm: Array[Double],
      fineStart: Array[Int],
      isFloat: Boolean
  ): Int = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"ivf_assign: dimension mismatch (${v.numElements()} vs $dim)")
    val kc = coarseNorm.length
    var bestC = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < kc) {
      var dot = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) { dot += elem(v, j, isFloat) * coarseFlat(off + j); j += 1 }
      val s = dot / coarseNorm(c)
      if (s > bestS) { bestS = s; bestC = c }
      c += 1
    }
    val lo = fineStart(bestC)
    val hi = fineStart(bestC + 1)
    var bestF = lo
    var bestFs = Double.NegativeInfinity
    var f = lo
    while (f < hi) {
      var dot = 0.0
      var j = 0
      val off = f * dim
      while (j < dim) { dot += elem(v, j, isFloat) * fineFlat(off + j); j += 1 }
      val s = dot / fineNorm(f)
      if (s > bestFs) { bestFs = s; bestF = f }
      f += 1
    }
    bestF
  }

  /** Hashing-trick bucket of one token hash: xxhash64 folded into [0, dim).
    * `dim` must be a power of two (mask, no modulo bias on the low bits of
    * a well-mixed hash).
    */
  @inline private def bowBucket(h: Long, dim: Int): Int = (h & (dim - 1)).toInt

  /** Hashed bag-of-words bucket per token OCCURRENCE (hashing trick,
    * Weinberger et al. 2009) — the feature extractor shared bit-for-bit by
    * the driver-side trainer and the scoring kernel. Same tokenization as
    * the rest of the kernel family (whitespace runs, raw bytes — no
    * locale-dependent folding anywhere near the hash).
    */
  def bowBuckets(s: UTF8String, dim: Int): Array[Int] = {
    val b = s.getBytes
    val bounds = tokenBounds(b)
    val out = new Array[Int](bounds.length / 2)
    var t = 0
    while (t < bounds.length) {
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + bounds(t), bounds(t + 1) - bounds(t), SEED)
      out(t / 2) = bowBucket(h, dim)
      t += 2
    }
    out
  }

  // One Deflater (native zlib state) and scratch buffer per executor
  // thread, reset per row — allocating them per row would malloc/free
  // zlib state on the hot scan path. Never end()'d: the ThreadLocal
  // lives for the executor thread's lifetime, the standard pattern for
  // per-thread native codec state.
  private val deflaterTL = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = new java.util.zip.Deflater(6, true)
  }
  private val deflateBufTL = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** DEFLATE compression ratio of the text's UTF-8 bytes (compressed /
    * raw) — the classic cheap junk detector: highly repetitive boilerplate
    * compresses far below prose, random/encrypted blobs sit near (or
    * above) 1.0. One pass per row over a per-thread reused Deflater and
    * output buffer (the compressed size is summed, never materialized).
    * Deterministic within a JVM (the JDK bundles its own zlib); the
    * operator's gates are PROPERTY gates (ordering, bounds, determinism),
    * never exact ratios, so a zlib revision can't flip them.
    */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val def6 = deflaterTL.get()
    def6.reset()
    def6.setInput(raw)
    def6.finish()
    var total = 0L
    val buf = deflateBufTL.get()
    while (!def6.finished()) total += def6.deflate(buf)
    total.toDouble / raw.length
  }

  /** Linear text score σ(bias + Σ_tokens w[bucket(token)]) — feature
    * extraction and dot product fused into ONE pass over the bytes; no
    * histogram materializes. The serving half of the hashing-trick
    * logistic model ([[bowBuckets]] is the training half).
    */
  def linearTextScore(s: UTF8String, w: Array[Double], bias: Double): Double = {
    val b = s.getBytes
    val bounds = tokenBounds(b)
    val dim = w.length
    var z = bias
    var t = 0
    while (t < bounds.length) {
      val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + bounds(t), bounds(t + 1) - bounds(t), SEED)
      z += w(bowBucket(h, dim))
      t += 2
    }
    1.0 / (1.0 + math.exp(-z))
  }

  // --- URL canonicalization kernel ---------------------------------------
  // One compiled pass replicating UrlFunctions' documented contract STEP FOR
  // STEP with the same java.util.regex patterns the Column builtins compile
  // to, so outputs are byte-identical to the regexp-builtin formulation (and
  // to the DuckDB oracle that mirrors it textually). The kernel exists for
  // code-size, not semantics: the composed builtin tree is ~40 nested regexp
  // nodes, and any plan that duplicates it (predicate pushdown substituting
  // the grouping alias into a filter, as q_url_frontier's crawled-set cut
  // does) blows the generated stage past janino's limits and drops the whole
  // stage to interpreted execution. As one static call it survives any
  // number of substitutions.

  private val UrlSchemeP = java.util.regex.Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")
  private val WwwPrefixP = java.util.regex.Pattern.compile("^www\\.")
  private val Port80P = java.util.regex.Pattern.compile(":80$")
  private val Port443P = java.util.regex.Pattern.compile(":443$")
  private val TildeP = java.util.regex.Pattern.compile("%7[Ee]")
  private val DotRunsP = java.util.regex.Pattern.compile("/(\\./)+")
  private val TrailDotP = java.util.regex.Pattern.compile("/\\.$")
  // The segment alternation excludes literal '.' and '..' WITHOUT lookahead
  // (kept in the RE2∩Java dialect even though the kernel never reaches RE2 —
  // the oracle's regexes must stay textually derivable from these).
  private val UrlSeg = "([^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)"
  private val SegUpP = java.util.regex.Pattern.compile("/" + UrlSeg + "/\\.\\./")
  private val SegUpEndP = java.util.regex.Pattern.compile("/" + UrlSeg + "/\\.\\.$")
  private val LeadUpP = java.util.regex.Pattern.compile("^(/\\.\\.)+/")
  private val TrackParamsP =
    java.util.regex.Pattern.compile("&(utm_[^=&]*|ref|fbclid|gclid|mc_eid)=[^&]*")
  private val LeadAmpsP = java.util.regex.Pattern.compile("^&+")

  /** Lowercase via UTF8String (exactly the builtin `lower()`). */
  @inline private def lowerUtf8(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  def canonicalizeUrl(u0: UTF8String): UTF8String = {
    val u = u0.toString
    val sm = UrlSchemeP.matcher(u)
    // Not an absolute URL: passes through unchanged (relative references
    // are resolved, not canonicalized).
    if (!sm.lookingAt()) return u0
    val scheme = lowerUtf8(sm.group(1))
    val n = u.length
    var i = sm.end()
    val authStart = i
    while (i < n && { val c = u.charAt(i); c != '/' && c != '?' && c != '#' }) i += 1
    val noWww = WwwPrefixP.matcher(lowerUtf8(u.substring(authStart, i))).replaceAll("")
    val host = scheme match {
      case "http"  => Port80P.matcher(noWww).replaceAll("")
      case "https" => Port443P.matcher(noWww).replaceAll("")
      case _       => noWww
    }
    val pathStart = i
    while (i < n && { val c = u.charAt(i); c != '?' && c != '#' }) i += 1
    var p = if (pathStart == i) "/" else u.substring(pathStart, i)
    p = TrailDotP.matcher(DotRunsP.matcher(TildeP.matcher(p).replaceAll("~")).replaceAll("/")).replaceAll("/")
    var pass = 0
    while (pass < UrlFunctions.DotDotPasses) {
      p = LeadUpP
        .matcher(SegUpEndP.matcher(SegUpP.matcher(p).replaceAll("/")).replaceAll("/"))
        .replaceAll("/")
      pass += 1
    }
    // Query: the builtin's regexp_extract(u, "\?([^#]*)", 1) — first '?'
    // anywhere in the string, captured until '#' or end.
    val qIdx = u.indexOf('?')
    val rawQ =
      if (qIdx < 0) ""
      else {
        var j = qIdx + 1
        while (j < n && u.charAt(j) != '#') j += 1
        u.substring(qIdx + 1, j)
      }
    val cq = LeadAmpsP.matcher(TrackParamsP.matcher("&" + rawQ).replaceAll("")).replaceAll("")
    val out = new java.lang.StringBuilder(scheme.length + host.length + p.length + cq.length + 4)
    out.append(scheme).append("://").append(host).append(p)
    if (!cq.isEmpty) out.append('?').append(cq)
    UTF8String.fromString(out.toString)
  }

  /** Compiled-pattern cache for [[robotsBestMatch]]: distinct robots
    * patterns are few (the same /search, /admin, ... rules repeat across
    * hosts), so a shared map amortizes the per-row regex compile the HOF
    * form pays (Catalyst's RLike recompiles a NON-FOLDABLE pattern on every
    * invocation — per candidate × per rule on the robots decision path).
    * Defensively bounded: an adversarial pattern population clears the map
    * rather than growing it without bound (recompiles, never breaks).
    */
  private val robotsPatterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def robotsPattern(rx: String): java.util.regex.Pattern = {
    if (robotsPatterns.size() > 8192) robotsPatterns.clear()
    robotsPatterns.computeIfAbsent(rx, (k: String) => java.util.regex.Pattern.compile(k))
  }

  /** The robots longest-match election over a parsed-rule array — one tight
    * loop replacing filter+transform+array_max over regexp_like (the
    * TextQueries.robotsBestMatchRx HOF form, spec-pinned element-identical):
    * `rules` is array<struct<prefix string, allow boolean, rx string>>,
    * result is struct<l int, allow boolean, prefix string> of the best
    * matching rule — longest raw pattern wins, allow wins a same-length
    * tie, then lexicographically-greatest prefix (the array_max struct
    * order) — or null when nothing matches.
    */
  def robotsBestMatch(
      rules: ArrayData,
      path: UTF8String
  ): org.apache.spark.sql.catalyst.InternalRow = {
    val p = path.toString
    var bestL = -1
    var bestAllow = false
    var bestPrefix: UTF8String = null
    var i = 0
    val n = rules.numElements()
    while (i < n) {
      if (!rules.isNullAt(i)) {
        val r = rules.getStruct(i, 3)
        val rx = r.getUTF8String(2).toString
        if (robotsPattern(rx).matcher(p).find()) {
          val prefix = r.getUTF8String(0)
          val l = prefix.numChars()
          val allow = r.getBoolean(1)
          val better =
            l > bestL ||
              (l == bestL && ((allow && !bestAllow) ||
                (allow == bestAllow && (bestPrefix == null || prefix.compareTo(bestPrefix) > 0))))
          if (better) {
            bestL = l
            bestAllow = allow
            bestPrefix = prefix.clone()
          }
        }
      }
      i += 1
    }
    if (bestL < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestL, bestAllow, bestPrefix))
  }
}
