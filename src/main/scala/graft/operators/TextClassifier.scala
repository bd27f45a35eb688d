package graft.operators

import graft.functions.SketchImpl
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side trainer for the hashing-trick logistic text classifier
  * (fastText-style linear model; hashing trick per Weinberger et al. 2009).
  *
  * Scale contract (SURVEY.md §5 bounded-driver-state family): training
  * touches ONLY a bounded deterministic sample — a linear model on hashed
  * bag-of-words converges on a few hundred documents, so the train step is
  * O(sample × epochs), never O(corpus), and the result is `dim` doubles of
  * driver state (32 KB at the default 4096) shipped to executors as a plan
  * constant. Serving is the native [[graft.functions.LinearTextScore]]
  * kernel: one fused pass per row inside whole-stage codegen, zero
  * shuffles. Features are extracted by the SAME compiled code path
  * ([[SketchImpl.bowBuckets]]) at train and serve time, so there is no
  * train/serve skew by construction.
  *
  * Training is bit-deterministic: zero init, fixed epoch count, sequential
  * pass in sample order, no randomness anywhere — two trainings on the
  * same sample produce identical weights (spec-pinned).
  */
object TextClassifier {

  final case class Model(weights: Array[Double], bias: Double) {
    def score(text: String): Double =
      SketchImpl.linearTextScore(UTF8String.fromString(text), weights, bias)
  }

  private def featurize(sample: Seq[(String, Boolean)], dim: Int): Seq[(Array[Int], Double)] =
    sample.map { case (text, label) =>
      (SketchImpl.bowBuckets(UTF8String.fromString(text), dim), if (label) 1.0 else 0.0)
    }

  /** Logistic regression by deterministic SGD (per-example updates in
    * sample order, L2 on touched weights). `dim` must be a power of two —
    * the kernel mask-folds hashes.
    */
  def train(
      sample: Seq[(String, Boolean)],
      dim: Int = 4096,
      epochs: Int = 30,
      lr: Double = 0.5,
      l2: Double = 1e-4
  ): Model = {
    require(dim > 0 && (dim & (dim - 1)) == 0, "dim must be a power of two")
    val feats = featurize(sample, dim)
    val w = new Array[Double](dim)
    var b = 0.0
    var e = 0
    while (e < epochs) {
      feats.foreach { case (idx, y) =>
        var z = b
        var i = 0
        while (i < idx.length) { z += w(idx(i)); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val g = p - y
        b -= lr * g
        i = 0
        while (i < idx.length) {
          val j = idx(i)
          w(j) = w(j) * (1.0 - lr * l2) - lr * g
          i += 1
        }
      }
      e += 1
    }
    Model(w, b)
  }

  /** Deterministic LCG stream (Knuth MMIX constants) so the planted corpus
    * below is identical on every run and every JVM.
    */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  /** Planted separable corpus for accuracy gates: positives and negatives
    * share a common vocabulary but each class mixes in ~25% tokens from its
    * own marker pool — separable, not trivially so (every doc is mostly
    * shared words). The driver corpus's synthetic `lang` labels carry no
    * text signal (marker-word argmax lands near the base rate on them), so
    * — exactly like the k-means suite's deliberate rejection of a
    * label-purity gate — learning-accuracy claims live HERE, shared by
    * ClassifierSpec and the registered q_quality_classifier audit.
    * Convention: first 300 rows train, last 100 hold out.
    */
  lazy val plantedCorpus: Seq[(String, Boolean)] = {
    val shared = Vector("table", "scan", "join", "filter", "group", "sort", "row", "key")
    val posV   = Vector("sunlit", "meadow", "harvest", "orchard")
    val negV   = Vector("gravel", "rusted", "derelict", "scrapyard")
    val rnd    = lcg(0xC1A551F1E5L)
    (0 until 400).map { i =>
      val pos  = i % 2 == 0
      val pool = if (pos) posV else negV
      val words = (0 until 30).map { _ =>
        val r = (rnd.next() >>> 8).toInt
        if ((r & 3) == 0) pool((r >>> 2) % pool.length)
        else shared((r >>> 2) % shared.length)
      }
      (words.mkString(" "), pos)
    }
  }

  /** Mean log loss of a model on a labeled sample (clamped away from
    * log(0)) — the training objective, exposed so specs can pin
    * "more epochs ⇒ lower loss" the way the k-means suite pins
    * Lloyd-improves-objective.
    */
  def logLoss(model: Model, sample: Seq[(String, Boolean)]): Double = {
    val eps = 1e-12
    val ls = sample.map { case (text, label) =>
      val p = math.min(1.0 - eps, math.max(eps, model.score(text)))
      if (label) -math.log(p) else -math.log(1.0 - p)
    }
    ls.sum / ls.length
  }

  /** Planted MULTILINGUAL corpus for the learned language-ID gates
    * (q_lang_id_learned) — [[plantedCorpus]]'s discipline lifted to four
    * classes: every document is mostly the SAME shared vocabulary, with
    * ~25% of tokens drawn from its language's function-word pool
    * (separable, not trivially so). The driver corpus's synthetic `lang`
    * labels carry no text signal, so — as with every learned operator
    * here — accuracy claims live on THIS planted corpus, never on
    * fixture-label purity. Convention: first 300 rows train (75 per
    * class), last 100 hold out (25 per class).
    */
  val plantedLangs: Seq[String] = Seq("en", "de", "fr", "es")

  lazy val plantedLangCorpus: Seq[(String, String)] = {
    val shared = Vector("table", "scan", "join", "filter", "group", "sort", "row", "key")
    val pools = Map(
      "en" -> Vector("the", "whilst", "among", "because"),
      "de" -> Vector("und", "nicht", "aber", "doch"),
      "fr" -> Vector("mais", "avec", "donc", "chez"),
      "es" -> Vector("pero", "desde", "hacia", "aunque"))
    val rnd = lcg(0x1A9601DC0DEL)
    (0 until 400).map { i =>
      val lang = plantedLangs(i % plantedLangs.length)
      val pool = pools(lang)
      val words = (0 until 30).map { _ =>
        val r = (rnd.next() >>> 8).toInt
        if ((r & 3) == 0) pool((r >>> 2) % pool.length)
        else shared((r >>> 2) % shared.length)
      }
      (words.mkString(" "), lang)
    }
  }

  /** Logistic model over a small DENSE numeric feature vector — the
    * learned-reranker slot (q_rerank_learned): a cross-encoder's
    * (query, doc) relevance head reduced to its linear form over explicit
    * features. Driver state is n_features + 1 doubles shipped to executors
    * as plan constants; serving is a plain codegen'd column expression.
    */
  final case class NumericModel(weights: Array[Double], bias: Double) {
    def score(f: Array[Double]): Double = {
      var z = bias
      var i = 0
      while (i < f.length) { z += weights(i) * f(i); i += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
  }

  /** Deterministic logistic SGD over dense numeric features — the [[train]]
    * discipline exactly (zero init, fixed epochs, sequential sample order,
    * L2, no randomness), so two trainings on the same sample are
    * bit-identical.
    */
  def trainNumeric(
      sample: Seq[(Array[Double], Boolean)],
      epochs: Int = 200,
      lr: Double = 0.1,
      l2: Double = 1e-4
  ): NumericModel = {
    require(sample.nonEmpty, "numeric training sample must be non-empty")
    val nf = sample.head._1.length
    val w = new Array[Double](nf)
    var b = 0.0
    var e = 0
    while (e < epochs) {
      sample.foreach { case (f, label) =>
        var z = b
        var i = 0
        while (i < nf) { z += w(i) * f(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val g = p - (if (label) 1.0 else 0.0)
        b -= lr * g
        i = 0
        while (i < nf) {
          w(i) = w(i) * (1.0 - lr * l2) - lr * g * f(i)
          i += 1
        }
      }
      e += 1
    }
    NumericModel(w, b)
  }

  def logLossNumeric(model: NumericModel, sample: Seq[(Array[Double], Boolean)]): Double = {
    val eps = 1e-12
    val ls = sample.map { case (f, label) =>
      val p = math.min(1.0 - eps, math.max(eps, model.score(f)))
      if (label) -math.log(p) else -math.log(1.0 - p)
    }
    ls.sum / ls.length
  }
}
