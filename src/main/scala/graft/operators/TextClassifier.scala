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
}
