package graft

import graft.functions.{SketchImpl, TextFunctions}
import graft.operators.TextClassifier
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the hashing-trick logistic classifier (q_quality_classifier).
  *
  * The driver corpus's synthetic `lang` labels carry no text signal, so —
  * exactly like the k-means suite's deliberate rejection of a label-purity
  * gate — accuracy is asserted on a PLANTED separable corpus, and the rest
  * of the contract is structural: the training objective improves with
  * epochs, training is bit-deterministic, the serving kernel computes the
  * same score as the trainer's math, and the scoring plan never shuffles.
  */
class ClassifierSpec extends AnyFunSuite with SparkSpec {

  /** The planted separable corpus now lives on TextClassifier (shared with
    * the registered q_quality_classifier audit) — same generator, same
    * seed, same 300/100 split convention.
    */
  private lazy val planted: Seq[(String, Boolean)] = TextClassifier.plantedCorpus

  private lazy val train    = planted.take(300)
  private lazy val holdout  = planted.drop(300)

  test("planted holdout accuracy >= 0.95") {
    val m = TextClassifier.train(train)
    val acc = holdout.count { case (t, y) => (m.score(t) >= 0.5) == y }.toDouble / holdout.size
    assert(acc >= 0.95, s"holdout accuracy $acc")
  }

  test("more epochs strictly improve the training objective") {
    val l1  = TextClassifier.logLoss(TextClassifier.train(train, epochs = 1), train)
    val l30 = TextClassifier.logLoss(TextClassifier.train(train, epochs = 30), train)
    assert(l30 < l1, s"loss must fall with epochs: 1 epoch $l1, 30 epochs $l30")
  }

  test("training is bit-deterministic") {
    val a = TextClassifier.train(train)
    val b = TextClassifier.train(train)
    assert(a.bias == b.bias && java.util.Arrays.equals(a.weights, b.weights))
  }

  test("serving kernel equals trainer math (no train/serve skew)") {
    val m = TextClassifier.train(train, dim = 256)
    planted.take(20).foreach { case (t, _) =>
      val idx = SketchImpl.bowBuckets(UTF8String.fromString(t), 256)
      // Accumulate in the kernel's exact order (bias first, tokens in
      // sequence) — bit equality, not tolerance.
      var z = m.bias
      idx.foreach(i => z += m.weights(i))
      val ref = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(m.score(t) - ref) == 0.0, s"kernel/trainer mismatch on: $t")
    }
  }

  test("multiclass one-vs-rest: planted language holdout >= 0.95; serving is one fused map pass") {
    // The learned language-ID head (q_lang_id_learned wraps this as its
    // banded audit): four one-vs-rest heads on the planted multilingual
    // corpus, argmax prediction, and all four native kernels fused into
    // one zero-shuffle scan pass.
    val corpus = TextClassifier.plantedLangCorpus
    val langs = TextClassifier.plantedLangs
    val heads = langs.map(l =>
      l -> TextClassifier.train(corpus.take(300).map { case (t, y) => (t, y == l) }))
    val acc = corpus.drop(300).count { case (t, y) =>
      heads.maxBy { case (_, m) => m.score(t) }._1 == y
    }.toDouble / 100
    assert(acc >= 0.95, s"multiclass holdout accuracy $acc")
    import org.apache.spark.sql.functions._
    val df = Tables.documents(spark, sfDir).select(
      col("doc_id") +: heads.map { case (l, m) =>
        graft.functions.TextFunctions.linearTextScore(col("text"), m.weights.toIndexedSeq, m.bias).as(s"s_$l")
      }: _*)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"four-head scoring must not shuffle:\n$p")
    assert(df.count() > 0)
  }

  test("quality scoring is a single map pass, zero shuffles") {
    // Production score table — the registered q_quality_classifier is its
    // banded audit wrapper (which aggregates, so the pin lives here).
    val df = TextQueries.qualityScores(spark, sfDir)
    val p  = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"scoring must not shuffle:\n$p")
    assert(p.toLowerCase.contains("lineartextscore"),
      s"native kernel missing from plan:\n$p")
    assert(df.count() > 0)
  }

  test("the scoring kernel is stream-ready: readStream scores equal batch scores") {
    // The serving pass is a plain Column over a string — the SAME
    // expression scores a Structured Stream (the online-filtering
    // deployment: classify documents as they land, no retraining, no
    // state). Batch/stream parity must be exact.
    import org.apache.spark.sql.functions._
    val m = TextClassifier.train(train)
    val dir = java.nio.file.Files.createTempDirectory("cls_stream").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val out = s"$dir/out"
    val q = spark.readStream
      .schema(docs.schema)
      .parquet(s"$dir/in")
      .select(col("doc_id"),
        TextFunctions.linearTextScore(col("text"), m.weights.toSeq, m.bias).as("score"))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .format("parquet")
      .start(out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = docs
      .select(col("doc_id"),
        TextFunctions.linearTextScore(col("text"), m.weights.toSeq, m.bias).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch, "stream and batch scores must be bit-identical")
  }

  test("non-finite bias survives whole-stage codegen (reference object, not a spliced literal)") {
    import spark.implicits._
    // A spliced source literal would render NaN/Infinity — invalid Java —
    // and compile-fail where the interpreted path runs; with fallback
    // disabled that failure is fatal instead of a silent de-optimization.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq("some tokens here").toDF("text")
      val w = Seq.fill(8)(0.0)
      val nanScore = df
        .select(TextFunctions.linearTextScore(col("text"), w, Double.NaN).as("s"))
        .head().getDouble(0)
      assert(nanScore.isNaN, "sigma(NaN + 0) must propagate NaN")
      val infScore = df
        .select(TextFunctions.linearTextScore(col("text"), w, Double.PositiveInfinity).as("s"))
        .head().getDouble(0)
      assert(infScore == 1.0, "sigma(+Inf) must saturate to 1.0")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
