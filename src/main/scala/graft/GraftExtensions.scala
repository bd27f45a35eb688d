package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Registers graft's native sketch expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(text) ...")` works anywhere the extension is
  * installed (`Engine.session` wires it in; external users can set
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "simhash64", es => SimHash64(one(es, "simhash64")))
    register(ext, "shingles", es => ShingleNGrams(one(es, "shingles"), 3))
    register(ext, "hashed_shingles", es => HashedShingles(one(es, "hashed_shingles"), 3))
    register(ext, "minhash_signature", es => MinHashSignature(one(es, "minhash_signature"), 64))
    register(ext, "minhash_bands", es => MinHashBands(one(es, "minhash_bands"), 64, 16, 4))
    register(ext, "cosine_sim", es => CosineSim(two(es, "cosine_sim")._1, two(es, "cosine_sim")._2))
    register(ext, "word_rep_stats", es => WordRepStats(one(es, "word_rep_stats")))
    register(ext, "normalize_text", es => NormalizeText(one(es, "normalize_text")))
    register(ext, "char_entropy", es => CharEntropy(one(es, "char_entropy")))
    register(ext, "char_window_hashes64", es => CharWindowHashes64(one(es, "char_window_hashes64"), 32))
    register(ext, "bpe_token_count", es => BpeTokenCount(one(es, "bpe_token_count"), TextFunctions.demoBpeMerges))
    register(ext, "bpe_segments", es => BpeSegments(one(es, "bpe_segments"), TextFunctions.demoBpeMerges))
    register(ext, "deflate_ratio", es => DeflateRatio(one(es, "deflate_ratio")))
  }
}

object GraftExtensions {
  private def one(es: Seq[Expression], name: String): Expression = {
    require(es.length == 1, s"$name expects 1 argument, got ${es.length}")
    es.head
  }

  private def two(es: Seq[Expression], name: String): (Expression, Expression) = {
    require(es.length == 2, s"$name expects 2 arguments, got ${es.length}")
    (es(0), es(1))
  }

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      builder: Seq[Expression] => Expression
  ): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder
      )
    )
}
