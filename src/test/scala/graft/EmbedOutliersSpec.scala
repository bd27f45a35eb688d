package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of q_embed_outliers beyond the oracle: a vector planted far
  * from its label's cluster must surface at rank 1, and the report must be
  * exactly k rows per label in farthest-first order.
  */
class EmbedOutliersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def writeEmbeddings(dir: String): Unit = {
    val dim = 16
    // Two tight clusters: label 0 near (1,0,1,0,…), label 1 near
    // (0,1,0,1,…), tiny deterministic per-vector jitter; one planted
    // outlier per label sitting at 10× the jitter radius.
    def base(label: Int, i: Int): (Long, Array[Float], Int) = {
      val v = Array.tabulate(dim) { d =>
        val core = if (d % 2 == label % 2) 0f else 1f
        core + 0.01f * (((i * 31 + d * 17) % 7) - 3)
      }
      ((label * 100 + i).toLong, v, label)
    }
    val normal = for (l <- 0 to 1; i <- 0 until 20) yield base(l, i)
    val planted = Seq(
      (990L, Array.tabulate(dim)(d => if (d % 2 == 0) 5f else -4f), 0),
      (991L, Array.tabulate(dim)(d => if (d % 2 == 1) 5f else -4f), 1)
    )
    (normal ++ planted)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("planted far vectors rank 1 in their label; k rows per label, farthest-first") {
    val dir = Files.createTempDirectory("embout").toString
    writeEmbeddings(dir)
    val rows = SparkEntry.queries("q_embed_outliers")(spark, dir).collect()
    assert(rows.length == 6, "k=3 rows per label over 2 labels")
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(byLabel.keySet == Set(0, 1))
    for ((label, rs) <- byLabel) {
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
      val top = sorted.head
      assert(top.getAs[Long]("vec_id") == 990L + label,
        s"label $label: planted outlier must rank first, got ${top.getAs[Long]("vec_id")}")
      val dists = sorted.map(_.getAs[Double]("dist2")).toSeq
      assert(dists == dists.sorted.reverse, s"label $label: ranks must be farthest-first: $dists")
      assert(dists.head > 10 * dists(1),
        s"label $label: planted outlier must dominate the in-cluster jitter: $dists")
    }
  }
}
