package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The zero-variance boundary of the moment-derived stats family
  * (q_anomaly_zscore, q_corr_stats, q_stream_anomaly): a constant-value
  * group has sd = 0, where an unguarded (x − mean)/sd yields Inf/NaN in
  * Spark but RAISES in DuckDB, and double cancellation can push
  * n·Σx² − (Σx)² a hair below zero, where Spark's sqrt returns NaN and
  * DuckDB raises — either way the oracle hash gate breaks the day the
  * data grows a constant group. The queries guard with greatest(var, 0)
  * + NULLIF(sd, 0) — IDENTICAL expressions in both engines — so the
  * degenerate group yields NULL everywhere. These tests plant the
  * constant group the sf corpora happen to lack.
  */
class ZeroVarianceSpec extends AnyFunSuite with SparkSpec {

  private def writeEvents(dir: String): Unit = {
    import spark.implicits._
    // ts as int64 nanos — the layout Tables.events expects (DIV 1000 → µs).
    // The "varies" group needs n ≈ 21: the max attainable |z| in a sample
    // of n is (n−1)/√n, so a 4-row group can never clear the |z| > 3
    // stream filter no matter how extreme the outlier.
    val const = (1L to 4L).map(i => (i, i * 1000000000L, i, "const", 5.0, "{}"))
    val tight = (5L to 24L).map(i => (i, i * 1000000000L, i, "varies", 1.0, "{}"))
    val outlier = Seq((25L, 25000000000L, 25L, "varies", 100.0, "{}"))
    val df = (const ++ tight ++ outlier)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // The driver testdata lays each table out as ONE flat parquet FILE
    // (q_stream_anomaly's pathGlobFilter matches that file name), so
    // surface the single part file under the bare table name.
    val tmp = s"$dir/_ev"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files
      .list(java.nio.file.Paths.get(tmp))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
  }

  test("q_anomaly_zscore: a constant-value event_type yields NULL z, never NaN/Inf") {
    val dir = Files.createTempDirectory("zerovar_zscore").toString
    writeEvents(dir)
    val rows = SparkEntry.queries("q_anomaly_zscore")(spark, dir).collect()
    val const = rows.filter(_.getAs[String]("event_type") == "const")
    assert(const.length == 4)
    assert(const.forall(_.isNullAt(const.head.fieldIndex("z"))),
      "constant group must produce NULL z (NULLIF guard), not Inf/NaN")
    assert(const.forall(_.isNullAt(const.head.fieldIndex("is_outlier"))))
    val varies = rows.filter(_.getAs[String]("event_type") == "varies")
    assert(varies.forall { r =>
      val z = r.getAs[Double]("z"); !z.isNaN && !z.isInfinite
    }, "non-degenerate group must keep finite z")
  }

  test("q_corr_stats: a constant-x group yields NULL slope/intercept/r, finite covar elsewhere") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zerovar_corr").toString
    Seq(
      ("C", 7.0, 10.0), ("C", 7.0, 20.0), ("C", 7.0, 30.0),
      ("V", 1.0, 10.0), ("V", 2.0, 25.0), ("V", 3.0, 28.0)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_corr_stats")(spark, dir).collect()
    val byFlag = rows.map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val c = byFlag("C")
    for (f <- Seq("slope", "intercept", "r"))
      assert(c.isNullAt(c.fieldIndex(f)), s"constant-x group must yield NULL $f")
    assert(!c.isNullAt(c.fieldIndex("covar_pop")), "covariance of a constant-x group is 0, not NULL")
    val v = byFlag("V")
    for (f <- Seq("slope", "intercept", "r", "covar_pop")) {
      val d = v.getAs[Double](f)
      assert(!d.isNaN && !d.isInfinite, s"non-degenerate group must keep finite $f")
    }
  }

  test("q_stream_anomaly: a constant-value event_type is filtered (NULL z), not emitted as NaN") {
    val dir = Files.createTempDirectory("zerovar_stream").toString
    writeEvents(dir)
    val rows = SparkEntry.queries("q_stream_anomaly")(spark, dir).collect()
    assert(!rows.exists(_.getAs[String]("event_type") == "const"),
      "constant group rows must drop out of the anomaly stream (NULL comparison), not flood it as NaN outliers")
    assert(rows.forall { r => val z = r.getAs[Double]("z"); !z.isNaN && !z.isInfinite })
  }
}
