package graft.tools

/** Exclusive same-scale variance probe (SURVEY §6 bench-flag adjudication):
  * run ONE registered query N times back-to-back on an otherwise idle host
  * and print min / median / max / spread. Exists because the per-round
  * bench's median-normalized `regressions` flag cannot distinguish a plan
  * regression from host noise for a query whose run-to-run spread is
  * naturally wide — q_dedup_substrings flagged in rounds 7/8, 13, and 14 on
  * unchanged code; this tool measures the honest envelope so the flag can
  * be adjudicated against data instead of re-litigated every round.
  *
  * Usage: `runMain graft.tools.VarianceProbe [query] [sfDir] [n]`
  */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_substrings")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.Engine.session("local[32]", 32)
    val ts = (1 to n).map { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[$i/$n] $name $t%.2f s")
      System.gc()
      t
    }.sorted
    val median = ts(ts.size / 2)
    println(f"$name n=$n min=${ts.head}%.2f s median=$median%.2f s max=${ts.last}%.2f s " +
      f"spread=${(ts.last / ts.head - 1.0) * 100}%.0f%% (max/min)")
    spark.stop()
  }
}
