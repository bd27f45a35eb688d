package graft.tools

/** One-off measurement (r13 review item 7): does the RocksDB state-store
  * provider (+ changelog checkpointing) move q_stream_join_outer's cost?
  * The query is the bench's most expensive (7.29 s at sf0.1) — an honest
  * dual-watermark outer-join state cost; this experiment decides whether
  * that is the HDFS-backed provider's overhead or the true floor.
  *
  * MEASURED (sf0.1, local[32], tmpfs, both provider orders to cancel the
  * ~2-3× first-run warmup): warm-state HDFS-backed 6.6-7.5 s, RocksDB +
  * changelog 7.0-7.9 s — AT PAR within the bench's ±15 % run-to-run
  * spread. Conclusion: ~7 s is the true floor of the dual-watermark
  * outer join at this scale (micro-batch scheduling + the no-data
  * null-flush batches), not provider overhead, so the bench path keeps
  * the default provider; at real 100 TB/day state sizes RocksDB remains
  * the deployment choice for its off-heap, disk-backed state
  * (Engine.useRocksDbStateStore is the one-call seam, already exercised
  * by q_stream_quota whose transformWithState REQUIRES it).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.StateStoreExperiment [reverse]
  */
object StateStoreExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Same tmpfs redirect as Bench: state-store commits are fsync-heavy and
    // disk-backed /tmp dominates streaming variance.
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
      val d = java.nio.file.Files.createTempDirectory(shm, "graft_ssexp_tmp")
      System.setProperty("java.io.tmpdir", d.toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit))
    }
    val spark = graft.Engine.session("local[32]", 32)
    spark.range(1000000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.QueryRegistry.queries("q_stream_join_outer")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Alternate the order across invocations if comparing by hand: the
    // first provider measured absorbs JVM/codegen warmup (measured ~2-3×
    // on its first run even after the generic warmup above).
    val order = if (args.headOption.contains("reverse")) Seq("rocksdb", "hdfs") else Seq("hdfs", "rocksdb")
    for (provider <- order) {
      graft.Engine.useRocksDbStateStore(spark, enable = provider == "rocksdb")
      val times = (1 to 3).map { _ => System.gc(); run() }
      println(f"$provider%-8s runs=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f median=${times.sorted.apply(1)}%.2f")
    }
    graft.Engine.useRocksDbStateStore(spark, enable = false)
    spark.stop()
  }
}
