package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RocksDB state-store seam (Engine.useRocksDbStateStore — SURVEY §5):
  * at 100 TB the default HDFS-backed provider holds all live streaming
  * state on-heap and uploads full snapshots; RocksDB + changelog
  * checkpointing is the deployment shape for q_stream_join's four state
  * stores per shuffle partition. These specs prove the seam actually
  * engages (checkpoint artifacts are the provider's, not the default's)
  * and that the heaviest stateful query stays correct under it.
  */
class StateStoreSpec extends AnyFunSuite with SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    Engine.useRocksDbStateStore(spark)
    try body
    finally Engine.useRocksDbStateStore(spark, enable = false)
  }

  private def listRec(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    kids ++ kids.filter(_.isDirectory).flatMap(listRec)
  }

  test("the seam engages RocksDB: checkpoint state artifacts are RocksDB's, not the default's") {
    // A minimal stateful stream with a spec-owned checkpoint dir, so the
    // state files can be inspected: the default provider writes .delta /
    // .snapshot files; RocksDB with changelog checkpointing writes
    // .changelog files and .zip snapshots.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocksdb_ckpt").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_rocksdb_out").toFile
    withRocksDb {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      import org.apache.spark.sql.streaming.Trigger
      val q = spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .select(col("event_id"), col("user_id"))
        .dropDuplicates("event_id")
        .writeStream
        .format("parquet")
        .option("path", out.getPath)
        .option("checkpointLocation", ckpt.getPath)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val stateFiles = listRec(new java.io.File(ckpt, "state")).filterNot(_.isDirectory)
    val names = stateFiles.map(_.getName)
    assert(names.exists(n => n.endsWith(".changelog") || n.endsWith(".zip")),
      s"no RocksDB changelog/snapshot artifacts in the checkpoint: $names")
    assert(!names.exists(_.endsWith(".delta")),
      s"default-provider .delta files present — the seam did not engage: $names")
    val dedupCount = spark.read.parquet(out.getPath).count()
    val exact = Tables.eventsRaw(spark, sfDir).select("event_id").distinct().count()
    assert(dedupCount == exact, "stateful dedup under RocksDB must match the exact distinct count")
  }

  test("q_stream_join runs green under RocksDB and matches its batch equivalent") {
    val streamed = withRocksDb {
      QueryRegistry.queries("q_stream_join")(spark, sfDir).collect()
    }
    // The batch self-join with identical semantics (the oracle's SQL shape).
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    val batch = clicks
      .join(
        purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR")
      )
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("click_ts"), col("purchase_ts"))
      .collect()
    assert(streamed.toSet == batch.toSet,
      s"stream-stream join under RocksDB diverged: ${streamed.length} vs ${batch.length} rows")
    assert(streamed.nonEmpty)
  }
}
