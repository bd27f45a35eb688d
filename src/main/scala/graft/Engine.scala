package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with scale-oriented defaults.
  *
  * Settings are chosen for a large multi-executor cluster and validated on
  * local[32]: AQE re-plans shuffles at runtime (coalescing + skew-join), a
  * modest shuffle-partition floor that AQE can grow, and auto broadcast for
  * dimension tables. See SURVEY.md §5.
  */
object Engine {
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      // Runtime bloom-filter join pruning: the selective side of a shuffle
      // join broadcasts a bloom of its keys so the big side's scan drops
      // non-matching rows before the shuffle — a fact-table win at scale.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Streaming state-store seam (SURVEY.md §5). The default HDFS-backed
    * provider keeps every live state row ON-HEAP per executor and uploads
    * full snapshots to the checkpoint — fine for bounded tests, a memory
    * and upload ceiling for q_stream_join's four state stores per shuffle
    * partition at 100 TB. RocksDB keeps state on local disk (executor heap
    * no longer bounds live keys) and, with changelog checkpointing, uploads
    * only each batch's delta, snapshotting in the background.
    *
    * Session-conf scoped: a streaming query binds its provider at START
    * and the provider is part of the checkpoint's identity, so flip the
    * seam BEFORE starting a query and never under an existing checkpoint.
    */
  def useRocksDbStateStore(spark: SparkSession, enable: Boolean = true): Unit =
    if (enable) {
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    } else {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
}

/** Typed loaders for the driver testdata star schema (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst column pruning and filter
  * pushdown apply to every downstream operator.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and truncate to
    * microseconds — the same ns→µs truncation DuckDB applies, so oracles agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  /** `events` with `ts` still the raw int64 nanos from the parquet footer.
    * Predicates on this column push to the scan (and would partition-prune a
    * date-partitioned table at scale) — the timestamp-typed view in [[events]]
    * wraps `ts` in a conversion expression, which blocks pushdown.
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
