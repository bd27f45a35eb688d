package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary for the events table.
  *
  * The driver's testdata generator has shipped `events.ts` in two parquet
  * flavors across rounds: TIMESTAMP(NANOS) stored as int64 (readable only as
  * LongType under `spark.sql.legacy.parquet.nanosAsLong`) and plain
  * timestamp[us] (TIMESTAMP_NTZ under Spark's reader). Round 9 lost 33
  * queries to a loader hard-coded for the first flavor; this spec pins the
  * loader's dual-mode contract so the next regeneration degrades to a red
  * canary instead of a third of the suite.
  *
  * Both fixtures encode the SAME wall-clock instants, so every
  * events-consuming query must return identical results under either footer.
  */
class EventsSchemaCanarySpec extends AnyFunSuite with SparkSpec {

  /** (event_id, µs-since-epoch, user_id, event_type, value, props) — spans
    * the q_incremental_watermark cutoff (2024-01-20) on both sides and puts
    * several events inside one hour/session for the rollup/gap queries.
    */
  private val baseUs = java.time.LocalDateTime
    .of(2024, 1, 19, 22, 0)
    .toInstant(java.time.ZoneOffset.UTC)
    .toEpochMilli * 1000L
  private val rows: Seq[(Long, Long, Long, String, Double, String)] =
    (0L until 48L).map { i =>
      val types = Seq("view", "click", "purchase", "signup")
      (i + 1, baseUs + i * 30L * 60L * 1000000L, // every 30 min for 24 h
        i % 5 + 1, types((i % 4).toInt), i * 1.5 - 3.0, "{}") // first rows negative → q_quarantine has catch
    }

  /** Lay the df out the way the driver does: ONE flat parquet FILE named
    * `events.parquet` (q_stream_* pathGlobFilter matches the file name).
    */
  private def surfaceSingleFile(df: DataFrame, dir: String): Unit = {
    val tmp = s"$dir/_ev"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files
      .list(Paths.get(tmp))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst()
      .get()
    Files.move(part, Paths.get(s"$dir/events.parquet"))
  }

  /** A REAL TIMESTAMP(NANOS) parquet footer — what the driver's generator
    * shipped through round 8. Spark cannot WRITE nanos timestamps, so the
    * file is written with parquet-java's example Group API directly; without
    * `spark.sql.legacy.parquet.nanosAsLong` Spark's reader REJECTS this
    * annotation outright, so the fixture pins both the conf's necessity and
    * the DIV-1000 branch (a plain unannotated int64 column would read as
    * LongType with or without the conf and prove neither).
    */
  private def writeNanosFixture(dir: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withConf(conf)
      .build()
    try rows.foreach { case (id, us, u, t, v, p) =>
      writer.write(
        factory.newGroup()
          .append("event_id", id)
          .append("ts", us * 1000L)
          .append("user_id", u)
          .append("event_type", t)
          .append("value", v)
          .append("props", p))
    } finally writer.close()
  }

  /** The AMBIGUOUS flavor the r10 advice warns about: a PLAIN unannotated
    * int64 `ts` holding micros-scale values. It loads as LongType exactly
    * like the legacy-nanos path (with or without the conf), so only
    * normalizeTs' magnitude guard separates it from real nanos.
    */
  private def writePlainInt64Fixture(dir: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).named("ts") // no logical type annotation
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withConf(conf)
      .build()
    try rows.foreach { case (id, us, u, t, v, p) =>
      writer.write(
        factory.newGroup()
          .append("event_id", id)
          .append("ts", us) // micros-scale — 1000x below any nanos epoch
          .append("user_id", u)
          .append("event_type", t)
          .append("value", v)
          .append("props", p))
    } finally writer.close()
  }

  private def writeMicrosFixture(dir: String): Unit = {
    import spark.implicits._
    surfaceSingleFile(
      rows
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType)),
      dir)
  }

  /** Third flavor: session-zone TimestampType (parquet timestamp with
    * isAdjustedToUTC=true) — exercises normalizeTs' pass-through branch.
    */
  private def writeTzFixture(dir: String): Unit = {
    import spark.implicits._
    surfaceSingleFile(
      rows
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("ts"))),
      dir)
  }

  /** The flavor dirs also carry nation.parquet so stream-static consumers
    * (q_stream_enrich joins events × nation) run under both footers — an
    * events-only fixture would silently exclude them from the canary.
    */
  private def addNation(d: String): Unit =
    spark.read
      .parquet(s"$sfDir/nation.parquet")
      .write
      .mode("overwrite")
      .parquet(s"$d/nation.parquet")

  private lazy val nanosDir: String = {
    val d = Files.createTempDirectory("canary_nanos").toString
    writeNanosFixture(d); addNation(d); d
  }
  private lazy val microsDir: String = {
    val d = Files.createTempDirectory("canary_micros").toString
    writeMicrosFixture(d); addNation(d); d
  }
  private lazy val tzDir: String = {
    val d = Files.createTempDirectory("canary_tz").toString
    writeTzFixture(d); d
  }

  test("fixtures land as the three distinct footer flavors") {
    assert(Tables.eventsRaw(spark, nanosDir).schema("ts").dataType == LongType)
    assert(Tables.eventsRaw(spark, microsDir).schema("ts").dataType == TimestampNTZType)
    assert(Tables.eventsRaw(spark, tzDir).schema("ts").dataType == TimestampType)
  }

  test("the nanos footer is the REAL annotation: Spark rejects it without the legacy conf") {
    // Force the flag off for this one read: if this stops throwing, the
    // fixture has degraded to a plain int64 column and no longer pins the
    // r9 failure class.
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val e = intercept[Exception] {
        spark.read.parquet(s"$nanosDir/events.parquet").collect()
      }
      assert(e.toString.contains("NANOS") || e.toString.contains("Illegal Parquet type"),
        s"expected the TIMESTAMP(NANOS) rejection, got: $e")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  test("an unannotated micros-scale int64 ts is rejected, not misread 1000x off") {
    val d = Files.createTempDirectory("canary_plain_int64").toString
    writePlainInt64Fixture(d)
    // Indistinguishable from the legacy-nanos path at the schema level…
    assert(Tables.eventsRaw(spark, d).schema("ts").dataType == LongType)
    // …so the magnitude guard must refuse the DIV-1000 reinterpretation at
    // evaluation time instead of silently returning 1970-vintage instants.
    val e = intercept[Throwable] { Tables.events(spark, d).collect() }
    def chain(t: Throwable): Seq[String] =
      Option(t).map(x => x.toString +: chain(x.getCause)).getOrElse(Seq.empty)
    assert(chain(e).exists(_.contains("too small to be an epoch-nanos")),
      s"expected the normalizeTs magnitude rejection, got: ${chain(e).mkString(" <- ")}")
  }

  test("a NULL int64 ts normalizes to a null timestamp, not a raise_error crash") {
    // normalizeTs dispatches on the loaded datatype, so an in-memory
    // LongType frame exercises the legacy-nanos arm directly. The
    // magnitude guard's comparison is null for a null ts — without the
    // explicit null arm the row would fall into raise_error (with a NULL
    // message, concat propagating the null) and kill a whole nullable
    // nanos load on its first null row.
    import spark.implicits._
    val df = Seq(Some(1704067200L * 1000000000L), Option.empty[Long]).toDF("ts")
    val out = Tables.normalizeTs(df).collect()
    assert(out.length == 2)
    assert(out.count(_.isNullAt(0)) == 1, "null ts must pass through as null")
    assert(out.exists(r => !r.isNullAt(0) && r.getTimestamp(0).toString.startsWith("2024-01-01")))
  }

  test("Tables.events normalizes all three flavors to identical TimestampType values") {
    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, microsDir)
    val c = Tables.events(spark, tzDir)
    for (df <- Seq(a, b, c)) assert(df.schema("ts").dataType == TimestampType)
    val va = a.orderBy("event_id").select("event_id", "ts").collect().toSeq
    val vb = b.orderBy("event_id").select("event_id", "ts").collect().toSeq
    val vc = c.orderBy("event_id").select("event_id", "ts").collect().toSeq
    assert(va == vb, "same wall-clock instants must survive either footer")
    assert(va == vc, "tz'd pass-through must match the normalized flavors")
    assert(va.size == rows.size)
  }

  /** Every registered batch query that consumes events must analyze, run,
    * and return flavor-identical results. (Streaming queries share the same
    * normalizeTs seam — q_stream_dedup covers the readStream path cheaply.)
    */
  private val eventQueries = Seq(
    "q_incremental_watermark", "q_dedup_composite_key", "q_hourly_rollup",
    "q_unit_convert", "q_missing_value_policy", "q_timezone_shift",
    "q_column_normalize", "q_quarantine", "q_forward_fill", "q_audit_append",
    "q_schema_cast", "q_fixed_width_parse", "q_resample_interpolate",
    "q_pivot_events", "q_user_gaps", "q_sessionize_batch", "q_drift_psi",
    "q_drift_psi_approx", "q_drift_ks", "q_drift_ks_approx", "q_drift_categorical",
    "q_anomaly_zscore", "q_skew_report",
    "q_group_quantiles", "q_json_extract", "q_sliding_window_avg",
    "q_asof_join", "q_range_join", "q_profile", "q_funnel",
    "q_retention_cohorts", "q_group_quantiles_approx", "q_profile_approx",
    "q_scd2_intervals", "q_scd2_apply", "q_upsert_merge", "q_stream_dedup", "q_stream_sessionize",
    "q_stream_quota", // ts-ORDERED quota consumption — flavor drift would reorder it
    "q_dq_freshness", // integer-micros lag math rides the normalized ts
    "q_late_arrival_profile", // arrival-order lateness over the normalized ts
    "q_stream_enrich", // stream×nation broadcast join (fixtures carry nation.parquet)
    "q_stream_drift", // per-micro-batch PSI over the normalized ts split
    "q_stream_drift_ks", // PSI + binned KS from the same (type, bin) state
    "q_stream_chi2", // K-bounded categorical chi-square on arrival
    "q_stream_late_drop", // the watermark late-data contract (empty on the 24h fixture, but the path must run both flavors)
    "q_stream_uscrn", // the reference DAG streamed: per-batch merge convergence rides the normalized ts only via events()
    // Reads events.parquet RAW on purpose (footer-schema diffing is the
    // operator); returns a LocalRelation, so the scan walk can't see it —
    // hand-listed like q_upsert_merge. Flavor-invariant because ts types
    // are only emitted for type_changed rows and ts passes through.
    "q_schema_drift",
    // Round 16: the registered salting playbook — both halves (key/value
    // only, flavor can't touch them; listed because they consume events) —
    // plus the chi-square drift monitor (median-split over the normalized
    // ts, the q_drift_psi seam).
    "q_skew_salted",
    "q_skew_salted_join",
    "q_drift_chi2",
    "q_dp_counts",
    // Round 16: the reference DAG end-to-end (read-back — events lineage
    // hidden from the scan walk like q_upsert_merge; its nation dim join
    // rides the flavor fixtures' nation.parquet).
    "q_uscrn_e2e",
    // Round 17: the wind DAG end-to-end (read-back like q_uscrn_e2e; its
    // station dim join rides the fixtures' nation.parquet) and the DP
    // family's sensitivity leg (events-only clamped-sum release).
    "q_wind_e2e",
    "q_dp_sum",
    // Round 17: the JDBC warehouse load e2e — events lineage hidden behind
    // the Derby read-back (neither eventsOnly nor mixed in the scan walk),
    // hand-listed like the parquet read-backs.
    "q_warehouse_e2e"
  )

  test("the hand list above covers EVERY registered events-consuming query (r10 advice)") {
    // The r9 failure class this spec exists for: a new events-consuming
    // query that nobody adds to `eventQueries` silently escapes the
    // flavor-invariance canary. Derive the consumer set from the registry
    // itself — build each batch query against the full sf0.001 star schema
    // (plan-build only for most; a few train bounded driver state while
    // building) and read the scanned table names off its file relations.
    // Streaming queries are excluded from the walk (their registered fns
    // EXECUTE a stream on invocation); the two hand-listed stream members
    // cover the readStream seam.
    def tablesOf(files: Array[String]): Set[String] =
      files.flatMap(f =>
        f.split('/').find(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))).toSet
    val scans: Map[String, Set[String]] = QueryRegistry.queries.toSeq
      .filterNot { case (n, _) => n.startsWith("q_stream_") }
      .map { case (n, fn) => n -> tablesOf(fn(spark, sfDir).inputFiles) }
      .toMap
    val eventsOnly = scans.filter { case (_, ts) => ts == Set("events") }.keySet
    // Read-back queries (build materializes events into a temp table and
    // returns the re-read) hide their events lineage from the scan walk —
    // they must be added HERE and to eventQueries by hand; their actual
    // flavor coverage comes from the per-query invariance tests below.
    val indirect =
      Set("q_upsert_merge", "q_schema_drift", "q_scd2_apply", "q_uscrn_e2e", "q_wind_e2e", "q_warehouse_e2e")
    val handBatch = eventQueries.filterNot(_.startsWith("q_stream_")).toSet
    assert(indirect.subsetOf(handBatch), "indirect consumers must be canary-covered too")
    assert(handBatch -- indirect == eventsOnly,
      s"hand list out of sync with the registry — missing: ${(eventsOnly -- handBatch).toSeq.sorted}, " +
        s"stale: ${(handBatch -- indirect -- eventsOnly).toSeq.sorted}")
    // A query scanning events ALONGSIDE other tables could not run on the
    // single-table fixture dirs and would escape this canary entirely —
    // none exist today; adding one requires a dedicated fixture, so fail
    // loudly here until it gets one.
    val mixed = scans.filter { case (_, ts) => ts.contains("events") && ts.size > 1 }.keySet
    assert(mixed.isEmpty,
      s"events+other-table queries need their own flavor fixture coverage: ${mixed.toSeq.sorted}")
    // The hand-listed streaming members must stay real registry keys.
    assert(eventQueries.filter(_.startsWith("q_stream_")).toSet
      .subsetOf(QueryRegistry.queries.keySet))
  }

  for (name <- eventQueries)
    test(s"$name runs under both footer flavors with identical results") {
      val f = SparkEntry.queries(name)
      val a = f(spark, nanosDir)
      val b = f(spark, microsDir)
      val cols = a.columns.sorted.map(col(_)).toIndexedSeq
      val va = a.select(cols: _*).orderBy(cols: _*).collect().toSeq
      val vb = b.select(cols: _*).orderBy(cols: _*).collect().toSeq
      assert(va == vb, s"$name must be footer-flavor-invariant")
      assert(va.nonEmpty, s"$name must return rows on the canary fixture")
    }
}
