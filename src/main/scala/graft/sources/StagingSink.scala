package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staging→main load pattern (reference: utils.py:44-73 — load CSV to a
  * BigQuery staging table, then `INSERT INTO main SELECT *,
  * CURRENT_TIMESTAMP()` with create-if-missing), re-expressed on the
  * parquet/table layer.
  *
  * Scale notes: the idempotency check is a left-anti join on the business
  * key — at 100 TB the main side is partition-pruned by the same watermark
  * that bounded the extract, so the anti-join touches only recent partitions,
  * and AQE picks broadcast for a small staging batch. No driver-side state.
  */
object StagingSink {

  /** Write a batch to the staging location (full overwrite — staging is
    * transient by contract).
    */
  def stage(df: DataFrame, stagingPath: String): Unit =
    df.write.mode("overwrite").parquet(stagingPath)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Compact a parquet table's small files: incremental loads append one
    * file per batch-partition, and a year of hourly merges leaves main as
    * thousands of KB-sized files whose open/footer costs dominate every
    * scan. Rewrites to ceil(bytes / targetFileBytes) files via
    * repartition, then swaps directories with checked renames (write to
    * `<path>__compact`, move main to `<path>__old`, move the rewrite in,
    * drop `__old`); a crash between the renames is recovered on the next
    * call — the table is never deleted until its replacement is in place.
    * A Hive-partitioned main is detected automatically (every `name=value`
    * directory level) and rewritten with its layout — rows distribute by
    * the partition columns plus a bounded salt, so small partitions
    * compact to one file each while oversized partitions still split
    * toward the target size (a plain round-robin repartition before
    * partitionBy would write up to tasks × partitions small files,
    * defeating the compaction). `partitionCols` overrides detection if
    * needed. Optionally sorts within partitions by `sortCols` (prefixed
    * with the partition columns so the dynamic-partition writer keeps the
    * ordering) so parquet row-group min/max stats become selective for
    * those columns (poor-man's clustering).
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil
  ): Int = {
    val p = new Path(path)
    val tmpP = new Path(path + "__compact")
    val oldP = new Path(path + "__old")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery: a leftover __old with no main means a previous
    // compaction died between its two renames — the old dir IS the table;
    // restore it before anything else. A leftover __old alongside main is
    // a superseded copy (crash after the swap, before cleanup) — drop it.
    if (fs.exists(oldP) && !fs.exists(p)) require(fs.rename(oldP, p), s"recovery rename $oldP -> $p failed")
    if (fs.exists(oldP)) require(fs.delete(oldP, true), s"could not delete stale $oldP")
    if (fs.exists(tmpP)) require(fs.delete(tmpP, true), s"could not delete stale $tmpP")

    // A Hive-partitioned main must be rewritten partitioned, or the next
    // partitioned append produces conflicting directory depths — detect
    // the FULL layout (all `name=value` levels, e.g. date=/hour=) rather
    // than trusting the caller to remember, and count the leaf partition
    // directories while walking so file sizing can respect both contracts
    // below.
    def walk(dir: Path): (Seq[String], Int) = {
      val dirs = fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (dirs.isEmpty) (Nil, 1)
      else {
        val level = dirs.head.getPath.getName.takeWhile(_ != '=')
        val below = dirs.map(d => walk(d.getPath))
        (level +: below.head._1, below.map(_._2).sum)
      }
    }
    val (walked, leafDirs) = walk(p)
    val detected = if (partitionCols.nonEmpty) partitionCols else walked

    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val base = spark.read.parquet(path)
    // Partitioned: distribute by the partition columns plus a bounded salt
    // so each Hive partition is written by ~filesPerPart tasks — one file
    // per partition when partitions are small, but a 50 GB partition still
    // splits toward targetFileBytes instead of funneling through one task.
    val filesPerPart = math.max(1, math.ceil(nFiles.toDouble / math.max(1, leafDirs)).toInt)
    val dataCols = base.columns.filterNot(detected.contains).map(col).toIndexedSeq
    val df0 =
      if (detected.nonEmpty)
        base.repartition(nFiles, detected.map(col) :+ pmod(hash(dataCols: _*), lit(filesPerPart)): _*)
      else base.repartition(nFiles)
    // Prefix the sort with the partition columns: the dynamic-partition
    // writer requires that ordering and would otherwise insert its own
    // sort on just the partition columns, discarding the clustering.
    val effectiveSort = (detected ++ sortCols).map(col)
    val df = if (effectiveSort.nonEmpty) df0.sortWithinPartitions(effectiveSort: _*) else df0
    val writer = df.write.mode("overwrite")
    (if (detected.nonEmpty) writer.partitionBy(detected: _*) else writer).parquet(tmpP.toString)

    // Hadoop rename signals failure by RETURNING false — check both, and
    // never delete the old copy until the new one is in place.
    require(fs.rename(p, oldP), s"rename $p -> $oldP failed; table untouched")
    if (!fs.rename(tmpP, p)) {
      require(fs.rename(oldP, p), s"rollback rename $oldP -> $p failed — table is at $oldP")
      throw new IllegalStateException(s"rename $tmpP -> $p failed; rolled back")
    }
    fs.delete(oldP, true) // best-effort; recovery above handles leftovers
    nFiles
  }

  /** The incremental-extract cutoff: max `date_added_utc` in main, or None
    * when main does not exist yet (first load takes everything). The
    * reference derives its update watermark the same way (uscrn_dag.py:
    * 96-113 check_last_added, uscrn_wind_dag.py:85 get_update_cutoff). A
    * 1-row max aggregate — on a date-partitioned main, Spark answers it
    * from the latest partitions' footers, never a full scan.
    */
  def lastAdded(spark: SparkSession, mainPath: String): Option[java.sql.Timestamp] =
    if (!exists(spark, mainPath)) None
    else
      Option(
        spark.read.parquet(mainPath)
          .agg(max(col("date_added_utc")))
          .head().getTimestamp(0)
      )

  /** Append staged rows to main with an audit timestamp, creating main if
    * missing. Re-running the same batch is a no-op: rows whose `keyCols`
    * already exist in main are anti-joined away (the reference gets this
    * from its pre-load dedup + watermark; here it is explicit and exact).
    *
    * `clock` defaults to `current_timestamp()`; tests pass a fixed literal
    * for determinism.
    */
  def mergeToMain(
      spark: SparkSession,
      stagingPath: String,
      mainPath: String,
      keyCols: Seq[String],
      clock: Column = current_timestamp(),
      partitionCols: Seq[String] = Nil
  ): Unit = {
    val staged = spark.read.parquet(stagingPath)
    val fresh =
      if (exists(spark, mainPath)) {
        val mainKeys = spark.read.parquet(mainPath).select(keyCols.map(col).toIndexedSeq: _*)
        staged.join(mainKeys, keyCols, "left_anti")
      } else staged
    val writer = fresh.withColumn("date_added_utc", clock).write.mode("append")
    // Hive-style partitioning of main: this is the 100 TB layout that turns
    // watermark predicates into partition pruning (whole date directories
    // skipped at planning time — see SURVEY §5 and SourcesSpec's pruning
    // assertion) and bounds the idempotency anti-join to recent partitions.
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(mainPath)
  }
}
