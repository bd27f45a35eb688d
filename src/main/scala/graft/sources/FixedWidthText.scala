package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed whitespace-text reader — the USCRN hourly `.txt` shape
  * (reference: uscrn_dag.py splits each line on whitespace against a fixed
  * 39-column schema, single-node pandas).
  *
  * Spark-first re-expression: `spark.read.text` gives one scan task per file
  * split (`maxPartitionBytes`-bounded, so a 100 TB directory parallelizes for
  * free), and the split+cast is a codegen'd projection — no per-file driver
  * loop, no Python string handling. Malformed fields `try_cast` to NULL
  * rather than failing the job (ANSI-safe), matching pandas
  * `to_numeric(errors='coerce')`.
  */
object FixedWidthText {

  /** Parse a one-string-column DataFrame of raw lines against `schema`:
    * field i = whitespace token i, cast to the schema field's type.
    */
  def parse(lines: DataFrame, schema: StructType, lineCol: String = "value"): DataFrame = {
    val toks = split(trim(col(lineCol)), "\\s+")
    lines.select(schema.fields.zipWithIndex.map { case (f, i) =>
      element_at(toks, i + 1).try_cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Read a text file/directory distributed and parse each line. Lines that
    * are blank or start with `commentPrefix` are dropped (a filter on the
    * scan — no driver-side pre-pass, so header skipping stays distributed).
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      commentPrefix: String = "#"
  ): DataFrame = {
    val raw = spark.read.text(path)
    val kept = raw.filter(length(trim(col("value"))) > 0 && !col("value").startsWith(commentPrefix))
    parse(kept, schema)
  }

  /** [[read]] over an explicit file list — the shape [[ListingDiscovery]]
    * hands over (only the files newer than the watermark are scanned at
    * all; at scale that is the difference between reading one day and
    * re-reading the whole archive). One scan over N paths, still
    * split-parallel per file.
    */
  def readFiles(
      spark: SparkSession,
      paths: Seq[String],
      schema: StructType,
      commentPrefix: String = "#"
  ): DataFrame = {
    val raw = spark.read.text(paths: _*)
    val kept = raw.filter(length(trim(col("value"))) > 0 && !col("value").startsWith(commentPrefix))
    parse(kept, schema)
  }
}
