package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSON-lines egress/ingest — the interchange format ML data tooling
  * actually exchanges (one JSON object per line; the de-facto corpus
  * format for LLM training data). Same egress contract as [[CsvExport]]:
  * `singleFile` funnels through one task for small final exports and is
  * the wrong call at scale, where per-partition part files of an
  * `orderBy`'d frame concatenate to the total order.
  *
  * Timestamps are written with explicit microsecond precision — the
  * default JSON format truncates to milliseconds, which would silently
  * lose precision on a round trip (the ORC source rejects type drift for
  * the same reason). The format carries no zone offset and applies to
  * BOTH timestamp flavors (LTZ renders wall-clock in the session zone,
  * which Engine pins to UTC; NTZ has no zone to render) — parquet
  * TIMESTAMP(isAdjustedToUTC=false) loads as NTZ, and a zone-suffixed
  * format would silently not apply to it.
  */
object JsonLines {
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  def write(
      df: DataFrame,
      path: String,
      sortCols: Seq[String] = Nil,
      singleFile: Boolean = false
  ): Unit = {
    val sorted = if (sortCols.nonEmpty) df.orderBy(sortCols.map(col).toIndexedSeq: _*) else df
    val out = if (singleFile) sorted.coalesce(1) else sorted
    out.write
      .mode("overwrite")
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsFormat)
      .json(path)
  }

  /** Typed read-back: an explicit schema (never inference — a second full
    * pass at scale, and type drift should fail loudly). Unparseable rows
    * fail the job (FAILFAST) rather than turning into silent nulls.
    */
  def read(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsFormat)
      .option("mode", "FAILFAST")
      .schema(StructType.fromDDL(schema))
      .json(path)
}
