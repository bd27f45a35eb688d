package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Explicit-schema CSV/JSON readers (SURVEY.md §2.5).
  *
  * Schema inference is banned by construction: at 100 TB, `inferSchema`
  * costs a full extra pass over the data before the job even starts, and a
  * drifting inferred type silently corrupts downstream arithmetic. Rows
  * that fail the typed parse are *quarantined* (the reference's bad-row
  * policy) instead of killing the job or silently disappearing.
  *
  * Implementation note: the parse is EXPLICIT — a `text` scan with
  * `from_csv`/`from_json` — rather than the file-source readers'
  * `_corrupt_record` column. The file-source corrupt column only
  * materializes when parsing happens, so Spark (correctly) refuses
  * uncached queries that reference it alone; the standard workaround is
  * caching the raw input, which at 100 TB is a memory/disk hazard. With
  * an explicit parse both splits are plain deterministic expressions over
  * the same line scan: no cache, no restriction, and quarantine keeps the
  * raw line verbatim. Quarantine detection must parse every column anyway
  * (a bad value in ANY field quarantines the row), so no column-pruning
  * is lost. Line-based by contract, like Spark's default multiLine=false.
  */
object TypedFiles {

  val CorruptCol = "_corrupt_record"

  private val ParsedCol = "__parsed"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** Typed CSV read. Returns (good rows in `schema`, quarantined raw lines).
    * With `header = true`, lines whose every field parses (as text) to its
    * own column name are treated as headers and dropped from both splits —
    * content-based, so every file's header line is skipped, exactly like
    * the file reader's per-file header handling.
    */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true
  ): (DataFrame, DataFrame) = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    val strSchema = StructType(schema.fields.map(f => StructField(f.name, StringType)))
    val notHeader: Column =
      if (!header) lit(true)
      else {
        val asStrings = from_csv(col("value"), strSchema, opts)
        !schema.fieldNames.toIndexedSeq
          .map(n => asStrings.getField(n) <=> lit(n))
          .reduce(_ && _)
      }
    split(
      spark.read.text(path),
      from_csv(col("value"), withCorrupt(schema), opts),
      schema,
      keep = length(trim(col("value"))) > 0 && notHeader // csv reader skips blank lines too
    )
  }

  /** Typed JSON-lines read. Returns (good rows, quarantined raw lines). */
  def json(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): (DataFrame, DataFrame) = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    split(
      spark.read.text(path),
      from_json(col("value"), withCorrupt(schema), opts),
      schema,
      keep = length(trim(col("value"))) > 0
    )
  }

  private def split(
      text: DataFrame,
      parsed: Column,
      schema: StructType,
      keep: Column
  ): (DataFrame, DataFrame) = {
    val rows = text.where(keep).withColumn(ParsedCol, parsed)
    // A malformed line sets the corrupt field; a line the parser rejects
    // outright yields a null struct — both quarantine.
    val corrupt = col(ParsedCol).isNull || col(ParsedCol).getField(CorruptCol).isNotNull
    val good = rows
      .where(!corrupt)
      .select(schema.fieldNames.toIndexedSeq.map(n => col(ParsedCol).getField(n).as(n)): _*)
    val bad = rows.where(corrupt).select(col("value").as(CorruptCol))
    (good, bad)
  }
}
