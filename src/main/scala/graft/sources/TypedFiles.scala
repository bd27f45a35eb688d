package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** True when a column NAME could itself parse as the column's declared
    * type — i.e. a header line might survive the typed parse of that
    * field. Conservative: anything not provably unparseable returns true.
    */
  private def nameParsesAsType(f: StructField): Boolean = f.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
        _: DecimalType =>
      // Spark's CSV numeric parse also accepts its nanValue/positiveInf/
      // negativeInf spellings, which Double.parseDouble rejects — a
      // column literally named "Inf" must count as parseable or its
      // header line would land in the good split as data.
      val t = f.name.trim.toLowerCase
      scala.util.Try(java.lang.Double.parseDouble(t)).isSuccess ||
        Set("inf", "+inf", "-inf", "infinity", "+infinity", "-infinity", "nan").contains(t)
    case BooleanType => Set("true", "false").contains(f.name.trim.toLowerCase)
    case DateType | TimestampType =>
      // Spark's date/timestamp parsers accept more shapes than any single
      // java.time/java.sql parse (ISO 'T' separators, zone offsets,
      // lenient fractional seconds) — "provably unparseable" here means
      // digit-free; any name containing a digit might parse and takes the
      // per-row check instead.
      f.name.exists(_.isDigit)
    case _ => true // StringType and anything exotic: assume parseable
  }

  /** Typed CSV read. Returns (good rows in `schema`, quarantined raw lines).
    *
    * Header handling is CONTENT-based, not position-based: with
    * `header = true`, a line whose every field equals its column name
    * (trimmed, case-insensitive) is treated as a header and dropped from
    * both splits. This skips each file's header wherever the file was
    * split, AND repeated headers from naively concatenated CSVs — at the
    * cost of two documented edge semantics: a data row that replicates
    * the header text in every column is indistinguishable from a header
    * (dropped), and a header whose labels differ from the schema's field
    * names is not recognized (it quarantines, which surfaces the
    * mismatch rather than hiding it). Cost: when any column name cannot
    * parse as its declared type (the overwhelmingly common case — e.g.
    * "score" is not a DOUBLE), a header line always fails the typed
    * parse, so the string-schema re-parse behind the check only evaluates
    * on corrupt rows, never on the good-row hot path. Only a schema whose
    * EVERY column name parses as its own type (all-string schemas, or
    * year-named int columns like "2021") needs the check on every row —
    * decided per-schema at plan time, not per row.
    */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true
  ): (DataFrame, DataFrame) = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    val strSchema = StructType(schema.fields.map(f => StructField(f.name, StringType)))
    val rows = spark.read.text(path)
      .where(length(trim(col("value"))) > 0) // csv reader skips blank lines too
      .withColumn(ParsedCol, from_csv(col("value"), withCorrupt(schema), opts))
    def matchesHeader(p: Column): Column = schema.fieldNames.toIndexedSeq
      .map(n => lower(trim(p.getField(n))) <=> lit(n.toLowerCase))
      .reduce(_ && _)
    val headerCanParse = schema.fields.forall(nameParsesAsType)
    val allString = schema.fields.forall(_.dataType == StringType)
    val isHeader: Column =
      if (!header) lit(false)
      else if (allString) matchesHeader(col(ParsedCol)) // typed parse IS the string parse
      else if (!headerCanParse) // header always corrupt: check only corrupt rows
        when(corruptExpr, matchesHeader(from_csv(col("value"), strSchema, opts)))
          .otherwise(lit(false))
      else // pathological schema (every name parses as its type): check every row
        matchesHeader(from_csv(col("value"), strSchema, opts))
    splitParsed(rows, schema, dropFromBoth = isHeader)
  }

  /** Typed JSON-lines read. Returns (good rows, quarantined raw lines). */
  def json(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): (DataFrame, DataFrame) = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    val rows = spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .withColumn(ParsedCol, from_json(col("value"), withCorrupt(schema), opts))
    splitParsed(rows, schema, dropFromBoth = lit(false))
  }

  /** A malformed line sets the corrupt field; a line the parser rejects
    * outright yields a null struct — both quarantine.
    */
  private def corruptExpr: Column =
    col(ParsedCol).isNull || col(ParsedCol).getField(CorruptCol).isNotNull

  private def splitParsed(
      rows: DataFrame,
      schema: StructType,
      dropFromBoth: Column
  ): (DataFrame, DataFrame) = {
    val good = rows
      .where(!corruptExpr && !dropFromBoth)
      .select(schema.fieldNames.toIndexedSeq.map(n => col(ParsedCol).getField(n).as(n)): _*)
    val bad = rows.where(corruptExpr && !dropFromBoth).select(col("value").as(CorruptCol))
    (good, bad)
  }
}
