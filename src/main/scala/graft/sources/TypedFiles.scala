package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Explicit-schema CSV/JSON readers (SURVEY.md §2.5).
  *
  * Schema inference is banned by construction: at 100 TB, `inferSchema`
  * costs a full extra pass over the data before the job even starts, and a
  * drifting inferred type silently corrupts downstream arithmetic. Both
  * readers run PERMISSIVE with a corrupt-record column, so malformed rows
  * are *quarantined* (the reference's bad-row policy) instead of killing
  * the job or silently disappearing.
  */
object TypedFiles {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** Typed CSV read. Returns (good rows in `schema`, quarantined raw lines). */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true
  ): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
      .cache() // both splits read once; unpersist is the caller's choice
    split(raw, schema)
  }

  /** Typed JSON-lines read. Returns (good rows, quarantined raw lines). */
  def json(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    split(raw, schema)
  }

  private def split(raw: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val good = raw
      .filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = raw.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (good, bad)
  }
}
