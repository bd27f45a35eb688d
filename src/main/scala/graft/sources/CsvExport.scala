package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** CSV egress — the reference's only export format (notebooks/
  * 3_gcf_export.ipynb: query results → headered CSV for Kaggle).
  *
  * `singleFile = true` funnels the (sorted) result through one task — the
  * right call for the reference's small final exports, and explicitly the
  * wrong one at scale: leave it false and each partition writes its own
  * part file, with `orderBy` giving globally range-sorted part files whose
  * lexicographic concatenation is the total order.
  */
object CsvExport {

  def write(
      df: DataFrame,
      path: String,
      sortCols: Seq[String] = Nil,
      singleFile: Boolean = false,
      sep: String = ","
  ): Unit = {
    val sorted = if (sortCols.nonEmpty) df.orderBy(sortCols.map(col).toIndexedSeq: _*) else df
    val out = if (singleFile) sorted.coalesce(1) else sorted
    out.write.mode("overwrite").option("header", "true").option("sep", sep).csv(path)
  }

  /** Typed read-back: an explicit schema (never inferSchema — that is a
    * second full pass over the data at scale, and type drift should fail
    * loudly, not silently re-infer).
    */
  def read(spark: SparkSession, path: String, schema: String, sep: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .schema(StructType.fromDDL(schema))
      .csv(path)
}
