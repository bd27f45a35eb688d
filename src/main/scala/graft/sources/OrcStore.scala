package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** ORC ingress/egress — the columnar interchange format for warehouse
  * ecosystems that don't speak parquet (Hive/Trino lakes). Same posture as
  * the parquet primary path: predicate pushdown and column pruning work on
  * read (ORC carries min/max stripe statistics and bloom filters), so a
  * table exported here remains scan-efficient for downstream engines.
  *
  * `sortWithinPartitions` orders rows INSIDE each output file so stripe
  * statistics become selective for the sort key (the same trick
  * StagingSink.compact applies to parquet row groups) without paying a
  * global range exchange.
  */
object OrcStore {

  def write(
      df: DataFrame,
      path: String,
      sortCols: Seq[String] = Nil,
      compression: String = "zstd"
  ): Unit = {
    val out =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col).toIndexedSeq: _*)
      else df
    out.write.mode("overwrite").option("compression", compression).orc(path)
  }

  /** Schema-checked read: ORC files carry their schema; the caller's DDL is
    * enforced on top so type drift fails loudly (same contract as
    * TypedFiles/CsvExport — never silently re-infer).
    */
  def read(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .orc(path)
}
