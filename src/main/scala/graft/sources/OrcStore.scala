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

  /** Schema-checked read: ORC files carry their schema, and Spark's ORC
    * reader applies silent schema-evolution CONVERSION on mismatch (a
    * DOUBLE column read as BIGINT quietly truncates — measured, not
    * hypothetical). That is the opposite of the TypedFiles/CsvExport
    * contract, so this read validates the caller's DDL against the file
    * footer first: every requested column must exist with exactly the
    * requested type (a subset projection is fine — that is column
    * pruning), and drift throws before any data is read.
    */
  def read(spark: SparkSession, path: String, schema: String): DataFrame = {
    val want = org.apache.spark.sql.types.StructType.fromDDL(schema)
    val footer = spark.read.orc(path).schema
    val footerByName = footer.map(f => f.name -> f.dataType).toMap
    want.foreach { f =>
      footerByName.get(f.name) match {
        case None =>
          throw new IllegalArgumentException(
            s"OrcStore.read: column '${f.name}' not present in ORC footer at $path " +
              s"(footer has: ${footer.fieldNames.mkString(", ")})")
        case Some(dt) if dt != f.dataType =>
          throw new IllegalArgumentException(
            s"OrcStore.read: column '${f.name}' is ${dt.sql} in the ORC footer at $path " +
              s"but ${f.dataType.sql} was requested — schema drift must be handled " +
              "explicitly, not silently converted")
        case _ => ()
      }
    }
    spark.read.schema(want).orc(path)
  }
}
