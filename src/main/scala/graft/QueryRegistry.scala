package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered capability: a Spark query plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Names in the Spark result and
  * the oracle SQL must match exactly (driver sorts columns by name, then
  * hashes values).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryRegistry {
  def all: Seq[Q] =
    EtlQueries.all ++ AnalyticQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ StreamQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
