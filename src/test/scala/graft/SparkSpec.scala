package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (forked test JVM). */
object SparkSpec {
  lazy val session: SparkSession = Engine.session("local[4]", shufflePartitions = 4)
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}
