package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5's co-location claim, proven: when both fact tables are
  * bucketed on the join key, the join consumes the bucketing and the plan
  * contains NO shuffle exchange — at 100 TB this removes the dominant cost
  * of every fact-fact join that repeats on the same key (lineitem×orders
  * here; in production the layout decision is made once at ingest).
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("bucketed fact tables join without a shuffle exchange") {
    val db = "graft_bucket_test"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    try {
      Tables
        .lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")
      Tables
        .orders(spark, sfDir)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .write
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")

      // At test scale the planner would broadcast the tiny orders side and
      // the bucketing would never be consulted; the merge hint pins the
      // sort-merge shape a 100 TB fact-fact join takes, which is exactly
      // the plan whose exchanges bucketing removes.
      val joined = spark
        .table(s"$db.lineitem_b")
        .hint("merge")
        .join(spark.table(s"$db.orders_b").hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderdate"))
        .agg(sum(col("l_quantity")).as("qty"))

      // One shuffle for the final groupBy is expected; the JOIN itself must
      // consume the bucketing: no exchange below the SortMergeJoin.
      val plan = joined.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join over bucketed tables:\n$plan")
      val belowJoin = plan.substring(joinIdx)
      assert(
        !belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
          !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle either side:\n$plan"
      )
      assert(joined.count() > 0)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
