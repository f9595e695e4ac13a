package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-join co-location: the join of two tables bucketed on the join
  * key must plan WITHOUT any Exchange (the shuffle a 100 TB fact⋈fact join
  * cannot afford).
  */
class WarehouseBucketingSpec extends AnyFunSuite with SparkSpec {

  test("join of co-bucketed tables plans with no Exchange") {
    val li = Tables.lineitem(spark, sfSmoke).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfSmoke).select("o_orderkey", "o_totalprice")
    Warehouse.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 8)
    Warehouse.writeBucketed(o, "o_bucketed", "o_orderkey", buckets = 8)
    // force SMJ (broadcast would hide the bucketing benefit at this scale)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
