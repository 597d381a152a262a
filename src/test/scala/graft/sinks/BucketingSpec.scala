package graft.sinks

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions.col

/** Bucketed layout ⇒ co-located joins: after writeBucketed on the join
  * key, the sort-merge join must read both sides bucket-aligned with
  * NO shuffle exchange in the physical plan. */
class BucketingSpec extends SparkSpec {

  test("equi-join on the bucket key plans without a shuffle and matches the plain join") {
    val o = Tables.orders(spark, sf("sf0.001"))
    val c = Tables.customer(spark, sf("sf0.001"))
    Sinks.writeBucketed(o, 8, "o_custkey", "graft_orders_bucketed")
    Sinks.writeBucketed(c, 8, "c_custkey", "graft_customer_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val n = j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan.take(1500))
      assert(n == o.join(c, col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
