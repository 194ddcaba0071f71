package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables make repeated equi-joins shuffle-free (SURVEY §2.12). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    Tables.writeBucketed(orders, "b_orders", Seq("o_custkey"), 8)
    Tables.writeBucketed(customer, "b_customer", Seq("c_custkey"), 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick sort-merge — the point is
      // that bucketing removes the Exchange, not that broadcast hides it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // the JOIN must read the buckets directly — no exchange on either join
      // key (the later groupBy on c_mktsegment legitimately shuffles)
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not shuffle on the join keys:\n$plan")
      // sanity: result matches the unbucketed join
      val bucketed = j.as[(String, Long)].collect().toMap
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
