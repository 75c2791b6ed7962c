package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("matching bucketed tables join with zero exchanges") {
    val facts = spark.range(1000).select(
      ($"id" % 50).as("k"), $"id".as("v"))
    val dims = spark.range(50).select(
      $"id".as("k"), concat(lit("dim"), $"id").as("label"))
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)

    // disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
