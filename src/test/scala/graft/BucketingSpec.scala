package graft

import graft.sinks.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: writing both sides bucketed on the join
  * key must eliminate the per-query shuffle (no Exchange in the join's
  * plan) — the pre-partitioning strategy for 100 TB fact tables. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equi-join of co-bucketed tables plans without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so shuffle elimination is what's on trial
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 10000).map(i => (i.toLong % 500, i.toDouble)).toDF("key", "v")
      val dims = (0 until 500).map(i => (i.toLong, s"dim_$i")).toDF("key", "name")
      Sinks.writeBucketed(facts, "b_facts", "key", 8)
      Sinks.writeBucketed(dims, "b_dims", "key", 8)
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == 10000)

      // control: the same join over unbucketed data DOES shuffle
      val unbucketed = facts.join(dims, "key")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
