package graft

import graft.operators.Salt
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-side skew salting: row-for-row identity with the plain join
  * (the whole point — the technique must be invisible in the answer),
  * the contract rejections, and the plan shape that makes it work. */
class SaltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key (900 of 1000 rows), a cold tail, and null keys
  private lazy val big = (
    Seq.fill(900)(1) ++ (2 to 101) // 900× key 1, 1× keys 2..101
    ).zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    .unionByName(Seq((null.asInstanceOf[Integer], -1L)).toDF("k", "payload"))
  private lazy val small =
    (1 to 50).map(k => (k, s"dim_$k")).toDF("k", "dim")
      .unionByName(Seq((null.asInstanceOf[Integer], "dim_null")).toDF("k", "dim"))

  test("saltedJoin is row-for-row identical to the plain inner join (hot key, null keys)") {
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").as[(Int, Long, String)].collect().sorted
    val salted = Salt.saltedJoin(big, small, "k", salts = 7)
      .select("k", "payload", "dim").as[(Int, Long, String)].collect().sorted
    assert(salted.length == 949) // 900 hot + tail keys 2..50 ∩ dim's 1..50
    assert(salted.toSeq == plain.toSeq)
  }

  test("salts=1 degenerates to the plain join") {
    val plain = big.join(small, Seq("k")).count()
    assert(Salt.saltedJoin(big, small, "k", salts = 1).count() == plain)
  }

  test("the salt actually spreads the hot key across partitions") {
    // partition by the join key alone: every hot row lands in ONE
    // partition; by (key, salt): they spread over min(salts, partitions)
    val salted = Salt.saltedJoin(big.repartition(8), small, "k", salts = 8)
      .filter(col("k") === 1)
    // count distinct physical partitions holding hot-key output rows
    val parts = salted.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) Iterator.single(pid) else Iterator.empty
    }.collect().distinct
    assert(parts.length > 1, s"hot key not spread: partitions $parts")
  }

  test("contract violations fail loudly") {
    intercept[IllegalArgumentException](Salt.saltedJoin(big, small, "nope"))
    intercept[IllegalArgumentException](Salt.saltedJoin(big, small, "k", salts = 0))
    val overlapping = small.withColumnRenamed("dim", "payload")
    intercept[IllegalArgumentException](Salt.saltedJoin(big, overlapping, "k"))
    intercept[IllegalArgumentException](
      Salt.saltedJoin(big.withColumn("__salt", lit(1)), small, "k"))
  }

  test("plan: small side replicated via explode; join keys are (key, salt)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Salt.saltedJoin(big, small, "k", salts = 4)
        .queryExecution.executedPlan
      assert(plan.collect { case g: GenerateExec => g }.nonEmpty,
        s"no explode of the small side in:\n$plan")
      val joins = plan.collect { case j: BaseJoinExec => j }
      assert(joins.nonEmpty, s"no join node in:\n$plan")
      assert(joins.head.leftKeys.size == 2,
        s"join not on (key, salt): ${joins.head.leftKeys}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
