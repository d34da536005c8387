package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool behind the PLANS.md "decimal tax" numbers: times
  * the q1-shaped 7-aggregate fan over lineitem with the sum accumulator
  * at different types (double, decimal(30,8), decimal(20,6),
  * decimal(18,6)). Exact-decimal accumulation is the engine's
  * correctness contract (StableAgg); this quantifies what it costs so
  * the contract is a measured decision, not a guess.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.DecimalBench"
  */
object DecimalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def q1With(cast: String => org.apache.spark.sql.Column) =
      l.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cast("l_quantity")).as("sum_qty"),
          sum(cast("l_extendedprice")).as("sum_base_price"),
          sum(cast("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          sum(cast("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          avg(cast("l_quantity")).as("avg_qty"),
          avg(cast("l_extendedprice")).as("avg_price"),
          avg(cast("l_discount")).as("avg_disc"),
          count(lit(1)).as("n"))
    val variants: Seq[(String, String => org.apache.spark.sql.Column)] = Seq(
      "double" -> (c => col(c)),
      "decimal(30,8)" -> (c => col(c).cast("decimal(30,8)")),
      "decimal(20,6)" -> (c => col(c).cast("decimal(20,6)")),
      "decimal(18,6)" -> (c => col(c).cast("decimal(18,6)")))
    // warm up the scan + codegen path once
    q1With(c => col(c)).write.format("noop").mode("overwrite").save()
    variants.foreach { case (name, cast) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q1With(cast).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[decimal-bench] $name%-14s min=${times.min}%.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
