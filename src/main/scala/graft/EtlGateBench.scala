package graft

import graft.operators.{Constraints, EnrichConfig}
import graft.queries.SentimentScorer
import graft.streaming.EtlPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the validate-before-publish gate at sf scale — ONE
  * AvailableNow trigger of the full [[EtlPipeline]] (bronze JSON →
  * dense ids → batch-25 enrichment → silver chunks → bucketed gold
  * upsert), with and without a declared constraint set covering all
  * three rule families (row rules, Unique, References).
  *
  * What it demonstrates (VERDICT r8 #8): the gate's marginal cost is
  * ONE extra pass over the pinned micro-batch — Constraints.check pins
  * its input through a CacheScope when >1 rule family consumes it — so
  * per-trigger wall grows by the validation pass, not by a rescan per
  * rule family. Per-trigger durations come from the streaming progress
  * events, the same numbers a production monitor would scrape.
  *
  * Usage: `runMain graft.EtlGateBench [sfDir] [rows]` — bronze input is
  * derived from the sfDir `orders` table (caps at `rows`, default all),
  * so the trigger scales with sf like every other bench input.
  */
object EtlGateBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.drop(1).headOption.map(_.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_etlgate_").toString

    // bronze export derived from orders: every product field populated,
    // valid under the declared checks (the gate must PASS and publish —
    // the quarantine leg is EtlPipelineSpec's job)
    val orders = Tables.orders(spark, sfDir)
    val src = cap.map(orders.limit).getOrElse(orders)
      .select(
        concat(lit("p"), col("o_orderkey")).as("product_name"),
        col("o_totalprice").as("price"),
        lit(1).as("quantity"),
        col("o_orderpriority").as("category"),
        concat(lit("order comment "),
          when(col("o_orderkey") % 3 === 0, "fast delivery")
            .otherwise("standard delivery")).as("description"),
        lit(true).as("availability"),
        lit(0.0).as("discount_percentage"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"),
        concat(lit("user_"), col("o_custkey") % 1000).as("id"),
        concat(lit("shop_"), col("o_orderkey") % 50).as("shop_id"))
    val nRows = src.count()
    val shops = spark.range(50).select(concat(lit("shop_"), col("id")).as("shop"))
      .localCheckpoint(true)
    val checks = Seq(
      Constraints.Satisfies.notNull("id"),
      Constraints.Satisfies.notNull("product_name"),
      Constraints.Satisfies.inRange("price", 0.0, 1e7),
      Constraints.Satisfies.matches("date", "^\\d{4}-\\d{2}-\\d{2}$"),
      Constraints.Unique(Seq("product_name")),
      Constraints.References("shop_id", shops, "shop"))

    println(s"[etlgate] $nRows bronze rows from $sfDir orders; batch 25, deterministic scorer")
    println("| mode | rows | triggers | addBatch ms | trigger ms | wall (s) |")
    println("|---|---|---|---|---|---|")
    def once(tag: String, validate: Seq[Constraints.Check], rep: Int): (Double, String) = {
      val dir = s"$base/${tag.replaceAll("[^a-z0-9]+", "_")}_$rep"
      src.coalesce(4).write.json(s"$dir/bronze/new")
      val t0 = System.nanoTime()
      val q = EtlPipeline.start(spark, s"$dir/bronze/new", s"$dir/archive",
        s"$dir/silver", s"$dir/gold", s"$dir/ckpt",
        SentimentScorer("signal", failEvery = 0, flakyEvery = 0),
        EnrichConfig(batchSize = 25),
        validate = validate,
        quarantineDir = if (validate.isEmpty) None else Some(s"$dir/quarantine"))
      q.awaitTermination(600000)
      val wall = (System.nanoTime() - t0) / 1e9
      val silver = spark.read.json(s"$dir/silver/batch_0").count()
      require(silver == nRows, s"$tag: published $silver of $nRows rows")
      require(!new java.io.File(s"$dir/quarantine").exists(),
        s"$tag: a valid batch was quarantined")
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      val addBatch = progress.map(_.durationMs.getOrDefault("addBatch", 0L).toLong).sum
      val trigger = progress.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong).sum
      (trigger / 1000.0,
        f"| $tag | $nRows | ${progress.length} | $addBatch | $trigger | $wall%.2f |")
    }
    // min-of-2 per mode (the Bench protocol): a one-shot comparison
    // charges whichever mode runs first for the streaming/codegen
    // warm-up and can invert the ordering entirely
    def run(tag: String, validate: Seq[Constraints.Check]): Double = {
      val (t1, _) = once(tag, validate, 1)
      val (t2, row2) = once(tag, validate, 2)
      println(row2)
      math.min(t1, t2)
    }
    val plain = run("no-validation", Nil)
    val gated = run("validated (4 row rules + unique + fk)", checks)
    println(f"[etlgate] validation overhead: ${gated - plain}%.2f s per trigger " +
      f"(${(gated / plain - 1) * 100}%.0f%% — one extra pass over the pinned batch, " +
      "not a rescan per rule family)")
    spark.stop()
  }
}
