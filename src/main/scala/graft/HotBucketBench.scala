package graft

import graft.operators.PairEnum
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure what [[graft.operators.PairEnum.bucketPairs]]
  * buys on a MONSTER bucket — the content-cluster case (boilerplate
  * docs, identical vectors) where every row shares one bucket key and
  * the naive self-join hands a single task all c²/2 pairs while 31 of
  * 32 cores idle. The blocked triangular join spreads the same pair
  * volume across g(g+1)/2 independent cells. Numbers go to PLANS.md.
  */
object HotBucketBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(12000)
    // sim = 52-bit hamming verify (the simhash shape); lev = ID-like
    // strings with codegen'd levenshtein verify (the EditDist prefix-
    // gram shape — a popular gram on an ID domain IS this bucket)
    val mode = args.drop(1).headOption.getOrElse("sim")
    require(Set("sim", "lev")(mode), s"mode must be sim|lev, got $mode")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the at-scale regime: a corpus band table is far past any
      // broadcast threshold, so the bucket self-join is a shuffled
      // join and the hot key lands in ONE task. (PairEnum's internal
      // broadcast(heavy) HINT still applies — hints override the
      // threshold.) Without this, a toy-sized bucket frame broadcasts
      // and the naive join parallelizes over the stream side — real
      // corpora do not get that luxury.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // n rows, ONE bucket, each with a 52-bit signature payload (the
    // simhashPairsAdaptive shape) — plus a normal-bucket backdrop
    def sigOf(i: Long): String =
      (0 until 52).map(b => if (((i >> (b % 48)) & 1L) == 1L) '1' else '0').mkString
    def payloadOf(i: Long): String =
      if (mode == "lev") f"item#$i%09d" else sigOf(i)
    // process-lifetime pin (the bench measures the joins, not this
    // build); the tracked-scope spelling keeps the library contract
    val scope = new graft.operators.CacheScope
    val assign = scope.pin(
      ((1L to n.toLong).map(i => (i, 0, "hot", payloadOf(i))) ++
        (1L to 1000L).map(i => (1000000L + i, 1, s"cold${i % 500}", payloadOf(i))))
        .toDF("id", "band_idx", "band_val", "sig"))
    assign.count()
    def time(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val c = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"| $tag | $s%.2f s | ($c rows) |"); s
    }
    println(s"hot bucket n=$n (${n.toLong * (n - 1) / 2} pairs in one key), per-pair work = " +
      (if (mode == "lev") "levenshtein(14) <= 2 (the EditDist verify shape)"
       else "hamming_dist(52) + radius filter (the simhash verify shape)"))
    println("| spelling | wall-clock | survivors |"); println("|---|---|---|")
    val dist =
      if (mode == "lev") levenshtein(col("sig_a"), col("sig_b"))
      else call_function("hamming_dist", col("sig_a"), col("sig_b"))
    def naive = assign.as("a").join(assign.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") && col("a.id") < col("b.id"))
      .select(col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .filter(dist <= 2)
    println(s"naive join nodes: " + naive.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => "BHJ"
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => "SMJ"
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => "SHJ"
    }.mkString(","))
    for (round <- 1 to 2) {
      time(s"naive self-join r$round") { naive.count() }
      time(s"naive self-join AQE-off r$round") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try naive.count() finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      Seq(4096, 1024).foreach { bs =>
        val g = (n + bs - 1) / bs
        time(s"blocked blockSize=$bs (g=$g, ${g * (g + 1) / 2} cells) r$round") {
          PairEnum.bucketPairs(assign, Seq("band_idx", "band_val"),
            payloadCols = Seq("sig"), blockSize = bs)
            .filter(dist <= 2).count()
        }
      }
    }
    spark.stop()
  }
}
