package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.operators.{Enrich, EnrichConfig, OpenAiCompatScorer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Dev tool: MEASURE the §2.9 enrichment concurrency claim — the
  * harness analogue of the reference's one published performance number
  * (the async batch window cut a 13-day backfill to 7,
  * `ollama_client.py:110-111`).
  *
  * Runs [[Enrich.enrich]] + the production [[OpenAiCompatScorer]]
  * against an in-process stub chat-completions server whose only cost
  * is a fixed per-request service latency (the model-inference stand-in
  * — no network, so the measured ratio isolates the operator's
  * concurrency window), at the reference operating point: batch 25,
  * in-flight 4, vs the same pipeline with in-flight 1 (the reference's
  * pre-async loop). `tasks` models the executor-side parallelism
  * (default 1 = the reference's single process; total concurrency =
  * tasks × inflight).
  *
  * Usage: `runMain graft.EnrichBench [sfDir] [latencyMs] [tasks]`.
  * Output: one markdown row per mode (items/sec, wall) + the speedup —
  * pasted into PLANS.md per round; the wall-overlap REGRESSION gate
  * (in-flight 4 strictly beats sequential on one task) lives in
  * OpenAiCompatScorerSpec and reuses the same stub shape.
  */
object EnrichBench {

  /** One-route stub chat-completions server: echoes every prompt id
    * with `sentiment = id % 2 == 0` after `latencyMs` of simulated
    * inference. Concurrent by construction (cached thread pool) — the
    * server must never be the serialization point being measured. */
  def startStub(latencyMs: Long): (HttpServer, String, AtomicInteger) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val req = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      calls.incrementAndGet()
      Thread.sleep(latencyMs)
      val ids = "id : (\\d+) ,".r.findAllMatchIn(req).map(_.group(1).toLong).toList
      // the s-interpolator processes escapes even in triple quotes, so
      // \\" renders the literal \" the content JSON string needs
      val sentiments = ids.map(id =>
        s"""{\\"item_id\\": $id, \\"sentiment\\": ${id % 2 == 0}}""").mkString(",")
      val body =
        s"""{"choices":[{"message":{"role":"assistant","content":"{\\"sentiments\\": [$sentiments]}"}}]}"""
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => { val t = new Thread(r, "enrich-stub"); t.setDaemon(true); t }))
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/v1", calls)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val latencyMs = args.drop(1).headOption.map(_.toLong).getOrElse(50L)
    val tasks = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      // Enrich shuffles onto numShufflePartitions tasks — this IS the
      // process-parallelism knob being modeled
      .config("spark.sql.shuffle.partitions", tasks.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (server, base, calls) = startStub(latencyMs)
    try {
      // the documents table is the corpus stand-in: doc text as the
      // review the scorer ships to the model
      val items = Tables.documents(spark, sfDir)
        .select(col("doc_id").as("item_id"), col("text").as("review"))
        .localCheckpoint(true)
      val n = items.count()
      val scorer = OpenAiCompatScorer(base, "stub-model",
        "You are a sentiment classifier.")
      println(s"[enrichbench] $n items, batch 25, ${latencyMs}ms/call, $tasks task(s)")
      println("| mode | items | calls | wall (s) | items/sec |")
      println("|---|---|---|---|---|")
      // min-of-2 per mode (the EtlGateBench protocol): a one-shot
      // sequential-then-concurrent comparison charges the first mode
      // with all JIT/codegen/HTTP warm-up and overstates the speedup
      def run(tag: String, inflight: Int): Double = {
        val walls = (1 to 2).map { _ =>
          calls.set(0)
          val t0 = System.nanoTime()
          val out = Enrich.enrich(items, scorer,
            EnrichConfig(batchSize = 25, inflight = inflight))
          val scoredRows = out.filter(col("sentiment").isNotNull).count()
          val wall = (System.nanoTime() - t0) / 1e9
          require(scoredRows == n, s"$tag: $scoredRows of $n rows scored — stub misbehaved")
          wall
        }
        val wall = walls.min
        println(f"| $tag | $n | ${calls.get()} | $wall%.2f | ${n / wall}%.0f |")
        wall
      }
      val wallSeq = run("sequential (in-flight 1)", 1)
      val wall4 = run("in-flight 4", 4)
      println(f"[enrichbench] speedup: ${wallSeq / wall4}%.2fx " +
        f"(reference's published analogue: 13 days -> 7)")
    } finally {
      server.stop(0)
      spark.stop()
    }
  }
}
