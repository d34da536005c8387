package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.RestPoll
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** The HTTP-polling source against a real local server: header auth is
  * sent, batches accumulate until the endpoint runs dry (the
  * collector's stop condition), transient 5xx responses are retried and
  * exhausted retries fail loudly, maxPolls bounds the loop, and the
  * accumulated pages parse into one typed frame under a declared
  * schema with absent fields nulled. */
class RestPollSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("item_id", LongType),
    StructField("review", StringType),
    StructField("price", DoubleType)))

  private def withServer(handler: HttpExchange => (Int, String))(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val (code, payload) = handler(ex)
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  test("polls until the API runs dry, sends the auth header, parses to a typed frame") {
    val calls = new AtomicInteger(0)
    val seenKeys = scala.collection.concurrent.TrieMap.empty[String, Unit]
    withServer { ex =>
      Option(ex.getRequestHeaders.getFirst("X-API-Key")).foreach(k => seenKeys.put(k, ()))
      val n = calls.incrementAndGet()
      if (n <= 3) (200, s"""[{"item_id": ${n * 10}, "review": "r$n", "price": ${n}.5},
                           | {"item_id": ${n * 10 + 1}, "review": null}]""".stripMargin)
      else (200, "[]") // dry — the collector's break condition
    } { url =>
      val df = RestPoll.pollToFrame(spark, url, schema,
        headers = Map("X-API-Key" -> "sekrit"), maxPolls = 10)
      val rows = df.collect().map(r =>
        (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(rows == Set(
        (10L, "r1", Some(1.5)), (11L, null, None),
        (20L, "r2", Some(2.5)), (21L, null, None),
        (30L, "r3", Some(3.5)), (31L, null, None)))
      assert(calls.get() == 4, "should have stopped on the first empty page")
      assert(seenKeys.keySet == Set("sekrit"))
    }
  }

  test("maxPolls bounds a never-dry endpoint") {
    val calls = new AtomicInteger(0)
    withServer { _ =>
      (200, s"""[{"item_id": ${calls.incrementAndGet()}, "review": "x", "price": 1.0}]""")
    } { url =>
      val bodies = RestPoll.pollJson(url, maxPolls = 3)
      assert(bodies.length == 3 && calls.get() == 3)
    }
  }

  test("collector run_loop end-to-end: poll -> accumulate -> surrogate-key decorate -> chunked upload") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val calls = new AtomicInteger(0)
    withServer { _ =>
      val n = calls.incrementAndGet()
      if (n <= 2) (200, (1 to 5).map { i =>
        val id = (n - 1) * 5 + i
        s"""{"item_id": $id, "review": "rev$id", "price": $id.0}"""
      }.mkString("[", ",", "]"))
      else (200, "[]")
    } { url =>
      // poll until dry (the reference's max_size accumulation loop)
      val raw = RestPoll.pollToFrame(spark, url, schema, maxPolls = 10)
      // decorate with surrogate user/shop keys from fixed pools
      // (collector.addUsers/addShops: modulo index into a seeded pool)
      val users = (0 until 7).map(i => Tuple1(s"user_$i")).toDF("uid")
      val shops = (0 until 5).map(i => Tuple1(s"shop_$i")).toDF("sid")
      val withIdx = graft.operators.DenseId.withDenseId(raw, Seq(col("item_id")), "idx")
      val decorated = graft.operators.PoolAssign.assign(
        graft.operators.PoolAssign.assign(withIdx, col("idx"), users, "uid", "user_id", a = 3, b = 1),
        col("idx"), shops, "sid", "shop_id", a = 2, b = 0)
      // unique-name chunked upload (the storage write)
      val dir = java.nio.file.Files.createTempDirectory("graft_collect_").toString +
        "/" + graft.sinks.Sinks.uniqueName(java.time.Instant.EPOCH)
      graft.sinks.Sinks.chunkedWrite(decorated, dir, maxRecordsPerFile = 4)
      val back = spark.read.json(dir)
      assert(back.count() == 10)
      assert(back.select("user_id").distinct().count() > 1)
      assert(back.select(countDistinct("item_id")).head().getLong(0) == 10)
      // decoration is a bijection per pool cycle: deterministic, no dupes
      val u = back.select("item_id", "user_id").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val again = graft.operators.PoolAssign.assign(withIdx, col("idx"), users, "uid", "user_id", 3, 1)
        .select(col("item_id"), col("user_id")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(u == again)
    }
  }

  test("transient 500 is retried; exhausted retries fail loudly; 204 reads as empty") {
    val calls = new AtomicInteger(0)
    withServer { _ =>
      if (calls.incrementAndGet() == 1) (500, "boom") else (200, """[{"item_id": 1}]""")
    } { url =>
      val bodies = RestPoll.pollJson(url, maxPolls = 1, retries = 3)
      assert(bodies.length == 1 && calls.get() == 2, "first attempt 500, second should succeed")
    }
    withServer { _ => (500, "always down") } { url =>
      val e = intercept[java.io.IOException](RestPoll.getOnce(url, retries = 2))
      assert(e.getMessage.contains("after 2 attempt"))
    }
    withServer { _ => (204, "") } { url =>
      assert(RestPoll.pollJson(url, maxPolls = 5).isEmpty)
    }
  }

  test("429 honors Retry-After; throttle codes back off even with backoffMs=0") {
    // server says "retry in 1 s": the client must wait it out, not burn
    // the remaining retries inside the throttle window
    val calls = new AtomicInteger(0)
    withServer { ex =>
      if (calls.incrementAndGet() == 1) {
        ex.getResponseHeaders.set("Retry-After", "1")
        (429, "slow down")
      } else (200, """[{"item_id": 1}]""")
    } { url =>
      val t0 = System.nanoTime()
      val body = RestPoll.getOnce(url, retries = 2, backoffMs = 0)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(body.contains("item_id") && calls.get() == 2)
      assert(elapsedMs >= 900, s"Retry-After: 1 ignored (elapsed ${elapsedMs}ms)")
    }
    // no Retry-After header: the nonzero default throttle backoff applies
    // (500 ms, then 1000 ms) even though the caller left backoffMs=0
    val calls2 = new AtomicInteger(0)
    withServer { _ =>
      if (calls2.incrementAndGet() <= 2) (429, "slow down") else (200, "[]")
    } { url =>
      val t0 = System.nanoTime()
      RestPoll.getOnce(url, retries = 3, backoffMs = 0)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(calls2.get() == 3)
      assert(elapsedMs >= 1400, s"default throttle backoff missing (elapsed ${elapsedMs}ms)")
    }
  }

  test("4xx fails FAST (no retry burn); 5xx still consumes the retry budget") {
    val calls = new AtomicInteger(0)
    withServer { _ => { calls.incrementAndGet(); (404, "no such key") } } { url =>
      val e = intercept[RestPoll.ClientError](
        RestPoll.getOnce(url, retries = 5, backoffMs = 1000))
      assert(e.getMessage.contains("HTTP 404"))
      assert(calls.get() == 1, "a permanent client error must not be retried")
    }
    val calls5 = new AtomicInteger(0)
    withServer { _ => { calls5.incrementAndGet(); (503, "overloaded") } } { url =>
      intercept[java.io.IOException](RestPoll.getOnce(url, retries = 3))
      assert(calls5.get() == 3, "5xx is transient: every retry should be spent")
    }
  }
}
