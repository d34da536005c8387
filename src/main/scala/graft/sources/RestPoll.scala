package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import java.nio.charset.StandardCharsets

/** Generic HTTP-polling REST source — the collector's ingest loop
  * (`collect/collector.py:26-39` getData + `:110-128` run_loop) as a
  * reusable wrapper: GET a keyed endpoint repeatedly, accumulate the
  * raw JSON bodies, stop on an empty response (the reference breaks its
  * loop when the API returns nothing) or at `maxPolls`, then parse the
  * accumulated batches into ONE DataFrame under a DECLARED schema (the
  * S2 contract — schema inference over remote payloads is both a
  * correctness and a scale hazard).
  *
  * Transport contract, mirroring the engine's production HTTP client
  * ([[graft.operators.OpenAiCompatScorer]]): plain `HttpURLConnection`
  * (no added dependency), per-request connect+read timeout, bounded
  * retries with optional backoff on transport/HTTP errors, loud failure
  * once retries are exhausted — a silent partial poll would look like a
  * short day of data downstream.
  *
  * Scale shape: polling ONE endpoint is inherently sequential
  * driver-side work (the reference's loop is the same) and the payload
  * per poll is API-page sized — the parallel side of ingestion lives in
  * [[graft.streaming.FileQueue]] (S5: executors fetch queued files
  * concurrently) once payloads land in storage. This wrapper is the
  * front door, not the firehose; [[toFrame]] hands Spark the batches as
  * a dataset so parsing runs distributed, not on the driver.
  */
object RestPoll {

  /** Marks an HTTP 4xx — the request itself is wrong (bad key, wrong
    * path), so retrying it verbatim cannot succeed. */
  final class ClientError(msg: String) extends java.io.IOException(msg)

  /** Marks a throttle/timeout response (408/429), carrying the server's
    * `Retry-After` delay when it sent one. */
  private final class Throttled(msg: String, val retryAfterMs: Option[Long])
    extends java.io.IOException(msg)

  /** Longest single sleep honored from `Retry-After` — a misbehaving
    * server saying "retry in an hour" must not hang the poll loop. */
  private val MaxRetryAfterMs = 30000L

  /** Default per-attempt backoff for 408/429 when the caller set
    * `backoffMs = 0`: re-polling a rate-limited endpoint immediately
    * just burns the remaining retries inside the same throttle window. */
  private val ThrottleBackoffMs = 500L

  /** `Retry-After` per RFC 9110: either delta-seconds or an HTTP-date. */
  private def retryAfterMsOf(conn: java.net.HttpURLConnection): Option[Long] = {
    val raw = Option(conn.getHeaderField("Retry-After")).map(_.trim).filter(_.nonEmpty)
    raw.flatMap { v =>
      v.toLongOption.map(_ * 1000L).orElse {
        val at = conn.getHeaderFieldDate("Retry-After", -1L)
        if (at > 0) Some(at - System.currentTimeMillis()) else None
      }
    }.map(ms => math.min(math.max(ms, 0L), MaxRetryAfterMs))
  }

  /** One GET with bounded retries. Returns the body string; throws
    * after `retries` failed attempts. A 204 returns "". Only TRANSPORT
    * errors, 5xx, and the two explicitly-transient client codes — 408
    * Request Timeout and 429 Too Many Requests — are retried: any other
    * 4xx is a [[ClientError]] thrown immediately, since a permanent
    * client error (401/404) would burn every retry with backoff and
    * fail identically. (429 is the normal weather of a polling source;
    * failing a stream on it would be wrong.) Throttle retries honor the
    * server's `Retry-After` (capped at [[MaxRetryAfterMs]]) and fall back
    * to a nonzero per-attempt delay even when `backoffMs = 0` — an
    * immediate re-poll of a rate-limited endpoint burns every retry
    * inside the same throttle window. Error bodies are drained before
    * disconnect so keep-alive connections stay reusable. */
  def getOnce(url: String, headers: Map[String, String] = Map.empty,
              timeoutMs: Int = 10000, retries: Int = 3, backoffMs: Long = 0): String = {
    require(retries >= 1, s"RestPoll: retries must be >= 1, got $retries")
    var last: Throwable = null
    var attempt = 0
    while (attempt < retries) {
      attempt += 1
      try {
        val conn = new java.net.URI(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try {
          conn.setRequestMethod("GET")
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
          val code = conn.getResponseCode
          if (code >= 400) {
            // drain the error stream (connection-reuse hygiene)
            val err = conn.getErrorStream
            if (err != null) try { err.readAllBytes(); () } finally err.close()
            if (code < 500 && code != 408 && code != 429)
              throw new ClientError(s"RestPoll: HTTP $code from $url")
            if (code == 408 || code == 429)
              throw new Throttled(s"RestPoll: HTTP $code from $url", retryAfterMsOf(conn))
            throw new java.io.IOException(s"RestPoll: HTTP $code from $url")
          }
          val in = conn.getInputStream
          try return new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        } finally conn.disconnect()
      } catch {
        case e: ClientError => throw e // 4xx: fail fast, no retry
        case e: Throttled =>
          last = e
          // Honor the server's Retry-After; without one, throttle codes
          // still back off (never hot-spin inside the throttle window).
          if (attempt < retries) {
            val base = if (backoffMs > 0) backoffMs else ThrottleBackoffMs
            Thread.sleep(e.retryAfterMs.getOrElse(base * attempt))
          }
        case e: java.io.IOException =>
          last = e
          if (attempt < retries && backoffMs > 0) Thread.sleep(backoffMs * attempt)
      }
    }
    throw new java.io.IOException(
      s"RestPoll: $url failed after $retries attempt(s): ${last.getMessage}", last)
  }

  /** Poll until the endpoint returns an empty body / empty JSON array
    * (the collector's stop condition) or `maxPolls` is reached. Returns
    * the non-empty raw bodies in poll order. */
  def pollJson(url: String, headers: Map[String, String] = Map.empty, maxPolls: Int = 10,
               timeoutMs: Int = 10000, retries: Int = 3, backoffMs: Long = 0): Seq[String] = {
    require(maxPolls >= 1, s"RestPoll: maxPolls must be >= 1, got $maxPolls")
    val out = Seq.newBuilder[String]
    var polls = 0
    var stopped = false
    while (polls < maxPolls && !stopped) {
      val body = getOnce(url, headers, timeoutMs, retries, backoffMs).trim
      polls += 1
      if (body.isEmpty || body == "[]" || body == "null") stopped = true
      else out += body
    }
    out.result()
  }

  /** Parse accumulated JSON-array bodies into one typed DataFrame. Each
    * body is one JSON document (an array of objects, as REST pages are);
    * Spark's JSON reader fans a top-level array out to one row per
    * element, and parsing runs distributed over the dataset — the
    * driver never walks the payloads. Fields absent from a record are
    * null (declared-schema semantics, same as the bronze reader). */
  def toFrame(spark: SparkSession, bodies: Seq[String], schema: StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(spark.createDataset(bodies))
  }

  /** The collector's full accumulate-then-frame loop in one call. */
  def pollToFrame(spark: SparkSession, url: String, schema: StructType,
                  headers: Map[String, String] = Map.empty, maxPolls: Int = 10,
                  timeoutMs: Int = 10000, retries: Int = 3, backoffMs: Long = 0): DataFrame =
    toFrame(spark, pollJson(url, headers, maxPolls, timeoutMs, retries, backoffMs), schema)
}
