package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.charset.StandardCharsets
import scala.util.Try

/** Production [[Scorer]]: one OpenAI-compatible chat-completions call per
  * batch, mirroring the reference client exactly
  * (`data_transformer.py:28-54`, `enricher.go:73-127`):
  *
  *  - prompt: `"items :"` + `"\n id : <id> , review : <review> \n"` per
  *    item (`tools.py:51-64`);
  *  - request: system + user messages, `response_format: json_schema`
  *    with `strict: true` and the reference's `Response` schema — a
  *    `sentiments` array of `{item_id, sentiment}` pinned to exactly
  *    the batch's item count (`models_schema.py:16-22`; see
  *    [[responseSchema]] for the tail-batch divergence);
  *  - per-call timeout (60 s — `data_transformer.py:50`) enforced as both
  *    connect and read timeout;
  *  - response: `choices[0].message.content` parsed as the `Response`
  *    JSON; each echoed `{item_id, sentiment}` becomes one scored row.
  *
  * Retries, the id-echo contract, and failure degradation all live in
  * [[Enrich]] — one attempt here IS one HTTP call, and any transport /
  * HTTP / parse error is a `Failure` for the operator's retry loop. The
  * one Spark-shaped divergence is documented on [[Enrich]]: concurrency
  * is per-task waves instead of one process-global window.
  *
  * Plain `HttpURLConnection` — no extra dependency — and `Serializable`,
  * so executors can each open their own connections (the reference's
  * one-async-client-per-process shape maps to one scorer per task).
  */
final case class OpenAiCompatScorer(
    baseUrl: String,
    model: String,
    systemPrompt: String,
    reviewCol: String = "review",
    timeoutMs: Int = 60000,
    apiKey: String = "key") extends Scorer {

  val outputFields: Seq[StructField] =
    Seq(StructField("sentiment", BooleanType, nullable = true))

  /** `tools.py:51-64` verbatim: ids and reviews inlined into one user
    * prompt. */
  def prompt(batch: Seq[Row]): String = {
    val sb = new StringBuilder("items :")
    batch.foreach { r =>
      val id = r.getLong(r.fieldIndex("item_id"))
      val review = r.getAs[String](reviewCol)
      sb.append(s"\n id : $id , review : $review \n")
    }
    sb.toString
  }

  /** The pydantic `Response.model_json_schema()` shape the reference
    * sends (`models_schema.py:5-22`): strict object schema, sentiments
    * pinned to an exact entry count. Divergence (deliberate): the
    * reference pins 25 unconditionally, which makes a SHORT TAIL batch
    * unsatisfiable under `strict` (the model cannot both echo the
    * tail's ids and return 25 items) — we pin to the actual batch size,
    * so the schema and the id-echo contract agree on every batch. */
  private def responseSchema(nItems: Int): JObject =
    JObject(
      "type" -> JString("object"),
      "properties" -> JObject(
        "sentiments" -> JObject(
          "type" -> JString("array"),
          "items" -> JObject(
            "type" -> JString("object"),
            "properties" -> JObject(
              "item_id" -> JObject("type" -> JString("integer")),
              "sentiment" -> JObject("type" -> JString("boolean"))),
            "required" -> JArray(List(JString("item_id"), JString("sentiment"))),
            "additionalProperties" -> JBool(false)),
          "minItems" -> JInt(nItems),
          "maxItems" -> JInt(nItems))),
      "required" -> JArray(List(JString("sentiments"))),
      "additionalProperties" -> JBool(false))

  private def requestBody(batch: Seq[Row]): String = {
    val body = JObject(
      "model" -> JString(model),
      "messages" -> JArray(List(
        JObject("role" -> JString("system"), "content" -> JString(systemPrompt)),
        JObject("role" -> JString("user"), "content" -> JString(prompt(batch))))),
      "response_format" -> JObject(
        "type" -> JString("json_schema"),
        "json_schema" -> JObject(
          "name" -> JString("sentiment_analysis_response"),
          "description" -> JString(
            "Response containing sentiment analysis for product reviews"),
          "schema" -> responseSchema(batch.size),
          "strict" -> JBool(true))))
    JsonMethods.compact(JsonMethods.render(body))
  }

  private def post(json: String): String = {
    // ONE deadline spans the ENTIRE attempt — connect, request write,
    // response headers, and body read. Between blocking operations the
    // deadline is enforced exactly (remainingMs throws); DURING one
    // blocking socket read only the SO_TIMEOUT that was in effect when
    // the response stream opened applies (the JDK does not re-read
    // setReadTimeout mid-stream), and that SO_TIMEOUT is itself ≤ the
    // budget — so the worst case is deadline + one frozen read, i.e.
    // ≤ 2× timeoutMs per attempt. Enrich's hung-scorer backstop is
    // sized to that 2× bound. (Per-phase timeouts alone would allow
    // ~3×: connect + first-byte + body each getting a full budget.)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def remainingMs: Int = {
      val ms = (deadline - System.nanoTime()) / 1000000L
      if (ms <= 0)
        throw new RuntimeException(s"chat/completions attempt exceeded ${timeoutMs}ms total")
      math.min(ms, Int.MaxValue.toLong).toInt
    }
    val url = java.net.URI.create(s"$baseUrl/chat/completions").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(remainingMs)
      conn.setReadTimeout(remainingMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setRequestProperty("Authorization", s"Bearer $apiKey")
      val out = conn.getOutputStream
      try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
      // the header read blocks up to the READ timeout — refresh it to the
      // time the deadline has left so connect + headers share the budget
      conn.setReadTimeout(remainingMs)
      val code = conn.getResponseCode
      if (code / 100 != 2)
        throw new RuntimeException(s"chat/completions returned HTTP $code")
      // Chunked read with the same total deadline + interrupt checks: a
      // per-read timeout only bounds the gap between bytes, so a server
      // dripping one byte per interval would otherwise hold this thread
      // (and its slot in Enrich's in-flight window) forever — and
      // blocking socket reads ignore Thread.interrupt, so the Enrich
      // backstop's cancel(true) could never free it. Between-chunk
      // probes (remainingMs throws past the deadline) make the scorer
      // deadline- and interrupt-responsive within one socket read; the
      // read itself is bounded by the SO_TIMEOUT frozen at stream open
      // (see the 2× note above).
      val in = conn.getInputStream
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        remainingMs
        var n = in.read(chunk)
        while (n != -1) {
          if (Thread.currentThread().isInterrupted)
            throw new InterruptedException("scorer interrupted mid-response")
          bytes.write(chunk, 0, n)
          remainingMs // throws once the deadline passes
          n = in.read(chunk)
        }
        bytes.toString(StandardCharsets.UTF_8)
      } finally in.close()
    } finally conn.disconnect()
  }

  /** Parse `choices[0].message.content` → the `Response` model →
    * (item_id, [sentiment]) pairs. Any shape violation throws (→ Failure
    * → Enrich retry). */
  private def parse(responseJson: String): Seq[(Long, Seq[Any])] = {
    val content = JsonMethods.parse(responseJson) \ "choices" match {
      case JArray(first :: _) => first \ "message" \ "content" match {
        case JString(s) => s
        case other => throw new RuntimeException(s"no message content: $other")
      }
      case other => throw new RuntimeException(s"no choices in response: $other")
    }
    JsonMethods.parse(content) \ "sentiments" match {
      case JArray(items) => items.map { item =>
        val id = item \ "item_id" match {
          case JInt(i) => i.toLong
          case JLong(l) => l
          case other => throw new RuntimeException(s"bad item_id: $other")
        }
        val sentiment: Any = item \ "sentiment" match {
          case JBool(b) => b
          case JNull => null // the reference's empty_response carries nulls
          case other => throw new RuntimeException(s"bad sentiment: $other")
        }
        id -> Seq(sentiment)
      }
      case other => throw new RuntimeException(s"no sentiments array: $other")
    }
  }

  def score(bid: Long, batch: Seq[Row], attempt: Int): Try[Seq[(Long, Seq[Any])]] =
    Try(parse(post(requestBody(batch))))
}
