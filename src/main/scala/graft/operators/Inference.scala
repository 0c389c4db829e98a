package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Batched model-annotation over a column — the reference's LLM
  * worker surface (deva/llm/client.py:48 `GPT.sync_query`/`:201
  * async_query`, worker_runtime.py) re-shaped for a cluster: deva
  * sends one prompt at a time from the event loop; at 100 TB the
  * annotation call runs ON THE EXECUTORS, batched per partition, so
  * throughput scales with partitions and the driver never sees a
  * prompt.
  *
  * The transport is pluggable and [[httpTransport]] is a REAL one:
  * it POSTs each batch as a JSON array of prompts to an HTTP endpoint
  * and expects a JSON array of annotations back — one client per
  * executor JVM, status-checked, response-count-checked. The spec
  * drives it against a live localhost server (zero egress — the
  * container has no external network, not no network stack). The
  * Spark-side contract — batching, schema, ordering independence,
  * per-JVM client lifecycle — is tested end-to-end over real HTTP.
  */
object Inference {

  /** Annotate `textCol` of every row, `batchSize` prompts per call.
    * `call` receives one batch of prompts and must return exactly one
    * response per prompt, in order — the executor-side analogue of
    * `GPT.sync_query(list_of_prompts)`. `idCol` must be numeric and
    * non-null (it keys the responses back); null text becomes the
    * empty prompt rather than an executor NPE.
    */
  def annotate(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 32)(call: Seq[String] => Seq[String]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val ds: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"),
        coalesce(col(textCol).cast("string"), lit(""))).as[(Long, String)]
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val responses = call(batch.map(_._2))
        require(responses.length == batch.length,
          s"inference call returned ${responses.length} responses for ${batch.length} prompts")
        batch.map(_._1).zip(responses)
      }
    }.toDF(idCol, "response")
  }

  // ---- JSON string-array wire codec (JDK-only, both directions) ----

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Encode a prompt batch as a JSON array of strings. */
  def encodeBatch(prompts: Seq[String]): String =
    prompts.map(p => "\"" + jsonEscape(p) + "\"").mkString("[", ",", "]")

  /** Decode a JSON array of strings — strict (malformed wire data
    * fails loudly; a truncated response must never become a silently
    * short batch, the count contract in [[annotate]] depends on it).
    */
  def decodeBatch(json: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    def skipWs(): Unit = while (i < json.length && json(i).isWhitespace) i += 1
    def fail(msg: String) =
      throw new IllegalArgumentException(s"malformed batch JSON at offset $i: $msg")
    // the array must be the WHOLE input: trailing bytes mean a
    // corrupted/concatenated response and must fail, not be ignored
    def finish(): Seq[String] = {
      skipWs()
      if (i < json.length) fail("trailing data after array")
      out.result()
    }
    skipWs()
    if (i >= json.length || json(i) != '[') fail("expected '['")
    i += 1
    skipWs()
    if (i < json.length && json(i) == ']') return { i += 1; finish() }
    while (true) {
      skipWs()
      if (i >= json.length || json(i) != '"') fail("expected string")
      i += 1
      val b = new StringBuilder
      while (i < json.length && json(i) != '"') {
        if (json(i) == '\\') {
          if (i + 1 >= json.length) fail("dangling escape")
          json(i + 1) match {
            case '"' => b.append('"'); i += 2
            case '\\' => b.append('\\'); i += 2
            case '/' => b.append('/'); i += 2
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case 'u' =>
              if (i + 6 > json.length) fail("truncated \\u escape")
              b.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case c => fail(s"unknown escape \\$c")
          }
        } else { b.append(json(i)); i += 1 }
      }
      if (i >= json.length) fail("unterminated string")
      i += 1 // closing quote
      out += b.toString
      skipWs()
      if (i >= json.length) fail("unterminated array")
      json(i) match {
        case ',' => i += 1
        case ']' => i += 1; return finish()
        case c => fail(s"expected ',' or ']', got '$c'")
      }
    }
    finish()
  }

  /** One HTTP client per executor JVM (clients pool connections;
    * per-batch construction would re-handshake every call). A connect
    * timeout is mandatory: a black-holed endpoint must surface as a
    * failed task (which Spark retries — the at-least-once story),
    * never as a hung one that no retry policy can see.
    */
  @transient private lazy val jvmClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  /** REAL transport: POST the prompt batch as a JSON array to `url`,
    * parse the JSON-array response. Non-2xx fails the task loudly
    * (Spark's retry gives at-least-once, never a silent drop) — the
    * executor-side shape of deva's `GPT.sync_query` against an
    * OpenAI-style batch endpoint. `requestTimeout` bounds the whole
    * exchange the same way: a stalled server throws
    * HttpTimeoutException instead of blocking the task forever.
    */
  def httpTransport(url: String,
      requestTimeout: java.time.Duration = java.time.Duration.ofMinutes(5)): Seq[String] => Seq[String] = {
    val target = url // capture the string, not the enclosing object
    val limit = requestTimeout
    prompts => {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(target))
        .header("Content-Type", "application/json")
        .timeout(limit)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(encodeBatch(prompts)))
        .build()
      val resp = jvmClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"annotation endpoint $target returned HTTP ${resp.statusCode()}")
      decodeBatch(resp.body())
    }
  }
}
