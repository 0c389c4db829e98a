package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed HTTP fetch over a URL column — the reference's
  * stream-based crawler (deva/core/core.py:1656 `crawler`: URL stream
  * → concurrent GET with retries → response stream, errors routed to a
  * handler instead of killing the stream) re-shaped for a cluster: the
  * fetch runs ON THE EXECUTORS, one pooled client per JVM, so
  * throughput scales with partitions and a 100 TB url table never
  * funnels through the driver.
  *
  * Error contract (deva's `error=print` default, Spark-first): a
  * failed fetch lands in the `error` column and the row SURVIVES —
  * a crawl over billions of URLs must not fail the stage because one
  * host timed out. That is the opposite of [[Inference.annotate]]'s
  * loud-failure contract, and deliberately so: annotation responses
  * are load-bearing data, crawl responses are inherently best-effort.
  *
  * Politeness: `minIntervalMs` spaces requests WITHIN a partition
  * (token-interval, not burst), so cluster-wide request rate is
  * bounded by partitions × 1000/minIntervalMs — the deva
  * `rate_limit(0.1).crawler(workers=20)` composition in one place.
  * Retries are spaced by the SAME interval (and by Retry-After when
  * the host sends one), so the bound holds against failing hosts too.
  */
object Fetch {

  /** One client per executor JVM (pooled connections; a per-row client
    * would re-handshake every fetch). Connect timeout mandatory — a
    * black-holed host must become an `error` row, never a hung task.
    */
  @transient private lazy val jvmClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  /** Fetch every row's `urlCol`; returns `idCol, status, body, error`.
    * `status` is the HTTP code (0 when the request never got a
    * response), `error` is null on 2xx. Transient failures retry up to
    * `retries` times with linear backoff — deva's crawler retries 8
    * by default; here the count is explicit.
    */
  def get(spark: SparkSession, df: DataFrame, idCol: String, urlCol: String,
      retries: Int = 3, requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(30),
      minIntervalMs: Long = 0L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val timeout = requestTimeout
    val maxTries = retries.max(0) + 1
    val interval = minIntervalMs
    val ds = df.select(col(idCol).cast("long"),
      coalesce(col(urlCol).cast("string"), lit(""))).as[(Long, String)]
    ds.mapPartitions { rows =>
      var lastStart = 0L
      rows.map { case (id, url) =>
        if (interval > 0) {
          val wait = lastStart + interval - System.currentTimeMillis()
          if (wait > 0) Thread.sleep(wait)
          lastStart = System.currentTimeMillis()
        }
        fetchOne(url, maxTries, timeout, interval) match {
          case Right((status, body)) => (id, status, body, null: String)
          case Left((status, err)) => (id, status, null: String, err)
        }
      }
    }.toDF(idCol, "status", "body", "error")
  }

  /** Right((status, body)) on 2xx; Left((lastStatus, error)) after the
    * retry budget. Non-2xx responses retry (5xx are usually transient)
    * but report the final code; connection-level failures report 0.
    * 408 (request timeout) and 429 (rate limited) are transient BY
    * DEFINITION and retry like 5xx — a politeness-enforcing host must
    * see a back-off, not a permanent error row; every other 4xx is
    * permanent (retrying a 404 is wasted politeness budget).
    *
    * Retry pacing: each retry sleeps max(minIntervalMs, 50ms·attempt,
    * Retry-After) — retries count against the same politeness clock as
    * first attempts, so a host returning 5xx/429 is never hit FASTER
    * than a healthy one (the old 50ms-only backoff inverted that).
    */
  private def fetchOne(url: String, maxTries: Int,
      timeout: java.time.Duration, minIntervalMs: Long): Either[(Int, String), (Int, String)] = {
    var attempt = 0
    var last: Either[(Int, String), (Int, String)] = Left((0, "no attempt made"))
    var retryAfterMs = 0L
    while (attempt < maxTries) {
      attempt += 1
      retryAfterMs = 0L
      last =
        try {
          val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
            .timeout(timeout).GET().build()
          val resp = jvmClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
          val code = resp.statusCode()
          if (code / 100 == 2) return Right((code, resp.body()))
          else if (code / 100 == 4 && code != 408 && code != 429)
            return Left((code, s"HTTP $code"))
          else {
            // honor Retry-After when the host states one — either
            // valid form (RFC 9110: delta-seconds OR an HTTP-date) —
            // capped at the request timeout so a hostile header can't
            // park the task arbitrarily long
            val ra = resp.headers().firstValue("Retry-After")
            retryAfterMs = (if (ra.isPresent) parseRetryAfterMs(ra.get.trim)
              else 0L).min(timeout.toMillis).max(0L)
            Left((code, s"HTTP $code"))
          }
        } catch {
          case e: Exception => Left((0, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      if (attempt < maxTries)
        Thread.sleep(math.max(math.max(minIntervalMs, 50L * attempt), retryAfterMs))
    }
    last
  }

  /** Both RFC 9110 Retry-After forms: delta-seconds, or an HTTP-date
    * (RFC 1123) converted to a wait relative to now. An unparseable or
    * past date yields 0 (generic backoff applies).
    */
  private[operators] def parseRetryAfterMs(v: String): Long =
    v.toLongOption.map(_ * 1000L).getOrElse {
      try {
        val at = java.time.ZonedDateTime
          .parse(v, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME).toInstant
        java.time.Duration.between(java.time.Instant.now(), at).toMillis.max(0L)
      } catch { case _: Exception => 0L }
    }
}
