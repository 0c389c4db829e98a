package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.EventFlow

/** HTTP ingest/egress — the reference's web surface
  * (deva/core/sources.py:427 `from_http_server`, :1499 `http_topic`;
  * deva/core/pipe.py:1200 `post_to`, :1292 `read_from`;
  * core.py:1656 `crawler`) built entirely on JDK classes
  * (`com.sun.net.httpserver`, `java.net.http.HttpClient`) — zero
  * added dependencies.
  *
  * Design: the ENGINE contract stays a file stream. The HTTP server
  * is an adapter that spools each request body to an immutable file;
  * Spark tails the spool directory exactly like any other file
  * source — so ingest inherits checkpointing, replay, and multi-
  * subscriber fan-out (point a [[Topic]] at the spool) instead of
  * inventing a bespoke receiver. At scale the same spool contract is
  * fulfilled by a fleet of stateless ingest pods writing to object
  * storage; nothing engine-side changes.
  */
object HttpIngest {

  private val seq = new AtomicLong()

  /** Start an ingest endpoint: POST bodies to `/ingest` land as
    * one-file-per-request under `spoolDir` (atomic move — a reader
    * never sees a partial file; dot-prefixed temp names are invisible
    * to Spark's file source). Returns the server; `stop(0)` ends it.
    */
  def startServer(port: Int, spoolDir: String): HttpServer = {
    Files.createDirectories(Paths.get(spoolDir))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/ingest", (ex: HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        if (ex.getRequestMethod == "POST" && body.nonEmpty) {
          val id = s"${System.nanoTime()}_${seq.incrementAndGet()}"
          val tmp = Paths.get(spoolDir, s".tmp_$id")
          Files.writeString(tmp, if (body.endsWith("\n")) body else body + "\n")
          Files.move(tmp, Paths.get(spoolDir, s"req_$id.txt"),
            StandardCopyOption.ATOMIC_MOVE)
        }
        val resp = "ok".getBytes(UTF_8)
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp)
      } finally ex.close()
    })
    server.start()
    server
  }

  /** The ingest flow: a streaming tail of the spool — one row per
    * posted line (deva from_http_server's downstream contract).
    */
  def flow(spark: SparkSession, spoolDir: String): EventFlow =
    EventFlow.fromText(spark, spoolDir)

  /** deva `read_from`/`crawler` fetch primitive: GET a URL, one row
    * per response line. The fetch is driver-side by nature (ONE url —
    * parallelize the lines, not the request); for a frontier of many
    * urls, map this over a DataFrame of urls with [[postTo]]'s
    * per-partition client pattern instead.
    */
  def readFrom(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    // an error page is not data: fail loudly (mirrors postTo's non-2xx
    // contract) instead of silently ingesting a 404/500 body as rows
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"readFrom $url returned HTTP ${resp.statusCode()} — refusing to ingest error body")
    resp.body().split("\n").toIndexedSeq.filter(_.nonEmpty).toDF("value")
  }

  /** deva `post_to`: deliver each row of a single string column as an
    * HTTP POST. Runs ON THE EXECUTORS — one client per partition,
    * rows stream through it — so delivery scales with the data
    * instead of funneling through the driver. A non-2xx response
    * fails the task (Spark's task retry then re-sends the partition:
    * at-least-once delivery, never a silent drop).
    */
  def postTo(df: DataFrame, colName: String, url: String): Unit = {
    val uri = java.net.URI.create(url)
    df.select(colName).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val client = java.net.http.HttpClient.newHttpClient()
      rows.foreach { r =>
        val req = java.net.http.HttpRequest.newBuilder(uri)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(r.getString(0)))
          .build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(
            s"postTo $url returned HTTP ${resp.statusCode()} — delivery not accepted")
      }
    }
  }
}
