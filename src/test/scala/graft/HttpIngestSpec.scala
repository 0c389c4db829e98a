package graft

import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.{ServerSocket, URI}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpIngest

/** Live HTTP drive: POSTs land in the spool, the spool streams into
  * Spark, and the client primitives round-trip against the same
  * endpoint — deva's from_http_server / post_to / read_from surface
  * exercised end-to-end with real sockets.
  */
class HttpIngestSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("POSTed bodies flow through the spool into a streaming DataFrame") {
    val spool = Files.createTempDirectory("graft_http_spool").toString
    val port = freePort()
    val server = HttpIngest.startServer(port, spool)
    try {
      val client = HttpClient.newHttpClient()
      (1 to 5).foreach { i =>
        val r = client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ingest"))
            .POST(HttpRequest.BodyPublishers.ofString(s"event$i")).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(r.statusCode() == 200 && r.body() == "ok")
      }
      val q = HttpIngest.flow(spark, spool)
        .df.writeStream.format("memory").queryName("http_spec")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("http_spec").collect().map(_.getString(0)).sorted.toSeq
        assert(got == (1 to 5).map(i => s"event$i"), s"got $got")
        // late arrival flows through the RUNNING stream
        client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ingest"))
            .POST(HttpRequest.BodyPublishers.ofString("event6")).build(),
          HttpResponse.BodyHandlers.ofString())
        q.processAllAvailable()
        assert(spark.table("http_spec").count() == 6)
      } finally q.stop()
    } finally server.stop(0)
  }

  test("postTo delivers every row from the executors; readFrom fetches them back") {
    val sp = spark
    import sp.implicits._
    val spool = Files.createTempDirectory("graft_http_spool2").toString
    val port = freePort()
    val server = HttpIngest.startServer(port, spool)
    try {
      val rows = (1 to 12).map(i => s"msg$i")
      HttpIngest.postTo(rows.toDF("value"), "value", s"http://127.0.0.1:$port/ingest")
      // every row arrived exactly once (one spool file per POST)
      val spooled = spark.read.text(spool).collect().map(_.getString(0)).sorted.toSeq
      assert(spooled == rows.sorted, s"got $spooled")
    } finally server.stop(0)
  }

  test("readFrom turns a GET response into one row per line") {
    val port = freePort()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/data", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = "alpha\nbeta\ngamma\n".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val got = HttpIngest.readFrom(spark, s"http://127.0.0.1:$port/data")
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("alpha", "beta", "gamma"))
    } finally server.stop(0)
  }
}
