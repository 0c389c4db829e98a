package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventFlow

/** Live source drives: a real TCP socket (deva from_tcp_port,
  * sources.py:341) and a growing text directory (deva from_textfile
  * tail, sources.py:199) — the two polling sources the reference
  * treats as primary inputs, exercised against actual endpoints.
  */
class LiveSourcesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  test("socket source streams lines from a live TCP server") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val feeder = new Thread(() => {
      val s = server.accept()
      val out = new PrintWriter(s.getOutputStream, true)
      (1 to 5).foreach(i => out.println(s"line$i"))
      out.flush()
      Thread.sleep(8000)
      s.close(); server.close()
    })
    feeder.setDaemon(true)
    feeder.start()
    val q = EventFlow.fromSocket(spark, "localhost", port)
      .df.writeStream.format("memory").queryName("sock_spec")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      var n = 0L
      while (n < 5 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("sock_spec").count()
        if (n < 5) Thread.sleep(200)
      }
      assert(n == 5, s"expected 5 lines from socket, got $n")
      val lines = spark.table("sock_spec").collect().map(_.getString(0)).sorted.toSeq
      assert(lines == (1 to 5).map(i => s"line$i"))
    } finally q.stop()
  }

  test("Fetch.get crawls a live HTTP endpoint: bodies, retries, and surviving error rows") {
    import java.util.concurrent.ConcurrentHashMap
    import org.apache.spark.sql.functions.col
    val attempts = new ConcurrentHashMap[String, Integer]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        val n = attempts.merge(path, 1, (a, b) => a + b)
        path match {
          case p if p.startsWith("/doc/") =>
            val body = s"content-of-$p".getBytes("UTF-8")
            ex.sendResponseHeaders(200, body.length.toLong)
            ex.getResponseBody.write(body)
          case "/flaky" if n <= 2 => ex.sendResponseHeaders(503, -1) // transient: fails twice
          case "/flaky" =>
            val body = "finally".getBytes("UTF-8")
            ex.sendResponseHeaders(200, body.length.toLong)
            ex.getResponseBody.write(body)
          case _ => ex.sendResponseHeaders(404, -1)
        }
      } finally ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      import org.apache.spark.sql.functions.lit
      val sp = spark
      import sp.implicits._
      val urls = (1 to 20).map(i => (i.toLong, s"$base/doc/$i")) ++
        Seq((21L, s"$base/flaky"), (22L, s"$base/missing"),
          (23L, "http://127.0.0.1:1/closed-port")) // connection refused
      val out = graft.operators.Fetch.get(spark, urls.toDF("id", "url"), "id", "url",
        retries = 3).collect().map(r =>
          r.getLong(0) -> (r.getInt(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
      (1 to 20).foreach { i =>
        assert(out(i.toLong) == ((200, Some(s"content-of-/doc/$i"), None)), s"doc $i")
      }
      // transient 503s retried through to the 200 (server saw 3 attempts)
      assert(out(21L) == ((200, Some("finally"), None)), s"flaky: ${out(21L)}")
      assert(attempts.get("/flaky") == 3)
      // permanent 404: ONE attempt (no wasted retries), row survives with error
      assert(out(22L)._1 == 404 && out(22L)._3.exists(_.contains("404")))
      assert(attempts.get("/missing") == 1, s"404 must not retry, saw ${attempts.get("/missing")}")
      // connection-level failure: status 0, error populated, row survives
      assert(out(23L)._1 == 0 && out(23L)._3.nonEmpty)
      // politeness: 5 fetches at ≥100ms spacing in ONE partition
      // cannot complete in under ~400ms
      val t0 = System.nanoTime()
      graft.operators.Fetch.get(spark,
        (1 to 5).map(i => (i.toLong, s"$base/doc/p$i")).toDF("id", "url").coalesce(1),
        "id", "url", minIntervalMs = 100).count()
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms >= 400, f"politeness interval not honored: 5 fetches in $ms%.0f ms")
    } finally server.stop(0)
  }

  test("Fetch.get: 408/429 retry (Retry-After honored); retries respect the politeness interval") {
    import java.util.concurrent.ConcurrentHashMap
    val attempts = new ConcurrentHashMap[String, Integer]()
    val stamps = new ConcurrentHashMap[String, java.util.List[java.lang.Long]]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath
        val n = attempts.merge(path, 1, (a, b) => a + b)
        stamps.computeIfAbsent(path, _ =>
          java.util.Collections.synchronizedList(new java.util.ArrayList[java.lang.Long]()))
          .add(System.currentTimeMillis())
        def ok(): Unit = {
          val body = "ok".getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
        }
        path match {
          case "/limited" if n == 1 =>
            ex.getResponseHeaders.set("Retry-After", "1")
            ex.sendResponseHeaders(429, -1)
          case "/timeout408" if n == 1 => ex.sendResponseHeaders(408, -1)
          case "/failing" if n <= 2 => ex.sendResponseHeaders(503, -1)
          case _ => ok()
        }
      } finally ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val sp = spark
      import sp.implicits._
      def one(path: String, minIntervalMs: Long = 0L) =
        graft.operators.Fetch.get(spark, Seq((1L, s"$base$path")).toDF("id", "url"),
          "id", "url", retries = 3, minIntervalMs = minIntervalMs)
          .collect().map(r => (r.getInt(1), Option(r.getString(2)))).head
      // 429 is transient BY DEFINITION: retried through to the 200,
      // and the host's stated Retry-After (1 s) is respected
      val t0 = System.currentTimeMillis()
      assert(one("/limited") == ((200, Some("ok"))))
      assert(attempts.get("/limited") == 2, "429 must be retried")
      assert(System.currentTimeMillis() - t0 >= 1000,
        "Retry-After: 1 must delay the retry by at least a second")
      // 408 likewise
      assert(one("/timeout408") == ((200, Some("ok"))))
      assert(attempts.get("/timeout408") == 2, "408 must be retried")
      // retries count against the politeness clock: two 503s at
      // minIntervalMs=300 → attempt gaps must be >= ~300ms, not the
      // bare 50ms-per-attempt backoff (the host under the most stress
      // must never see the FASTEST request stream)
      assert(one("/failing", minIntervalMs = 300) == ((200, Some("ok"))))
      val ts = stamps.get("/failing")
      assert(ts.size() == 3)
      val gaps = (1 until ts.size()).map(i => ts.get(i) - ts.get(i - 1))
      assert(gaps.forall(_ >= 295), s"retry gaps $gaps must honor minIntervalMs=300")
    } finally server.stop(0)
  }

  test("netwrite sends rows over live TCP per partition; netcat round-trips request/response") {
    import scala.jdk.CollectionConverters._
    val received = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val server = new ServerSocket(0)
    val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        new Thread(() => {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
          val out = new PrintWriter(s.getOutputStream, true)
          Iterator.continually(in.readLine()).takeWhile(_ != null).foreach { l =>
            received.add(l); out.println(l.toUpperCase) // echo, uppercased
          }
          s.close()
        }).start()
      } catch { case _: Throwable => () } // server closed
    })
    acceptor.setDaemon(true); acceptor.start()
    try {
      val sp = spark
      import sp.implicits._
      val port = server.getLocalPort
      graft.sources.Sources.netwrite(
        (1 to 40).map(i => s"row$i").toDF("line").repartition(4), "127.0.0.1", port)
      val deadline = System.currentTimeMillis() + 10000
      while (received.size < 40 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(received.asScala.sorted == (1 to 40).map(i => s"row$i").sorted,
        s"server must receive every row, got ${received.size}")
      val resp = graft.sources.Sources.netcat(spark, Seq("ping", "pong"), "127.0.0.1", port)
        .collect().map(_.getString(0)).toSeq
      assert(resp == Seq("PING", "PONG"))
    } finally server.close()
  }

  test("checkpointed pipeline restarts without loss or duplication (exactly-once sink)") {
    val in = Files.createTempDirectory("graft_eo_in").toString
    val out = Files.createTempDirectory("graft_eo_out").toString + "/data"
    val cp = Files.createTempDirectory("graft_eo_cp").toString
    def runOnce(): Unit = {
      val q = EventFlow.fromText(spark, in).df
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.writeString(Paths.get(in, "p1.txt"), (1 to 100).map(i => s"r$i").mkString("", "\n", "\n"))
    runOnce()
    Files.writeString(Paths.get(in, "p2.txt"), (101 to 200).map(i => s"r$i").mkString("", "\n", "\n"))
    runOnce() // a NEW query resuming from the same checkpoint
    val got = spark.read.parquet(out)
    assert(got.count() == 200, "restart must process only the new file: no loss")
    assert(got.distinct().count() == 200, "and no duplication of the first batch")
  }

  test("text file-tail source picks up newly arriving files") {
    val dir = Files.createTempDirectory("graft_tail").toString
    Files.writeString(Paths.get(dir, "a.txt"), "a1\na2\na3\n")
    val q = EventFlow.fromText(spark, dir)
      .df.writeStream.format("memory").queryName("tail_spec")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_spec").count() == 3)
      Files.writeString(Paths.get(dir, "b.txt"), "b1\nb2\n")
      q.processAllAvailable()
      assert(spark.table("tail_spec").count() == 5,
        "new file must flow through the running stream")
    } finally q.stop()
  }
}
