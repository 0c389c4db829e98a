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
