package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Two-JVM Topic fan-out under `kill -9` (VERDICT r14 stretch 7).
  *
  * ScheduleTopicSpec proves the pub/sub/trim contracts inside one
  * JVM; this spec closes the remaining credibility gap for the 🔶
  * IPC rows (SURVEY §2 rows 27/28c/64) by actually forking the
  * processes a deployment runs: a PUBLISHER JVM appending batches to
  * the topic directory and a SUBSCRIBER JVM tailing it into a
  * parquet sink — then `kill -9`ing the subscriber mid-stream,
  * restarting it on the same checkpoint, and asserting EXACTLY-ONCE
  * delivery of the full published set.
  *
  * Why the assertion is airtight: the file-stream source logs each
  * batch's files in the checkpoint BEFORE processing and marks a
  * commit AFTER the sink's transactional rename; a kill between the
  * two leaves an offsets entry without a commit marker, which the
  * restart reprocesses against the SAME file list. The parquet sink
  * registers output files in _spark_metadata only at commit, so any
  * part files the killed attempt left behind are invisible orphans
  * to a metadata-log read. Reading outDir with Spark therefore
  * yields each published row exactly once — which is what the final
  * multiset comparison checks, row for row.
  */
class TopicIpcSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 2, shufflePartitions = 2)

  private val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString

  /** Fork a TopicIpc role in a fresh JVM: same classpath as this
    * (already-forked) test JVM, plus the JDK-17 --add-opens set Spark
    * needs (inherited from THIS JVM's runtime args — the one place
    * they're guaranteed present and current).
    */
  private def fork(logName: String, roleArgs: Seq[String]): Process = {
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .sliding(2).collect { case Seq("--add-opens", v) => Seq("--add-opens", v) }
      .toSeq.flatten
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.tools.TopicIpc") ++ roleArgs
    val log = Files.createTempFile(s"topic_ipc_$logName", ".log").toFile
    new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(true)
      .start()
  }

  /** Rows committed to the subscriber's sink so far — a metadata-log
    * read, so uncommitted orphans never count. 0 until the first
    * commit (no _spark_metadata yet).
    */
  private def committedCount(outDir: String): Long =
    if (!Files.exists(Paths.get(outDir, "_spark_metadata"))) 0L
    else
      try spark.read.parquet(outDir).count()
      catch { case _: Throwable => 0L }

  private def awaitExit(p: Process, what: String, timeoutSec: Long = 180): Int = {
    assert(p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS),
      s"$what did not exit within ${timeoutSec}s")
    p.exitValue()
  }

  test("publisher JVM + subscriber JVM: kill -9 mid-stream, restart, exactly-once") {
    val root = Files.createTempDirectory("topic_ipc").toString
    val outDir = s"$root/sub_out"
    val ckpt = s"$root/sub_ckpt"
    Files.createDirectories(Paths.get(s"$root/ipc")) // subscriber may start first

    val batches = 10
    val rows = 200
    val gateFile = Paths.get(root, "publish_gate")
    // the publisher BLOCKS after 4 batches until the spec's gate file
    // appears — created only AFTER the kill — so "the subscriber died
    // while the topic was still growing" is guaranteed by ordering,
    // not by a race against two JVMs' boot times (the first draft
    // raced and flaked under suite contention)
    val publisher = fork("pub", Seq("publisher", root, "ipc",
      batches.toString, rows.toString, "50", "4", gateFile.toString))
    val sub1 = fork("sub1", Seq("subscribe", root, "ipc", outDir, ckpt))

    // wait for the subscriber to have COMMITTED at least one batch —
    // the kill must land on a subscriber with real checkpoint state,
    // not one still booting its session
    val deadline = System.nanoTime() + 150L * 1000 * 1000 * 1000
    while (committedCount(outDir) == 0L && System.nanoTime() < deadline)
      Thread.sleep(500)
    val beforeKill = committedCount(outDir)
    assert(beforeKill > 0L, "subscriber never committed a batch before the kill window")

    sub1.destroyForcibly() // SIGKILL — no shutdown hooks, no cleanup
    sub1.waitFor()

    // open the gate: batches 4..9 publish only now, with the
    // subscriber dead — the restart has a guaranteed backlog
    Files.createFile(gateFile)
    assert(awaitExit(publisher, "publisher") == 0, "publisher JVM failed")
    val published = batches.toLong * rows
    val afterKill = committedCount(outDir)
    assert(afterKill < published,
      s"kill left nothing to recover ($afterKill of $published already committed)")

    // restart on the SAME checkpoint in drain mode: recover + catch up + exit
    val sub2 = fork("sub2", Seq("drain", root, "ipc", outDir, ckpt))
    assert(awaitExit(sub2, "drain subscriber") == 0, "drain subscriber JVM failed")

    // exactly-once, row for row: the committed sink equals the
    // enumerable published multiset — no loss (kill recovery), no
    // dups (offsets-without-commit reprocessed once, orphans invisible)
    val got = spark.read.parquet(outDir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = (0 until batches).flatMap(b =>
      (0 until rows).map(j => b.toLong * 1000000L + j)).sorted
    assert(got.length == want.length,
      s"expected ${want.length} rows exactly once, got ${got.length}")
    assert(got == want, "committed sink diverges from the published multiset")
  }

  /** The PUBLISHER side of the same contract: Topic.publish stages a
    * batch in a dot-prefixed dir and renames part files in only after
    * the write commits, so a publisher killed -9 MID-PUBLISH must
    * never leave a partial batch visible. Each published batch is one
    * part file here (coalesce(1)), so the per-FILE atomicity the
    * docstring promises becomes per-BATCH: after the kill, every
    * batch id present in the topic carries EXACTLY rowsPerBatch rows
    * — all-or-nothing, no torn batch. Leftover .stage_* dirs are the
    * documented crash residue (invisible to readers, GC-able).
    */
  test("publisher killed -9 mid-publish never exposes a partial batch") {
    val root = Files.createTempDirectory("topic_ipc_pub").toString
    Files.createDirectories(Paths.get(s"$root/atomic"))

    val rows = 5000 // big enough that a write is killable mid-flight
    val publisher = fork("pubkill", Seq("publisher", root, "atomic",
      "200", rows.toString, "0"))
    // let a few batches land, then SIGKILL whenever the loop happens
    // to be — staging, writing, or renaming
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    def topicFiles(): Int = {
      // close the directory stream per poll (ADVICE r15: the unclosed
      // Files.list leaked a handle every 50 ms for up to 120 s)
      val s = Files.list(Paths.get(s"$root/atomic"))
      try s.iterator.asScala.count { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
      } finally s.close()
    }
    def staging(): Boolean = {
      val s = Files.list(Paths.get(s"$root/atomic"))
      try s.iterator.asScala.exists(
        _.getFileName.toString.startsWith(".stage_"))
      finally s.close()
    }
    while (topicFiles() < 3 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(topicFiles() >= 3, "publisher never landed its first batches")
    // land the kill while a .stage_* dir provably exists (ADVICE r15:
    // an unconditioned kill only probabilistically hit mid-publish),
    // falling back to an unconditioned kill at the deadline — the
    // atomicity assertion below holds either way.
    while (!staging() && publisher.isAlive && System.nanoTime() < deadline)
      Thread.sleep(1)
    publisher.destroyForcibly()
    publisher.waitFor()

    val byBatch = spark.read.parquet(s"$root/atomic")
      .groupBy("batch").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(byBatch.nonEmpty)
    val torn = byBatch.filter(_._2 != rows.toLong)
    assert(torn.isEmpty,
      s"partial batches visible after publisher kill: ${torn.mkString(", ")}")
  }
}
