package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Topic
import graft.streaming.Schedule

/** Scheduled incremental runs, topic fan-out, and real image decode:
  * the deva scheduler/pub-sub surface driven live against local dirs.
  */
class ScheduleTopicSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("Schedule.runOnce processes each arrival exactly once across invocations") {
    val src = tmp("sched_src")
    val out = tmp("sched_out") + "/out"
    val ckpt = tmp("sched_ckpt")
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val schema = ev.schema

    // tick 1: first file arrives
    ev.limit(100).write.mode("append").parquet(src)
    Schedule.runOnce(spark, src, schema, ckpt, out)(df =>
      df.withColumn("doubled", col("value") * 2))
    assert(spark.read.parquet(out).count() == 100)

    // tick 2: new data arrived between ticks → only IT is processed
    ev.limit(150).write.mode("append").parquet(src)
    Schedule.runOnce(spark, src, schema, ckpt, out)(df =>
      df.withColumn("doubled", col("value") * 2))
    assert(spark.read.parquet(out).count() == 250, "second tick must add exactly the new rows")

    // tick 3: nothing new → nothing added, no failure (a missed-cron
    // catch-up run is indistinguishable from an idle tick)
    Schedule.runOnce(spark, src, schema, ckpt, out)(df =>
      df.withColumn("doubled", col("value") * 2))
    assert(spark.read.parquet(out).count() == 250, "idle tick must be a no-op")
  }

  test("Topic: two subscribers each see the full topic; resume picks up only new publishes") {
    val root = tmp("topic_root")
    val topic = Topic(spark, root, "clicks")
    val ev = Tables.events(spark, dir).select("event_id", "event_type", "value")

    topic.publish(ev.limit(40))
    topic.publish(ev.limit(70))  // second batch appends

    // two independent subscribers (own checkpoints + sinks): both get
    // the complete topic — fan-out without a broker
    val outs = Seq("a", "b").map { who =>
      val out = tmp(s"topic_sub_$who") + "/out"
      val q = topic.subscribe(topic.schema)
        .where(col("value").isNotNull)
        .toParquet(out, tmp(s"topic_ck_$who"))
      q.awaitTermination()
      out
    }
    val counts = outs.map(o => spark.read.parquet(o).count())
    assert(counts == Seq(110, 110), s"both subscribers must see all 110 rows, got $counts")
    assert(topic.replay().count() == 110)
  }

  test("Topic: checkpointed subscriber resume delivers only the delta") {
    val root = tmp("topic_root2")
    val topic = Topic(spark, root, "t")
    val ev = Tables.events(spark, dir).select("event_id", "value")
    val out = tmp("topic_sub2") + "/out"
    val ckpt = tmp("topic_ck2")

    topic.publish(ev.limit(30))
    topic.subscribe(topic.schema).toParquet(out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 30)

    topic.publish(ev.limit(20))
    topic.subscribe(topic.schema).toParquet(out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 50,
      "resume must append exactly the 20 new rows — no loss, no dup")
  }

  test("Topic.trim drops oldest batches (maxlen retention), newest survive") {
    val sp = spark
    import sp.implicits._
    val topic = Topic(spark, tmp("trim_root"), "t")
    // three single-file batches in publish order
    topic.publish(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    topic.publish(Seq((2L, "b")).toDF("k", "v").coalesce(1))
    topic.publish(Seq((3L, "c")).toDF("k", "v").coalesce(1))
    assert(topic.replay().count() == 3)
    val removed = topic.trim(keepFiles = 2)
    assert(removed == 1, s"one oldest file should go, removed $removed")
    val left = topic.replay().select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(left == Seq(2L, 3L), s"oldest batch must be the one trimmed, got $left")
    // idempotent when already within budget
    assert(topic.trim(keepFiles = 2) == 0)
    // trim-to-zero empties the topic
    assert(topic.trim(keepFiles = 0) == 2)
  }

  test("Topic.trimSafe clamps retention at the laggiest subscriber's committed frontier") {
    val sp = spark
    import sp.implicits._
    val topic = Topic(spark, tmp("trimsafe_root"), "t")
    val ckA = tmp("trimsafe_ckA"); val outA = tmp("trimsafe_outA") + "/out"
    val ckB = tmp("trimsafe_ckB"); val outB = tmp("trimsafe_outB") + "/out"

    topic.publish(Seq((1L, "a")).toDF("k", "v").coalesce(1))
    // both subscribers commit batch 1
    topic.subscribe(topic.schema).toParquet(outA, ckA).awaitTermination()
    topic.subscribe(topic.schema).toParquet(outB, ckB).awaitTermination()
    // only A keeps up with batches 2 and 3
    topic.publish(Seq((2L, "b")).toDF("k", "v").coalesce(1))
    topic.publish(Seq((3L, "c")).toDF("k", "v").coalesce(1))
    topic.subscribe(topic.schema).toParquet(outA, ckA).awaitTermination()

    // trim-to-zero WANTS to drop all three files, but B has only
    // committed the first — the trim stops at B's frontier
    val removed = topic.trimSafe(keepFiles = 0, Seq(ckA, ckB))
    assert(removed == 1, s"must trim exactly A∩B's committed prefix, removed $removed")
    assert(topic.replay().select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))

    // B catches up over the surviving files — no missing-file error
    topic.subscribe(topic.schema).toParquet(outB, ckB).awaitTermination()
    assert(spark.read.parquet(outB).count() == 3)
    // now everything is committed everywhere: full trim proceeds
    assert(topic.trimSafe(keepFiles = 0, Seq(ckA, ckB)) == 2)
  }

  test("Topic.committedFileNames: JSON parsing (escaped chars, every source index) + loud format drift") {
    val root = Files.createTempDirectory("graft_topic_json").toString
    val t = Topic(spark, root, "tp")
    val cp = root + "/cp"
    def write(rel: String, body: String): Unit = {
      val f = new java.io.File(cp + "/" + rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
    }
    write("commits/0", "v1\n{}")
    // an entry whose path contains a JSON-escaped quote — the regex
    // parser this replaced truncated the name at the backslash
    write("sources/0/0", "v1\n" +
      s"""{"path":"file://$root/tp/a\\"b.parquet","timestamp":1,"batchId":0}""" + "\n")
    // a multi-source query puts the topic at an arbitrary source index;
    // files under a DIFFERENT directory must not count toward tp's set
    // — including a directory with the SAME leaf name under another
    // root (full-path matching, not name matching)
    write("sources/1/0", "v1\n" +
      """{"path":"file:///x/other/c.parquet","timestamp":1,"batchId":0}""" + "\n" +
      """{"path":"file:///elsewhere/tp/z.parquet","timestamp":1,"batchId":0}""" + "\n" +
      s"""{"path":"file://$root/tp/d.parquet","timestamp":1,"batchId":0}""" + "\n")
    // a source dir whose committed logs carry no "path" AT ALL is a
    // different source TYPE (an offset-based source sharing the
    // multi-source checkpoint) — skipped, NOT format drift; it must
    // not break trimming for the file sources next to it
    write("sources/2/0", "v1\n" + """{"logOffset":5}""" + "\n")
    assert(t.committedFileNames(cp) == Set("a\"b.parquet", "d.parquet"))
    // but INSIDE a dir that has identified itself as a file source, a
    // committed log whose entries yield zero paths is format drift:
    // silent under-parsing would stall retention forever → loud
    write("commits/1", "v1\n{}")
    write("sources/0/1", "v1\n" + """{"p":"x","batchId":1}""" + "\n")
    val e = intercept[IllegalStateException](t.committedFileNames(cp))
    assert(e.getMessage.contains("format has drifted"), e.getMessage)
  }

  test("Heartbeat: stale-worker detection over a topic beat log") {
    import graft.streaming.Heartbeat
    import graft.streaming.Heartbeat.Beat
    val topic = Topic(spark, tmp("hb_root"), "beats")
    // three fleet ticks: a beats every tick, b goes silent after t=0
    Heartbeat.beat(topic, Seq(Beat("a", 0, 0L), Beat("b", 0, 0L)))
    Heartbeat.beat(topic, Seq(Beat("a", 1, 1000L)))
    Heartbeat.beat(topic, Seq(Beat("a", 2, 2000L)))
    val live = Heartbeat.liveness(topic.replay(), asOfMs = 2500L, staleAfterMs = 1000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(live.keySet == Set("a", "b"))
    val a = live("a"); val b = live("b")
    assert(a.getLong(1) == 2000L && a.getLong(2) == 2 && a.getLong(3) == 3) // last beat/seq/count
    assert(a.getLong(4) == 500L && !a.getBoolean(5), "a beat recently, must be live")
    assert(b.getLong(1) == 0L && b.getLong(3) == 1)
    assert(b.getLong(4) == 2500L && b.getBoolean(5), "b went silent, must be stale")
    val stale = Heartbeat.staleWorkers(topic, asOfMs = 2500L, staleAfterMs = 1000L)
      .select("worker").collect().map(_.getString(0)).toSeq
    assert(stale == Seq("b"))
    // a later beat from b revives it — staleness is a function of the
    // log, not a sticky flag
    Heartbeat.beat(topic, Seq(Beat("b", 1, 2600L)))
    assert(Heartbeat.staleWorkers(topic, asOfMs = 3000L, staleAfterMs = 1000L).count() == 0)
    // a restarted worker resets its seq counter: last_seq must be the
    // seq OF the latest beat, not max(seq) over history (regression)
    Heartbeat.beat(topic, Seq(Beat("a", 0, 2900L)))
    val a2 = Heartbeat.liveness(topic.replay(), asOfMs = 3000L, staleAfterMs = 1000L)
      .filter(col("worker") === "a").collect().head
    assert(a2.getLong(1) == 2900L && a2.getLong(2) == 0L,
      s"restart: last_seq must come from the 2900ms beat, got ${a2.toSeq}")
  }

  test("Multimodal.decodeImages decodes real PNGs via javax.imageio") {
    val feats = Multimodal.decodeImages(Multimodal.pngCorpus(spark, 6, 32, 16))
      .collect().sortBy(_.media_id)
    assert(feats.length == 6)
    feats.foreach { f =>
      assert(f.width == 32 && f.height == 16 && f.n_pixels == 512)
      // gradient spans the full range → mean mid-ish, min < max
      assert(f.mean_lum > 0.2 && f.mean_lum < 0.8, s"mean ${f.mean_lum}")
      assert(f.min_lum < f.max_lum)
      assert(f.quadrant_lum.length == 4)
      // red grows rightward, green downward: quadrant means must be
      // ordered left<right and top<bottom
      assert(f.quadrant_lum(0) < f.quadrant_lum(1) && f.quadrant_lum(0) < f.quadrant_lum(2))
      assert(f.quadrant_lum(3) > f.quadrant_lum(1) && f.quadrant_lum(3) > f.quadrant_lum(2))
    }
    // deterministic: same corpus → identical features
    val again = Multimodal.decodeImages(Multimodal.pngCorpus(spark, 6, 32, 16))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.mean_lum).toSeq == again.map(_.mean_lum).toSeq)
  }

  test("Multimodal.phash: re-encodes collide, light noise stays near, distinct images far; banded pairs = brute force") {
    val corpus = Multimodal.phashCorpus(spark, nBase = 10, dupsPerBase = 2)
    val hashes = Multimodal.phashImages(corpus).collect().sortBy(_.media_id)
    assert(hashes.length == 30)
    val byId = hashes.map(h => h.media_id -> h.phash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // determinism: a second decode pass produces identical hashes
    val again = Multimodal.phashImages(corpus).collect().sortBy(_.media_id)
    assert(hashes.map(_.phash).toSeq == again.map(_.phash).toSeq)
    // planted near-dups land within the band threshold of their base
    for (base <- 0 until 10; v <- 1 to 2) {
      val d = ham(byId(base * 3L), byId(base * 3L + v))
      assert(d <= 3, s"dup $v of base $base drifted to hamming $d")
    }
    // structurally distinct bases stay far apart
    for (a <- 0 until 10; b <- (a + 1) until 10) {
      val d = ham(byId(a * 3L), byId(b * 3L))
      assert(d > 6, s"bases $a,$b unexpectedly close: hamming $d")
    }
    // the banded pipeline finds exactly the brute-force ≤3 pairs
    val got = Multimodal.nearDupImages(
      Multimodal.phashImages(corpus).toDF(), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      a <- hashes; b <- hashes if a.media_id < b.media_id
      d = ham(a.phash, b.phash) if d <= 3
    } yield (a.media_id, b.media_id, d)).toSet
    assert(got == want, s"banded ${got.size} vs brute ${want.size}")
    assert(want.size >= 20, s"expected the 20 planted pairs, found ${want.size}")
  }

  test("Multimodal.afingerprint: noise+gain stay near, distinct chords far; banded pairs = brute force") {
    val corpus = Multimodal.audioFpCorpus(spark, nBase = 8, dupsPerBase = 2)
    val hashes = Multimodal.fingerprintAudio(corpus).collect().sortBy(_.media_id)
    assert(hashes.length == 24)
    val byId = hashes.map(h => h.media_id -> h.afp).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (base <- 0 until 8; v <- 1 to 2) {
      val d = ham(byId(base * 3L), byId(base * 3L + v))
      assert(d <= 3, s"dup $v of base $base drifted to hamming $d")
    }
    for (a <- 0 until 8; b <- (a + 1) until 8) {
      val d = ham(byId(a * 3L), byId(b * 3L))
      assert(d > 6, s"bases $a,$b unexpectedly close: hamming $d")
    }
    val got = Multimodal.nearDupHashes(
      Multimodal.fingerprintAudio(corpus).toDF(), "afp", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      a <- hashes; b <- hashes if a.media_id < b.media_id
      d = ham(a.afp, b.afp) if d <= 3
    } yield (a.media_id, b.media_id, d)).toSet
    assert(got == want, s"banded ${got.size} vs brute ${want.size}")
    assert(want.size >= 16, s"expected the 16+ planted pairs, found ${want.size}")
  }

  test("IncrementalAgg: the maintained view equals a batch recompute after every tick, crash replays and compaction") {
    import spark.implicits._
    import graft.streaming.IncrementalAgg
    val src = tmp("incagg_src")
    val ckpt = tmp("incagg_ckpt")
    val view = tmp("incagg_view") + "/view"
    def events(rows: (String, Double)*) = rows.toSeq.toDF("k", "v")
    val schema = events().schema
    var all = Seq.empty[(String, Double)]
    def check(tag: String): Unit = {
      val got = IncrementalAgg.serve(spark, view, Seq("k")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSet
      val want = all.groupBy(_._1).map { case (k, vs) =>
        (k, vs.size.toLong,
          vs.map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      }.toSet
      assert(got == want, s"$tag: view $got vs batch recompute $want")
    }
    def arrive(tag: String, rows: (String, Double)*): Unit = {
      events(rows: _*).write.mode("append").parquet(src)
      all = all ++ rows
      IncrementalAgg.tick(spark, src, schema, ckpt, view, Seq("k"), "v")
      check(tag)
    }
    arrive("tick1", "a" -> 1.0, "a" -> 2.5, "b" -> 10.0)
    arrive("tick2", "a" -> 0.5, "c" -> 3.25)
    // crash replay: re-running a batch body with the SAME id must
    // converge, not double-add (the per-batch overwrite contract)
    IncrementalAgg.processBatch(
      events("a" -> 0.5, "c" -> 3.25), 1L, view, Seq("k"), "v")
    check("replay of batch 1")
    IncrementalAgg.compact(spark, view, Seq("k"))
    check("after compaction")
    // deltas were absorbed and dropped; the base alone serves
    val remaining = new java.io.File(s"$view/delta").listFiles()
    assert(remaining == null || !remaining.exists(_.getName.startsWith("batch=")),
      "compaction should drop absorbed deltas")
    arrive("tick3 after compaction", "b" -> 1.0, "d" -> 7.75)
    IncrementalAgg.compact(spark, view, Seq("k"))
    check("second compaction")
  }

  test("IncrementalDedup: ticks admit each distinct content exactly once, forever") {
    import spark.implicits._
    import graft.sources.KvStore
    import graft.streaming.IncrementalDedup
    val src = tmp("incdedup_src")
    val out = tmp("incdedup_out") + "/corpus"
    val ckpt = tmp("incdedup_ckpt")
    val store = new KvStore(spark, tmp("incdedup_store") + "/seen", Seq("nk"), "v")
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val schema = docs().schema

    // tick 1: two distinct docs → both admitted
    docs(1L -> "x y z", 2L -> "p q").write.mode("append").parquet(src)
    IncrementalDedup.tick(spark, src, schema, ckpt, out, store, "doc_id", "text")
    assert(spark.read.parquet(out).count() == 2)

    // tick 2: a cross-tick dup (tokens of doc 1, reordered — the
    // normalization must catch it), one fresh doc, and an in-tick dup
    // of that fresh doc → only the fresh doc's min id is admitted
    docs(3L -> "z y x", 4L -> "new stuff", 5L -> "new stuff")
      .write.mode("append").parquet(src)
    IncrementalDedup.tick(spark, src, schema, ckpt, out, store, "doc_id", "text")
    val ids = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"corpus must hold exactly first-seen docs, got $ids")

    // idle tick: nothing new → nothing written, store unchanged
    IncrementalDedup.tick(spark, src, schema, ckpt, out, store, "doc_id", "text")
    assert(spark.read.parquet(out).count() == 3)
    assert(store.get().count() == 3, "seen-key index holds one row per distinct content")

    // crash replay: re-running a batch body with ITS OWN batchId (as
    // the checkpoint would after a crash mid-tick) must converge to
    // the identical corpus and store — no duplicates, no data loss.
    // Batch 1 admitted doc 4; replay it twice more.
    val b1 = docs(3L -> "z y x", 4L -> "new stuff", 5L -> "new stuff")
    IncrementalDedup.processBatch(b1, 1L, out, store, "doc_id", "text")
    IncrementalDedup.processBatch(b1, 1L, out, store, "doc_id", "text")
    val after = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == Seq(1L, 2L, 4L), s"replays must be idempotent, got $after")
    assert(store.get().count() == 3)
  }

  test("IncrementalCrawl: ticks fetch each URL exactly once across ticks (live HTTP)") {
    import spark.implicits._
    import graft.sources.KvStore
    import graft.streaming.IncrementalCrawl
    import java.util.concurrent.ConcurrentHashMap
    val attempts = new ConcurrentHashMap[String, Integer]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val p = ex.getRequestURI.getPath
        attempts.merge(p, 1, (a, b) => a + b)
        val body = s"body-of-$p".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
      } finally ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val src = tmp("inccrawl_src")
      val out = tmp("inccrawl_out") + "/responses"
      val ckpt = tmp("inccrawl_ckpt")
      val store = new KvStore(spark, tmp("inccrawl_store") + "/fetched", Seq("url"), "v")
      def urls(rows: (Long, String)*) = rows.toSeq.toDF("id", "url")
      val schema = urls().schema
      def u(i: Int) = s"$base/u$i"

      // tick 1: five fresh URLs → all fetched once
      urls((1 to 5).map(i => (i.toLong, u(i))): _*).write.mode("append").parquet(src)
      IncrementalCrawl.tick(spark, src, schema, ckpt, out, store, "id", "url")
      assert(spark.read.parquet(out).count() == 5)
      (1 to 5).foreach(i => assert(attempts.get(s"/u$i") == 1))

      // tick 2: overlap (u3..u5 again, one of them twice in-tick) +
      // three fresh → ONLY the fresh three hit the network
      urls(Seq((13L, u(3)), (14L, u(4)), (15L, u(5)), (16L, u(6)),
        (26L, u(6)), (17L, u(7)), (18L, u(8))): _*).write.mode("append").parquet(src)
      IncrementalCrawl.tick(spark, src, schema, ckpt, out, store, "id", "url")
      assert(spark.read.parquet(out).count() == 8)
      (3 to 5).foreach(i => assert(attempts.get(s"/u$i") == 1, s"u$i must not refetch"))
      (6 to 8).foreach(i => assert(attempts.get(s"/u$i") == 1))
      assert(store.get().count() == 8, "fetched-URL index holds one row per URL")
      // in-tick dup fetched once under the min id
      assert(spark.read.parquet(out).filter(col("url") === u(6)).count() == 1)

      // crash replay of batch 1: refetches ITS OWN urls (at-least-once
      // against the network) but the corpus/store CONVERGE
      val b1 = urls(Seq((13L, u(3)), (16L, u(6)), (26L, u(6)), (17L, u(7)), (18L, u(8))): _*)
      IncrementalCrawl.processBatch(spark, b1, 1L, out, store, "id", "url", 3, 0L)
      assert(spark.read.parquet(out).count() == 8, "replay must not duplicate responses")
      assert(store.get().count() == 8)
      assert(attempts.get("/u3") == 1, "a url fetched by batch 0 stays excluded on replay")
      assert(attempts.get("/u6") == 2, "a replayed batch refetches its own urls")
    } finally server.stop(0)
  }
}
