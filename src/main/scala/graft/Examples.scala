package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.Flow
import graft.operators.Multimodal
import graft.sources.{KvStore, Sources, Topic}
import graft.streaming.Schedule

/** Runnable tour of the library surface a reference (deva) user would
  * reach for — the README's examples, executable:
  *   sbt "runMain graft.Examples /root/testdata/sf0.001"
  * The full operator manual — every SURVEY §2 capability mapped to
  * its entry point, with API snippets — is OPERATORS.md.
  */
object Examples {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(cores = 4, shufflePartitions = 8)

    // deva:  source | filter(p) | map(f) | accumulate(add) | sink(print)
    val running = Flow(Tables.orders(spark, dir))
      .filter(col("o_totalprice") > 1000)
      .accumulate(Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")),
        sum(col("o_totalprice")), "running_spend")
      .head(3, Seq(col("running_spend").desc))
      .toDF
    println("== accumulate (running spend, top 3) ==")
    running.show(truncate = false)

    // deva:  clicks.combine_latest(purchases)  — keyed as-of pairing
    val ev = Tables.events(spark, dir)
    val asof = Flow(ev.select(col("event_id"), col("user_id"), col("ts")))
      .combineLatest(
        Flow(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value").as("pvalue"))),
        "user_id", "ts", "pts", Seq("pvalue"))
      .toDF
    println("== combine_latest (events with last purchase value) ==")
    asof.orderBy("event_id").show(3)

    // deva:  stream >> DB('table')  — keyed upsert store
    import spark.implicits._
    val kvPath = Files.createTempDirectory("graft_demo_kv").toString + "/t"
    val store = new KvStore(spark, kvPath, Seq("k"), "v")
    store.upsert(Seq(("a", 1L, "first"), ("b", 1L, "init")).toDF("k", "v", "payload"))
    store.upsert(Seq(("a", 2L, "updated")).toDF("k", "v", "payload"))
    println("== KvStore (DBStream analogue, last-write-wins) ==")
    store.get().orderBy("k").show()

    // deva:  pub('topic') / sub('topic')  — file-backed fan-out
    val topic = Topic(spark, Files.createTempDirectory("graft_demo_topic").toString, "signups")
    topic.publish(ev.filter(col("event_type") === "signup").limit(50))
    println(s"== Topic pub/sub: replay sees ${topic.replay().count()} events ==")

    // deva:  scheduler: every tick, process only what's new
    val schedSrc = Files.createTempDirectory("graft_demo_sched").toString
    val schedOut = Files.createTempDirectory("graft_demo_schedout").toString + "/out"
    val schedCp = Files.createTempDirectory("graft_demo_schedcp").toString
    val evs = ev.select("event_id", "user_id", "value")
    evs.limit(20).write.mode("append").parquet(schedSrc)
    Schedule.runOnce(spark, schedSrc, evs.schema, schedCp, schedOut)(df => df)
    evs.limit(30).write.mode("append").parquet(schedSrc)
    Schedule.runOnce(spark, schedSrc, evs.schema, schedCp, schedOut)(df => df)
    println(s"== Schedule (2 ticks, exactly-once): ${spark.read.parquet(schedOut).count()} rows ==")

    // incremental ingestion: every tick admits only first-seen
    // content, checked against the persistent seen-key index
    val incSrc = Files.createTempDirectory("graft_demo_inc").toString
    val incOut = Files.createTempDirectory("graft_demo_incout").toString + "/corpus"
    val incCp = Files.createTempDirectory("graft_demo_inccp").toString
    val seen = new KvStore(spark, Files.createTempDirectory("graft_demo_seen").toString + "/seen", Seq("nk"), "v")
    val d1 = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    d1.write.mode("append").parquet(incSrc)
    graft.streaming.IncrementalDedup.tick(spark, incSrc, d1.schema, incCp, incOut, seen, "doc_id", "text")
    Seq((3L, "beta alpha"), (4L, "delta")).toDF("doc_id", "text")
      .write.mode("append").parquet(incSrc)
    graft.streaming.IncrementalDedup.tick(spark, incSrc, d1.schema, incCp, incOut, seen, "doc_id", "text")
    println(s"== IncrementalDedup (4 docs in, dups dropped): ${spark.read.parquet(incOut).count()} admitted ==")

    // deva:  NS('name') / NT('name')  — named objects shared by name
    val ns = new graft.api.Namespace(spark, Files.createTempDirectory("graft_demo_ns").toString)
    ns.flow("signups")(ev.filter(col("event_type") === "signup"))
    println(s"== Namespace: NS('signups') resolves to ${ns.get("signups").toDF.count()} events ==")

    // deva:  GPT.sync_query(batch)  — executor-side batched annotation
    // (transport stubbed: zero egress; plumbing is the real part)
    val annotated = graft.operators.Inference.annotate(
      spark, Tables.documents(spark, dir).limit(40), "doc_id", "text", 16)(
      prompts => prompts.map(p => s"${p.split(' ').length} tokens"))
    println(s"== Inference.annotate: ${annotated.count()} docs annotated in executor-side batches ==")

    // deva:  traverse  — recursive flatten to atoms
    val nested = Seq((1L, Seq(Seq(1, 2), Seq(3)))).toDF("id", "nst")
    println(s"== traverse: ${Flow(nested).traverse("nst", "v").toDF.count()} atoms ==")

    // multimodal: REAL image decode (javax.imageio) + a-v stub
    val imgFeats = Multimodal.decodeImages(Multimodal.pngCorpus(spark, 4, 32, 16))
    println("== multimodal real PNG decode ==")
    imgFeats.toDF().select("media_id", "width", "height", "mean_lum").orderBy("media_id").show(truncate = false)
    val wav = Multimodal.decodeAudio(Multimodal.wavCorpus(spark, 4))
    println("== multimodal real WAV decode ==")
    wav.toDF().select("media_id", "sample_rate", "duration_ms", "rms").orderBy("media_id").show(truncate = false)
    val vid = Multimodal.decodeVideo(Multimodal.aviCorpus(spark, 2, 48, 32, nFrames = 8), sample = 4)
    println("== multimodal real MJPEG-AVI decode (frame sampling + motion) ==")
    vid.toDF().select("media_id", "n_frames", "fps", "motion").orderBy("media_id").show(truncate = false)
    val feats = Multimodal.decodeStub(Multimodal.fakeCorpus(spark, 4, "video"))
    println("== multimodal stub decode (inter-coded video — the remaining stub) ==")
    feats.toDF().select("media_id", "kind", "n_bytes", "checksum").orderBy("media_id").show(truncate = false)

    // text source round-trip
    val tmp = Files.createTempDirectory("graft_demo_txt").toString
    Sources.toTextFile(Tables.nation(spark, dir).select(col("n_name")), tmp + "/nations")
    println(s"== to_textfile/from_textfile round-trip: ${Sources.textFile(spark, tmp + "/nations").count()} lines ==")

    // deva:  IndexStream  — build the index once, update it with new
    // docs, serve queries from it (no per-query corpus scan)
    import graft.operators.SearchIndex
    val idx = SearchIndex.open(spark, Files.createTempDirectory("graft_demo_idx").toString + "/postings")
    SearchIndex.index(idx, Tables.documents(spark, dir), "doc_id", "text")
    println("== SearchIndex.search('table','query') from the persisted index ==")
    SearchIndex.search(spark, idx, Seq("table", "query"), 3).show(truncate = false)

    // deva:  add_job(trigger='cron', hour=9)  — catch-up-exact ticks
    val cronState = Files.createTempDirectory("graft_demo_cron").toString + "/job.last"
    val hourly = graft.streaming.CronExpr.parse("0 * * * *")
    graft.streaming.Cron.runDue(cronState, hourly, java.time.Instant.parse("2026-08-12T09:30:00Z"))(_ => ())
    val n = graft.streaming.Cron.runDue(cronState, hourly,
      java.time.Instant.parse("2026-08-12T12:45:00Z"))(t => println(s"   cron tick $t"))
    println(s"== Cron: 3h15m unobserved → $n missed hourly ticks caught up exactly once ==")

    // deva:  when(cond).then(callback)  — condition-triggered action
    val trigSrc = Files.createTempDirectory("graft_demo_trig").toString
    val trigCp = Files.createTempDirectory("graft_demo_trigcp").toString
    val big = ev.select("event_id", "value")
    big.limit(200).write.mode("append").parquet(trigSrc)
    graft.streaming.Triggers.when(
        graft.streaming.EventFlow.fromParquet(spark, trigSrc, big.schema), col("value") > 90)
      .thenRun(trigCp) { (hits, id) =>
        println(s"   trigger fired on batch $id: ${hits.count()} rows over threshold")
      }.awaitTermination()

    // PII scrub: redaction as a pure column expression
    println("== scrubPii ==")
    Seq(("mail bob.smith@example.org now, acct 12345678"))
      .toDF("text").select(graft.operators.TextAnalysis.scrubPii(col("text")).as("scrubbed"))
      .show(truncate = false)

    // persisted IVF vector index: sampled Lloyd training, cell-bucketed
    // store, probe-pruned serving
    import graft.operators.VectorIndex
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = VectorIndex.train(spark, vecs, k = 4, iters = 2)
    val vidx = VectorIndex.open(spark, Files.createTempDirectory("graft_demo_vidx").toString + "/cells")
    VectorIndex.index(vidx, vecs, cents)
    println("== VectorIndex.query (2 probes, nprobe=2, top-3 from cell buckets) ==")
    VectorIndex.query(spark, vidx, cents,
      vecs.limit(2).select(col("vec_id").as("probe_id"), col("embedding").as("pemb")),
      nprobe = 2, k = 3).show(truncate = false)

    // bus heartbeat: fleet beats on a topic, stale workers on a tick
    import graft.streaming.Heartbeat
    val hbTopic = Topic(spark, Files.createTempDirectory("graft_demo_hb").toString, "beats")
    Heartbeat.beat(hbTopic, Seq(Heartbeat.Beat("worker-a", 0, 0L), Heartbeat.Beat("worker-b", 0, 0L)))
    Heartbeat.beat(hbTopic, Seq(Heartbeat.Beat("worker-a", 1, 60000L)))
    println("== Heartbeat.staleWorkers (b silent for 90s, threshold 45s) ==")
    Heartbeat.staleWorkers(hbTopic, asOfMs = 90000L, staleAfterMs = 45000L).show(truncate = false)

    // distributed arrival index (deva zip/partition at scale): range-
    // partitioned two-pass rank — no single-task window
    println("== Sequence.globalRowNumber (first 5 events by arrival) ==")
    graft.operators.Sequence.globalRowNumber(
      Tables.events(spark, dir).select(col("ts"), col("event_id")),
      Seq(col("ts"), col("event_id")), "idx")
      .orderBy(col("idx")).limit(5).show(truncate = false)

    // one-pass sliding-window hashes (substring-dedup kernel) + the
    // compression-ratio repetition signal, both codegen'd expressions
    println("== rolling-hash windows + deflate ratio (first 3 docs) ==")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.plans.RollingWindowHash(
          split(col("text"), " "), 50)).as("n_windows"),
        (graft.plans.DeflateSize(col("text")).cast("double") /
          octet_length(col("text"))).as("deflate_ratio"))
      .orderBy(col("doc_id")).limit(3).show(truncate = false)

    // domain quality prior: full PageRank over a derived graph (q97
    // is the one-step kernel; here the operator iterates to the
    // stationary vector)
    println("== PageRank.run (customer-supplier graph, top 5 by rank) ==")
    val prEdges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    graft.operators.PageRank.run(prEdges, "a", "b", tol = 1e-6)
      .orderBy(col("pr").desc).limit(5).show(truncate = false)
    spark.catalog.clearCache()

    // curation yield report: where did each source's documents go?
    println("== curation funnel (first-drop attribution, one source) ==")
    SparkEntry.queries("q99_funnel")(spark, dir)
      .limit(8).show(truncate = false)

    // the event-analytics views a monitoring pipeline serves: strict
    // conversion funnel, cohort retention, behavioral transitions
    println("== funnel stages (first 5 users) ==")
    SparkEntry.queries("q111_funnel_steps")(spark, dir).limit(5).show(truncate = false)
    println("== transition matrix P(next | current) ==")
    SparkEntry.queries("q113_transition_matrix")(spark, dir).limit(8).show(truncate = false)

    // rolling detector: batch window and stateful stream produce
    // bit-identical flags (q108 ≡ q110, spec-asserted)
    println("== rolling anomaly (first flagged events) ==")
    SparkEntry.queries("q108_rolling_anomaly")(spark, dir)
      .filter(col("is_anomaly")).limit(5).show(truncate = false)

    // graph motifs on ANY edge frame: build a support-thresholded
    // co-occurrence graph, enumerate its triangles (each exactly once)
    println("== Triangles over the supplier co-occurrence graph ==")
    val coEdges = graft.operators.Triangles.cooccurrenceEdges(
      Tables.lineitem(spark, dir).select(col("l_orderkey").as("g"), col("l_suppkey").as("m")),
      "g", "m", minSupport = 5)
    graft.operators.Triangles.triangles(coEdges).limit(5).show()

    // pipe conveniences: append a literal row, locate an element
    println("== Flow.append + Flow.indexOf ==")
    val regions = graft.api.Flow(Tables.region(spark, dir).select(col("r_regionkey"), col("r_name")))
    regions.append("r_regionkey" -> 99L, "r_name" -> "ATLANTIS")
      .toDF.orderBy(col("r_regionkey").desc).limit(3).show(truncate = false)
    regions.indexOf(col("r_name") === "ASIA", Seq(col("r_name"))).toDF.show()

    // CDC both ways: full SCD2 history (q125) vs latest snapshot (q121)
    println("== SCD2 history: one key's validity intervals ==")
    SparkEntry.queries("q125_scd2")(spark, dir)
      .filter(col("user_id") === 1 && col("event_type") === "click")
      .limit(5).show(truncate = false)

    // time-series smoothing, exact cross-engine (dyadic weights)
    println("== EWMA (first rows of one user) ==")
    SparkEntry.queries("q126_ewma")(spark, dir)
      .filter(col("user_id") === 1).limit(5).show(truncate = false)

    // exact similarity join: provable recall (vs LSH's probabilistic)
    println("== prefix-filter exact Jaccard pairs ==")
    SparkEntry.queries("q127_prefix_join")(spark, dir).limit(5).show()

    // multi-dimension layout: Z-order keys give every bucket a tight
    // bbox on BOTH dimensions — the zone-map pruning story
    println("== Z-order bucket zone maps ==")
    SparkEntry.queries("q128_zorder")(spark, dir).limit(5).show()

    // image near-dup: perceptual hash + banded Hamming pairs
    println("== image pHash near-dups (planted corpus) ==")
    val imgs = graft.operators.Multimodal.phashCorpus(spark, nBase = 4, dupsPerBase = 1)
    graft.operators.Multimodal.nearDupImages(
      graft.operators.Multimodal.phashImages(imgs).toDF()).show()

    spark.stop()
  }
}
