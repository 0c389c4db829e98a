package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pairing

/** State lifecycle for the pairing harness (VERDICT r12 item 6): the
  * event-time expiry path in [[Pairing.runStream]] must (1) leave a
  * pairing's output bit-identical when keys never reappear after
  * their horizon, and (2) actually REMOVE quiet keys' state once the
  * watermark passes their deadline — at 100 TB, per-order state that
  * never expires is the difference between a bounded and an
  * unbounded state store.
  */
class PairingLifecycleSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  test("q224 gate entry (expiry ON since r14) is bit-identical to the never-expire variant") {
    val gate = graft.queries.StreamQueries
      .q224_stream_component_census(spark, dir).collect().toSeq
    val plain = graft.queries.StreamQueries
      .q224_without_expiry(spark, dir).collect().toSeq
    assert(gate.nonEmpty)
    assert(gate == plain,
      s"first diff: ${gate.zip(plain).find(p => p._1 != p._2)}")
  }

  test("the RocksDB opt-in path is parity-green (bigState family off-heap)") {
    // the default provider is on-heap (measured faster at any state
    // size this harness reaches — SCALE_r15.json); the RocksDB branch
    // is the documented opt-in for state that outgrows executor heap
    // and must not rot as dead code: run a bigState pairing under it
    // and assert bit-equality with the on-heap default's output.
    val heap = graft.queries.StreamQueries
      .q224_stream_component_census(spark, dir).collect().toSeq
    sys.props("graft.pairing.statestore") = "rocksdb"
    try {
      val rocks = graft.queries.StreamQueries
        .q224_stream_component_census(spark, dir).collect().toSeq
      assert(rocks.nonEmpty)
      assert(rocks == heap,
        s"first diff: ${rocks.zip(heap).find(p => p._1 != p._2)}")
    } finally sys.props.remove("graft.pairing.statestore")
  }

  test("q243 MV-maintained rollup is bit-identical to batch q33 (pairing #63)") {
    val batch = graft.queries.RelationalQueries.q33_rollup(spark, dir).collect().toSeq
    val mv = graft.queries.StreamQueries.q243_stream_mv_rollup(spark, dir).collect().toSeq
    assert(mv.nonEmpty)
    assert(mv == batch, s"first diff: ${mv.zip(batch).find(p => p._1 != p._2)}")
  }

  test("expiry actually fires: quiet keys are removed across micro-batches") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ttl_").toString
    // two files written in mtime order → two AvailableNow micro-batches
    // under maxFilesPerTrigger=1. Batch A's orders (evt = ok hours)
    // sit far below batch B's; with a small horizon, every batch-A
    // key's deadline is behind the watermark batch B runs under, so
    // its state must be removed there. Disjoint key sets keep the
    // output identical to the no-expiry semantics by construction.
    // distinct EXPLICIT mtimes pin the file→batch order (ADVICE r13:
    // a sleep-based gap is flaky under coarse filesystem timestamp
    // granularity or CI clock skew — set the timestamps directly)
    def write(name: String, okFrom: Int, okTo: Int, mtime: Long): Unit = {
      spark.range(okFrom, okTo)
        .select(col("id").as("ok"),
          (col("id") % 3 + 1).as("ln"),
          (col("id") * 7 % 50).as("m"))
        .coalesce(1).write.parquet(s"$tmp/$name")
      new java.io.File(s"$tmp/$name").listFiles
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => assert(f.setLastModified(mtime), s"setLastModified failed: $f"))
    }
    val t0 = System.currentTimeMillis()
    write("a", 1, 11, t0 - 60000L)
    write("b", 1000, 1011, t0)
    val files = new java.io.File(tmp).listFiles.flatMap(d =>
      d.listFiles.filter(_.getName.endsWith(".parquet"))).map(_.getAbsolutePath)
    val schema = spark.read.parquet(files.head).schema
    def run(horizon: Option[Long]): Seq[org.apache.spark.sql.Row] = {
      val base = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(tmp)
      val st = horizon.fold(base)(_ =>
          base.withColumn("evt", timestamp_millis(col("ok") * 3600000L))
            .withWatermark("evt", "0 milliseconds"))
        .as[Pairing.LiPair]
      Pairing.runStream[Pairing.LiPair, Long, (Long, Seq[Long]),
          (Long, Long, Seq[Long])](
        spark, st, Seq("o", "seq", "ms"), r => (r.ok, r.ln), horizon)(
        _.ok)((0L, Seq.empty[Long])) { (o, s0, ordered) =>
          val seen = s0._1 + ordered.size
          val ms = (s0._2 ++ ordered.map(_.m)).distinct.sorted
          ((seen, ms),
            if (ordered.isEmpty) Vector.empty else Vector((o, seen, ms)))
        } { t =>
          t.groupBy(col("o")).agg(max(struct(col("seq"), col("ms"))).as("b"))
            .select(col("o"), col("b.seq").as("seq"))
        }.orderBy(col("o")).collect().toSeq
    }
    val plain = run(None)
    val before = Pairing.expiredCount
    val ttl = run(Some(1000L))
    val fired = Pairing.expiredCount - before
    assert(ttl == plain, s"expiry changed output: $ttl vs $plain")
    assert(fired >= 10, s"expected batch A's 10 order states to expire, got $fired")
  }
}
