package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured-Streaming port of the reference's `Stream` node graph
  * (deva/core/core.py:391): a fluent flow of transforms over an
  * unbounded DataFrame.
  *
  * Mapping (SURVEY §2.1/§2.7):
  *  - `map`/`starmap`      → [[select]] (codegen'd column exprs)
  *  - `filter`             → [[where]]
  *  - `timed_window`       → [[timedWindow]] (tumbling event-time agg)
  *  - sliding variant      → [[slidingWindow]]
  *  - session gap grouping → [[sessionWindow]] (beyond the reference)
  *  - `unique`             → [[unique]] / [[uniqueWithinWatermark]]
  *  - `union`              → [[union]]
  *  - `accumulate`/`scan`  → Stateful.scanPerKey (flatMapGroupsWithState)
  *  - `delay` (lateness)   → [[withWatermark]]
  *  - `rate_limit`/`buffer`→ trigger cadence on the sink ([[start]])
  *  - `sink`/`to_textfile` → [[toMemory]] / [[toParquet]] / [[foreachBatchSink]]
  *
  * deva pushes one Python object at a time through callbacks on an
  * event loop; EventFlow declares the same dataflow and lets Spark
  * run it incrementally with partial aggregation, state stores and
  * watermark-bounded state — the form that survives 100 TB/day.
  */
final case class EventFlow(df: DataFrame) {

  def select(cols: Column*): EventFlow = EventFlow(df.select(cols: _*))

  /** Graphviz DOT of the streaming topology (deva graph.py:358
    * parity); callable before start() — the analyzed plan is the
    * dataflow graph.
    */
  def toDot(title: String = "stream"): String = graft.tools.PlanDot.dot(df, title)

  def where(cond: Column): EventFlow = EventFlow(df.where(cond))

  /** Bound lateness/state: deva `delay` + state-expiry analogue. */
  def withWatermark(tsCol: String, delay: String): EventFlow =
    EventFlow(df.withWatermark(tsCol, delay))

  /** Tumbling event-time window aggregation (deva timed_window). */
  def timedWindow(tsCol: String, duration: String, keys: Seq[Column], aggs: Seq[Column]): EventFlow =
    EventFlow(
      df.groupBy(window(col(tsCol), duration) +: keys: _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Sliding event-time window aggregation. */
  def slidingWindow(tsCol: String, duration: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): EventFlow =
    EventFlow(
      df.groupBy(window(col(tsCol), duration, slide) +: keys: _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Session windows by inactivity gap (no deva equivalent — a
    * streaming capability the Spark engine adds for free).
    */
  def sessionWindow(tsCol: String, gap: String, keys: Seq[Column], aggs: Seq[Column]): EventFlow =
    EventFlow(
      df.groupBy(session_window(col(tsCol), gap) +: keys: _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Drop duplicate events by key (deva unique, unbounded history). */
  def unique(cols: Seq[String]): EventFlow = EventFlow(df.dropDuplicates(cols))

  /** Dedup with bounded state — requires a watermark upstream. */
  def uniqueWithinWatermark(cols: Seq[String]): EventFlow =
    EventFlow(df.dropDuplicatesWithinWatermark(cols))

  def union(other: EventFlow): EventFlow = EventFlow(df.unionByName(other.df))

  /** Stream-stream interval join (the keyed, bounded-time pairing
    * that replaces deva's zip/combine_latest at scale).
    */
  def intervalJoin(other: EventFlow, cond: Column, joinType: String = "inner"): EventFlow =
    EventFlow(df.join(other.df, cond, joinType))

  // ---- sinks -------------------------------------------------------

  /** Memory-sink drain: run to completion, then return the sink's
    * rows as an EAGER local checkpoint and RELEASE the sink itself —
    * drop the temp view and clear the terminated-query registry, the
    * two strong references that otherwise pin every sink's rows on
    * the heap for the life of the process. Found in the r15 bench:
    * 283 queries × reps of never-dropped sinks (some order- or
    * edge-sized) accumulate into GC pressure that inflates the
    * late-alphabet pairings 3–6× in-process while their isolated
    * medians sit at their floors. Callers get a frame whose plan is a
    * LogicalRDD — independent of the view name, safe to use lazily.
    */
  def toMemory(spark: SparkSession, name: String, outputMode: String): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    EventFlow.drainMemorySink(spark, name)
  }

  /** Streaming parquet sink (deva to_textfile/Sink analogue). */
  def toParquet(path: String, checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Arbitrary per-batch action (deva sink(func) analogue); also the
    * hook for the KV upsert store (graft.sources.KvStore).
    */
  def foreachBatchSink(checkpoint: String, trigger: Trigger)(f: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch(f)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Generic start with a configured writer tweak — rate limiting
    * (deva rate_limit/buffer) is the trigger cadence here.
    */
  def start(configure: DataStreamWriter[Row] => DataStreamWriter[Row]): StreamingQuery =
    configure(df.writeStream).start()
}

object EventFlow {

  /** Read a completed memory sink once and RELEASE it: eager local
    * checkpoint of its rows, then drop the temp view — the reference
    * that otherwise pins the sink (and everything it emitted) on the
    * heap for the process lifetime (terminated queries themselves are
    * already unregistered by Spark's unregisterTerminatedStream; the
    * view drop + checkpoint do the actual release — ADVICE r15).
    * Shared by [[EventFlow.toMemory]], Pairing.run/runStream, and the
    * queries that start their memory sinks directly. The returned
    * frame's plan is a LogicalRDD — independent of the view name,
    * safe to use lazily after the drop.
    */
  def drainMemorySink(spark: SparkSession, name: String): DataFrame = {
    val out = spark.table(name).localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** File-source flow over a parquet path (deva from_textfile's
    * tail-a-growing-source analogue; new files become new events).
    */
  def fromParquet(spark: SparkSession, path: String, schema: StructType): EventFlow =
    EventFlow(spark.readStream.schema(schema).parquet(path))

  private val eventsSchemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Boolean, org.apache.spark.sql.types.StructType)]()

  /** The test-data events table as a stream, nanos handled as in
    * [[graft.Tables.events]].
    */
  def fromEvents(spark: SparkSession, dir: String): EventFlow = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the driver's testdata ships events.parquet as a single FILE;
    // Spark-written copies (scale smoke, production) are a DIRECTORY
    // of part files. pathGlobFilter matches leaf file names only, so
    // pick the read shape by what's actually on disk.
    // (isDir, schema) memoized per dir — r16: the footer probe +
    // layout stat is immutable path metadata re-read by every events
    // pairing in a gate pass (~0.1 s each, StreamProf). Metadata
    // only, same doctrine as Tables.schemaMemo. Three layouts: single
    // file (driver testdata), directory of part files (Spark-written
    // copies), or no literal child at all (date-partitioned trees —
    // the glob-filter branch handles that one, as before). The
    // driver's events.parquet stores nanos-as-long ts, derived copies
    // store real timestamps — nanosAsLong is set before the first
    // (probing) read, so the memoized schema matches per-call
    // inference.
    val (isDir, schema) = eventsSchemaMemo.computeIfAbsent(dir, { _ =>
      val evPath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
      val fs = evPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val d = fs.exists(evPath) && fs.getFileStatus(evPath).isDirectory
      val s =
        if (d) spark.read.parquet(evPath.toString).schema
        else spark.read.option("pathGlobFilter", "events.parquet").parquet(dir).schema
      (d, s)
    })
    // file stream sources need a directory: a dir-shaped table IS one;
    // the single-file form scopes the parent dir by glob filter
    val st =
      if (isDir) spark.readStream.schema(schema).parquet(s"$dir/events.parquet")
      else spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
    EventFlow(schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        st.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] without tz — cast to TIMESTAMP, value-preserving
        // under the session's pinned UTC (same rule as Tables.events)
        st.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => st
    })
  }

  /** Text-file tail source (deva from_textfile, sources.py:199). */
  def fromText(spark: SparkSession, dir: String): EventFlow =
    EventFlow(spark.readStream.text(dir))

  /** Synthetic periodic source (deva from_periodic, sources.py:1419). */
  def fromRate(spark: SparkSession, rowsPerSecond: Int): EventFlow =
    EventFlow(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load())

  /** Socket text source (deva from_tcp_port, sources.py:341). */
  def fromSocket(spark: SparkSession, host: String, port: Int): EventFlow =
    EventFlow(spark.readStream.format("socket")
      .option("host", host).option("port", port.toString).load())

  /** Kafka topic source config (deva from_kafka, sources.py:682).
    * Returns the configured reader — no broker in this container.
    */
  def kafkaReader(spark: SparkSession, servers: String, topics: String) =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics)
}
