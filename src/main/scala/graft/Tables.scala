package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test star schema (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor; at cluster
  * scale these would be partitioned directories — the loader is the
  * only place that would change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Footer-read schema memo, keyed by (dir, table) — r16: every
    * loader call re-inferred the schema from the parquet footer
    * (~10–100 ms of driver-side I/O per call), and a 283-query gate
    * pass builds each table's frame hundreds of times. The schema of
    * a given path is immutable metadata for the life of the process
    * (the gate's corpus dirs never change underneath it; test copies
    * land in fresh temp dirs), so one probe per (dir, table) serves
    * every subsequent read via `spark.read.schema(...)` — which skips
    * inference entirely. Metadata only: no rows, plans or results are
    * memoized.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else {
      val path = s"$dir/$name.parquet"
      val s = schemaMemo.computeIfAbsent((dir, name),
        _ => spark.read.parquet(path).schema)
      spark.read.schema(s).parquet(path)
    }

  /** events.ts has shipped in three physical forms across driver
    * generations: TIMESTAMP(NANOS) (read nanos-as-long and truncate to
    * microseconds — exactly what DuckDB's microsecond timestamps do on
    * read), plain timestamp[us] without timezone (Spark reads it as
    * TIMESTAMP_NTZ; cast to TIMESTAMP — value-preserving under the
    * session's pinned UTC, and it matches DuckDB's naive read of the
    * same file), and Spark-written LTZ copies (no conversion). All
    * three normalize to TimestampType here so every downstream query
    * sees one ts type.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // schema memo: see [[schemaMemo]] — the nanosAsLong conf is set
    // before the first (probing) read, so the memoized schema is the
    // same one every per-call inference produced
    val path = s"$dir/events.parquet"
    val schema = schemaMemo.computeIfAbsent((dir, "events"),
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = eventsRaw(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
