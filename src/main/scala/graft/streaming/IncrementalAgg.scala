package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incremental MATERIALIZED-VIEW maintenance: keep per-key aggregates
  * (count + exact decimal sum) over an append-only event stream
  * up to date without ever rescanning history — the "metrics table"
  * every ingest pipeline maintains (reference composition: scheduler
  * + accumulate + DBStream persistence, applied per-object on deva's
  * event loop).
  *
  * Additive merges are NOT naturally idempotent (replaying a crashed
  * batch would double-add), so the view is a BASE + DELTA LOG:
  *
  *   - each tick writes its batch's per-key PARTIAL aggregate to
  *     `delta/batch=<id>` with OVERWRITE — a replayed batch rewrites
  *     its own delta instead of double-counting (the
  *     [[IncrementalDedup]] per-batch-directory contract, applied to
  *     sums); the checkpoint guarantees a batch id always re-reads
  *     the same input;
  *   - [[serve]] folds base + only the deltas NEWER than the base's
  *     high-water mark — correct even mid-compaction or mid-cleanup;
  *   - [[compact]] folds everything into a new base version
  *     (`base/upto=<B>`) and drops absorbed deltas; a crash between
  *     those two steps changes nothing (serve filters batch > B).
  *
  * At 100 TB the tick cost is the NEW data plus a key-sized merge,
  * and the delta log is bounded by compaction cadence — history is
  * never re-read. Aggregates must be ASSOCIATIVE partials for this
  * to hold (count/sum here; min/max/HLL sketches compose the same
  * way — see SketchesSpec's reaggregation pattern).
  */
object IncrementalAgg {

  /** Per-batch body, exposed for crash-replay verification: calling
    * it AGAIN with the same batchId converges to the same state.
    */
  def processBatch(batch: DataFrame, batchId: Long, viewDir: String,
      keyCols: Seq[String], valueCol: String): Unit = {
    val delta = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("s"))
    delta.coalesce(1).write.mode("overwrite")
      .parquet(s"$viewDir/delta/batch=$batchId")
  }

  /** One maintenance tick: aggregate exactly the events that arrived
    * since the last tick into a new delta.
    */
  def tick(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, viewDir: String, keyCols: Seq[String],
      valueCol: String): Unit =
    Schedule.runOnceForeach(spark, sourceDir, schema, checkpoint)(identity) {
      (batch, batchId) => processBatch(batch, batchId, viewDir, keyCols, valueCol)
    }

  private def baseHighWater(viewDir: String): Option[Long] = {
    val base = new File(s"$viewDir/base")
    if (!base.isDirectory) None
    else base.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("upto="))
      .map(_.getName.stripPrefix("upto=").toLong)
      .maxOption
  }

  /** The current view: base (latest version) + unabsorbed deltas,
    * folded by one key-partial aggregation.
    */
  def serve(spark: SparkSession, viewDir: String, keyCols: Seq[String]): DataFrame = {
    val hw = baseHighWater(viewDir)
    val deltasDir = new File(s"$viewDir/delta")
    val parts = Seq.newBuilder[DataFrame]
    hw.foreach { w =>
      parts += spark.read.parquet(s"$viewDir/base/upto=$w")
        .select((keyCols.map(col) :+ col("n") :+ col("s")): _*)
    }
    if (deltasDir.isDirectory && deltasDir.listFiles().exists(_.getName.startsWith("batch=")))
      parts += spark.read.parquet(s"$viewDir/delta")
        .filter(col("batch") > hw.getOrElse(-1L))
        .select((keyCols.map(col) :+ col("n") :+ col("s")): _*)
    val frames = parts.result()
    require(frames.nonEmpty, s"empty view at $viewDir — no base and no deltas")
    frames.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
  }

  /** Fold base + deltas into a new base version and drop absorbed
    * deltas. Crash-safe at every point: the new base is written
    * BEFORE any delta is removed, and serve's high-water filter
    * makes the overlap harmless.
    */
  def compact(spark: SparkSession, viewDir: String, keyCols: Seq[String]): Unit = {
    val deltasDir = new File(s"$viewDir/delta")
    val batches = if (deltasDir.isDirectory) deltasDir.listFiles().toSeq
      .filter(_.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong) else Seq.empty
    if (batches.isEmpty) return
    val upTo = batches.max
    serve(spark, viewDir, keyCols).coalesce(1)
      .write.mode("overwrite").parquet(s"$viewDir/base/upto=$upTo")
    // absorbed deltas and superseded bases can now go
    batches.foreach { b =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        new File(s"$viewDir/delta/batch=$b"))
    }
    baseHighWater(viewDir).foreach { _ =>
      new File(s"$viewDir/base").listFiles()
        .filter(f => f.getName.startsWith("upto=") &&
          f.getName.stripPrefix("upto=").toLong < upTo)
        .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
    }
  }
}
