package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Scheduled incremental processing — the reference's scheduler/timer
  * surface (deva/core/when.py:74 `scheduler`, :198 `timer`: "every
  * day at 9am, process what's new") re-expressed as CHECKPOINTED
  * AvailableNow runs.
  *
  * deva keeps a live event loop and fires callbacks on wall-clock
  * ticks; at 100 TB the durable form is an incremental batch: any
  * external trigger (cron, Airflow, a workflow engine — or
  * [[timer]] below for in-process cadence) invokes [[runOnce]], and
  * the streaming checkpoint guarantees each run processes exactly
  * the files that arrived since the last run — exactly-once across
  * crashes, missed ticks, and reruns, with zero state of our own.
  */
object Schedule {

  /** One scheduled tick: read whatever is new under `sourceDir`
    * (parquet), apply `transform`, append to `outDir`. Safe to call
    * from cron at any cadence; a tick with nothing new writes
    * nothing. Restart-safe: progress lives in `checkpoint`.
    */
  def runOnce(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, outDir: String)(transform: DataFrame => DataFrame): Unit = {
    val q = transform(spark.readStream.schema(schema).parquet(sourceDir))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One scheduled tick into an arbitrary action (deva `sink` under a
    * scheduler): `action` sees each new micro-batch exactly once —
    * the hook for KvStore upserts or external deliveries.
    */
  def runOnceForeach(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, sourceOptions: Map[String, String] = Map.empty)(
      transform: DataFrame => DataFrame)(
      action: (DataFrame, Long) => Unit): Unit = {
    val q = transform(spark.readStream.schema(schema).options(sourceOptions)
        .parquet(sourceDir))
      .writeStream
      .foreachBatch(action)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** In-process periodic form (deva `timer`): the same incremental
    * pipeline kept alive on a ProcessingTime cadence instead of
    * re-invoked externally. Returns the running query; stop() ends it.
    */
  def timer(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, outDir: String, every: String)(
      transform: DataFrame => DataFrame) =
    transform(spark.readStream.schema(schema).parquet(sourceDir))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(every))
      .start()
}
