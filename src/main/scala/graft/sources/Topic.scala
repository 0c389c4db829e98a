package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.streaming.EventFlow

/** File-backed pub/sub topic — the reference's Topic / RedisStream /
  * sub-pub surface (deva/core/sources.py:1463 `Topic`, :768
  * `RedisStream`; core.py:1141 `sub`/`pub`) with a directory as the
  * broker.
  *
  * Layout: one directory per topic; every published batch appends
  * immutable parquet files. Subscribers are independent streaming
  * readers, each with its OWN checkpoint — so N subscribers each see
  * the full topic exactly once, at their own pace, with no broker
  * process and no coordination (the filesystem's atomic file listing
  * is the log). This is the same dir-as-log pattern production stacks
  * use before graduating to Kafka; swapping in EventFlow.kafkaReader
  * changes only the source line, not the dataflow.
  *
  * Retention/compaction is the owner's job (files are immutable;
  * delete by age), matching the reference's maxlen-trimmed streams.
  */
final case class Topic(spark: SparkSession, root: String, name: String) {

  val dir = s"$root/$name"

  /** Publish a batch (deva `pub`): an atomic append of immutable
    * files — visible to every subscriber's next poll.
    */
  def publish(df: DataFrame): Unit =
    df.write.mode("append").parquet(dir)

  /** Continuous publisher (a stream >> topic): exactly-once via the
    * writer's checkpoint.
    */
  def publishStream(flow: EventFlow, checkpoint: String): StreamingQuery =
    flow.toParquet(dir, checkpoint)

  /** Subscribe (deva `sub`): a streaming read of the topic. Each
    * subscriber passes its own checkpoint to whatever sink it drives;
    * distinct checkpoints → independent full-topic delivery.
    */
  def subscribe(schema: StructType): EventFlow =
    EventFlow(spark.readStream.schema(schema).parquet(dir))

  /** Schema of what's been published so far (footer read). */
  def schema: StructType = spark.read.parquet(dir).schema

  /** Batch view of the whole topic (deva Topic replay). */
  def replay(): DataFrame = spark.read.parquet(dir)
}
