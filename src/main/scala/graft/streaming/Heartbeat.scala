package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Topic

/** Bus heartbeat/liveness — the reference's bus keepalive
  * (deva/core/bus.py:231: every process publishes periodic beats;
  * peers flag members whose latest beat is too old).
  *
  * Spark-first shape: beats are rows on a [[Topic]] (the dir-as-log
  * bus backend), so the beat stream inherits the topic's atomic
  * publish, replay, and multi-subscriber delivery. Liveness is a
  * groupBy-max over the beat log — a broadcast-small frame (one row
  * per WORKER, not per beat) — evaluated on a [[Schedule]]/[[Cron]]
  * tick, which is also how the reference checks (a periodic loop, not
  * a push). A fleet publishes beats in batches (one row per worker
  * per tick lands as one topic batch), so beat volume scales with
  * worker count × tick rate, never with data volume.
  */
object Heartbeat {

  case class Beat(worker: String, seq: Long, ts_ms: Long)

  /** Publish one batch of beats (a whole fleet's tick at once — the
    * scale form; a single worker is a 1-row batch).
    */
  def beat(topic: Topic, beats: Seq[Beat]): Unit = {
    val spark = topic.spark
    import spark.implicits._
    topic.publish(beats.toDF())
  }

  /** Liveness as of `asOfMs`: one row per worker ever seen, with its
    * latest beat, beat count, age, and staleness verdict. `beats` is
    * any frame with (worker, seq, ts_ms) — typically
    * `topic.replay()`, or the topic's streaming subscription landed
    * into a store for very long-lived buses.
    */
  def liveness(beats: DataFrame, asOfMs: Long, staleAfterMs: Long): DataFrame =
    beats.groupBy(col("worker"))
      // last_seq must be the seq OF the latest beat, not an
      // independent max: a restarted worker resets its seq counter,
      // and max(seq) would report a stale beat's counter against the
      // new beat's timestamp. (ts ties → highest seq of that ts.)
      .agg(max(col("ts_ms")).as("last_beat_ms"),
        max_by(col("seq"), struct(col("ts_ms"), col("seq"))).as("last_seq"),
        count(lit(1)).as("n_beats"))
      .withColumn("age_ms", lit(asOfMs) - col("last_beat_ms"))
      .withColumn("stale", col("age_ms") > staleAfterMs)

  /** The monitor's alarm list: workers whose latest beat is older
    * than `staleAfterMs` (deva's dead-peer detection).
    */
  def staleWorkers(topic: Topic, asOfMs: Long, staleAfterMs: Long): DataFrame =
    liveness(topic.replay(), asOfMs, staleAfterMs).filter(col("stale"))
}
