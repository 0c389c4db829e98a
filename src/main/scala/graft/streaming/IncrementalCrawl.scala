package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Fetch
import graft.sources.KvStore

/** Continuous crawl — "fetch today's new URLs, skip everything any
  * previous tick already fetched", the reference's crawler+scheduler
  * composition (deva core.py:1656 crawler + when.py:74 scheduler,
  * per-object on its event loop) at cluster shape: each tick is one
  * checkpointed batch, the fetch runs on the executors
  * ([[Fetch.get]]), and the fetched-URL index is a bucketed
  * [[KvStore]] so the anti-join reads an index, not the response
  * corpus.
  *
  * Crash-replay contract (same as [[IncrementalDedup]]): responses
  * land in a per-batch directory (OVERWRITE — a replayed batch
  * rewrites its own output), the store records which batch fetched
  * each URL, and the anti-join ignores the CURRENT batch id — so a
  * replay recomputes the same URL set and converges. A replayed batch
  * re-FETCHES its own URLs: at-least-once against the network is the
  * honest contract (responses may differ across fetches; the
  * structure converges).
  */
object IncrementalCrawl {

  /** One crawl tick. `store` must be keyed on "url" with version
    * column "v" (e.g. `new KvStore(spark, path, Seq("url"), "v")`).
    * Source rows need `idCol` (numeric) and `urlCol` (string).
    */
  def tick(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, outDir: String, store: KvStore,
      idCol: String, urlCol: String, retries: Int = 3,
      minIntervalMs: Long = 0L): Unit =
    Schedule.runOnceForeach(spark, sourceDir, schema, checkpoint)(identity) { (batch, batchId) =>
      processBatch(spark, batch, batchId, outDir, store, idCol, urlCol, retries, minIntervalMs)
    }

  /** Per-batch body, separated so the replay contract is directly
    * spec-testable (same batchId → same fetched set → same state).
    */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      outDir: String, store: KvStore, idCol: String, urlCol: String,
      retries: Int, minIntervalMs: Long): Unit = {
    val unseen = store.current() match {
      case Some(seen) =>
        batch.join(seen.filter(col("b") =!= batchId).select(col("url").as(urlCol)),
          Seq(urlCol), "left_anti")
      case None => batch
    }
    // one fetch per distinct URL within the tick (min id wins the row)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol)).orderBy(col(idCol))
    val todo = unseen.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fetched = Fetch.get(spark, todo, idCol, urlCol,
      retries = retries, minIntervalMs = minIntervalMs)
      .join(todo.select(col(idCol), col(urlCol)), Seq(idCol))
      .persist()
    fetched.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    store.upsert(fetched.select(col(urlCol).as("url"),
      col(idCol).cast("long").as("v"), lit(batchId).as("b")))
    fetched.unpersist(blocking = true)
    ()
  }
}
