package graft.streaming

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.TextAnalysis
import graft.sources.KvStore

/** Incremental corpus ingestion — "dedupe today's crawl against the
  * whole corpus", the loop a training-data pipeline runs forever
  * (reference composition: scheduler + DBStream + unique;
  * deva/core/when.py:74 + store.py:44 + core.py:1085, applied
  * per-object on its event loop).
  *
  * Each scheduled tick:
  *   1. reads ONLY documents that arrived since the last tick
  *      (checkpointed AvailableNow source — exactly-once across
  *      crashes and reruns, [[Schedule.runOnceForeach]]),
  *   2. drops docs whose normalized-content key was admitted by ANY
  *      previous tick (anti-join against the persistent seen-key
  *      store) or duplicated within the tick (keep min id),
  *   3. appends the survivors to the corpus and upserts their keys.
  *
  * The seen-key store holds one (nk, id) row per distinct normalized
  * key ever admitted — a content-addressed index of the corpus, not
  * the corpus itself; at 100 TB that's the only table the tick must
  * join against, and [[KvStore]]'s bucketed layout rewrites only the
  * buckets today's keys land in.
  */
object IncrementalDedup {

  /** Normalized content key: md5 of the sorted token multiset — the
    * same normalization the batch exact-dedup gate (q43) verifies.
    */
  def normKey(text: Column): Column =
    md5(concat_ws(" ", array_sort(TextAnalysis.tokens(text))))

  /** One ingestion tick. `store` must be keyed on "nk" with version
    * column "v" (e.g. `new KvStore(spark, path, Seq("nk"), "v")`).
    *
    * Crash-safe exactly-once: the corpus lands in a per-batch
    * directory (`batch=<id>`, OVERWRITE — a replayed batch rewrites
    * its own output instead of appending duplicates), the seen-key
    * store records which batch admitted each key, and the anti-join
    * ignores keys admitted by the CURRENT batch id — so a replay
    * after a crash at ANY point (corpus written / keys upserted /
    * neither) recomputes the identical admitted set and converges to
    * the same state. The checkpoint guarantees a batch id always
    * re-reads the same input files.
    */
  def tick(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, outDir: String, store: KvStore,
      idCol: String, textCol: String): Unit =
    Schedule.runOnceForeach(spark, sourceDir, schema, checkpoint)(identity) { (batch, batchId) =>
      processBatch(batch, batchId, outDir, store, idCol, textCol)
    }

  /** The per-batch body — separated so the crash-replay contract
    * (calling it AGAIN with the same batchId converges to the same
    * corpus and store state) is directly spec-testable.
    */
  private[graft] def processBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long,
      outDir: String, store: KvStore, idCol: String, textCol: String): Unit = {
    val keyed = batch.withColumn("__nk", normKey(col(textCol)))
    val unseen = store.current() match {
      case Some(seen) =>
        keyed.join(seen.filter(col("b") =!= batchId).select(col("nk").as("__nk")),
          Seq("__nk"), "left_anti")
      case None => keyed
    }
    // exactly ONE row per key within the tick (min id; row_number
    // also collapses fully-identical duplicate rows, which a
    // min-id semi-join would all keep)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__nk")).orderBy(col(idCol))
    val admitted = unseen.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()
    admitted.drop("__nk").write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    store.upsert(admitted.select(col("__nk").as("nk"),
      col(idCol).cast("long").as("v"), lit(batchId).as("b")))
    admitted.unpersist(blocking = true)
    ()
  }
}
