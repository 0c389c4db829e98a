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
    */
  def tick(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, outDir: String, store: KvStore,
      idCol: String, textCol: String): Unit =
    Schedule.runOnceForeach(spark, sourceDir, schema, checkpoint)(identity) { (batch, _) =>
      val keyed = batch.withColumn("__nk", normKey(col(textCol)))
      val unseen = store.current() match {
        case Some(seen) =>
          keyed.join(seen.select(col("nk").as("__nk")), Seq("__nk"), "left_anti")
        case None => keyed
      }
      // keep the smallest id per key within the tick
      val admitted = unseen.join(
          unseen.groupBy(col("__nk")).agg(min(col(idCol)).as(idCol)),
          Seq("__nk", idCol), "left_semi")
        .persist()
      admitted.drop("__nk").write.mode("append").parquet(outDir)
      store.upsert(admitted.select(col("__nk").as("nk"), col(idCol).cast("long").as("v")))
      admitted.unpersist()
      ()
    }
}
