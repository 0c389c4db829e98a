package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.KvStore
import graft.streaming.Schedule

/** Persisted, incrementally-updated full-text index — the reference's
  * `IndexStream` (deva/search.py:19 `IndexStream`, :88 `index_path`,
  * :131 `update`, :163 `search`): documents are indexed ONCE into a
  * durable postings store, later queries hit the index, and new
  * documents become searchable through incremental update ticks — no
  * rebuild, no per-query corpus scan.
  *
  * Spark-first shape:
  *  - postings: explode(tokens) → groupBy(term, doc) → tf. ONE
  *    map-side-combined shuffle per indexed batch.
  *  - store: a [[KvStore]] keyed (tok, doc_id), versioned by the
  *    indexing batch, BUCKETED BY TERM — every posting of a term lives
  *    in one bucket directory, so serving a query reads ≤ |terms|
  *    buckets (KvStore.lookup) with parquet pushdown on `tok` inside
  *    them, and an update tick rewrites only the buckets its terms
  *    hash into. Re-indexing a changed document wins by batch version
  *    (last indexing of a (term, doc) pair is the live one).
  *  - update: a checkpointed AvailableNow tick
  *    ([[graft.streaming.Schedule.runOnceForeach]]) — each tick
  *    indexes exactly the documents that arrived since the last tick,
  *    exactly-once across crashes and reruns (a replayed batch
  *    upserts identical rows and converges).
  *  - search: AND-of-terms ranked by total hit count, served FROM the
  *    store — same semantics as the from-raw-text formulation (q36),
  *    which is exactly what the q73 gate asserts.
  *
  * At 100 TB the postings table is the only thing a query touches;
  * its size is O(total tokens) but per-query cost is O(postings of
  * the query's terms) — the property that makes it an index.
  */
object SearchIndex {

  /** Open (or create) the postings store at `path`. */
  def open(spark: SparkSession, path: String, numBuckets: Int = 16): KvStore =
    new KvStore(spark, path, Seq("tok", "doc_id"), "v",
      numBuckets = numBuckets, bucketCols = Seq("tok"))

  /** Postings of a document batch: one (term, doc, tf) row per
    * distinct term per doc, stamped with the indexing version.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String, version: Long): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("v", lit(version))

  /** Bulk-build (or refresh) the index over a document frame. */
  def index(store: KvStore, docs: DataFrame, idCol: String, textCol: String,
      version: Long = 0L): Unit =
    store.upsert(postings(docs, idCol, textCol, version))

  /** Incremental update (deva search.py:131 `update`): index ONLY the
    * documents that arrived under `sourceDir` since the last tick.
    * Safe to call at any cadence; an idle tick upserts nothing.
    */
  def updateTick(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, store: KvStore, idCol: String, textCol: String): Unit =
    Schedule.runOnceForeach(spark, sourceDir, schema, checkpoint)(identity) {
      (batch, batchId) =>
        store.upsert(postings(batch, idCol, textCol, batchId))
    }

  /** Serve an AND-of-terms query from the index (deva search.py:163
    * `search`): docs containing ALL terms, ranked by total hits.
    * Reads only the term buckets; top-k via orderBy+limit
    * (TakeOrderedAndProject — no global partition-less window).
    */
  def search(spark: SparkSession, store: KvStore, rawTerms: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    // dedupe the query: a repeated term would make the AND filter
    // (n_terms == |terms|) unsatisfiable and silently return nothing
    val terms = rawTerms.distinct
    val empty = Seq.empty[(Long, Long, Long)].toDF("rank", "doc_id", "n_hits")
    store.lookup(terms.toDF("tok")) match {
      case None => empty
      case Some(posts) =>
        val top = posts.filter(col("tok").isin(terms.map(lit): _*))
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("n_hits"), countDistinct(col("tok")).as("n_terms"))
          .filter(col("n_terms") === terms.size)
          .orderBy(col("n_hits").desc, col("doc_id"))
          .limit(k)
        val w = Window.orderBy(col("n_hits").desc, col("doc_id"))
        top.withColumn("rank", row_number().over(w))
          .select(col("rank").cast("long").as("rank"), col("doc_id"), col("n_hits"))
          .orderBy(col("rank"))
    }
  }
}
