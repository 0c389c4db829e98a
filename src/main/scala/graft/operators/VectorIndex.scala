package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.KvStore
import graft.streaming.Schedule

/** Persisted, incrementally-updated IVF vector index — the ANN
  * analogue of [[SearchIndex]] (and of the reference's durable
  * `IndexStream` pattern, deva/search.py:19): centroids are TRAINED
  * once on a sample, the corpus is assigned once, new vectors are
  * assigned by incremental ticks, and queries probe only their
  * nearest cells' buckets — never the whole corpus.
  *
  * Shapes, all broadcast/bucket-bounded:
  *  - train: iterated Lloyd steps (q78's gate-verified kernel) on a
  *    deterministic hash-sample; centroids live on the driver between
  *    iterations (k×dim doubles — broadcast-small by definition).
  *  - index: one nearest-centroid assignment pass (max_by, map-side
  *    partials) into a [[KvStore]] keyed (cell, vec_id), BUCKETED BY
  *    CELL — a query's candidate scan reads ≤ nprobe bucket dirs
  *    (KvStore.lookup) instead of the corpus.
  *  - update: a checkpointed AvailableNow tick assigns ONLY newly
  *    arrived vectors against the FIXED centroids (exactly-once per
  *    vector across crashes). Centroid drift is handled by periodic
  *    retrain+rebuild — the production IVF maintenance contract —
  *    not by silently moving old assignments.
  *
  * At 100 TB: training cost is sample×k×dim, assignment is one linear
  * pass per batch, serving is nprobe/k of the corpus per query.
  */
object VectorIndex {

  /** Open (or create) the assignment store at `path`. */
  def open(spark: SparkSession, path: String, numBuckets: Int = 16): KvStore =
    new KvStore(spark, path, Seq("cell", "vec_id"), "v",
      numBuckets = numBuckets, bucketCols = Seq("cell"))

  private def cosine(e: Column, nrm: Column, c: Column, cn: Column): Column =
    Similarity.dot(e, c) / (nrm * cn)

  /** Nearest-centroid assignment as a MAP-ONLY scan: centroids are
    * k-bounded (driver-held by contract — train() returns them from
    * collected state), so the argmax over cells runs inside a single
    * codegen'd expression per vector ([[graft.plans.ArgmaxCosine]]) —
    * no n×k scored rows, no sort, no exchange. Tie-break (cos desc,
    * cell asc) and arithmetic are bit-identical to the join+max_by
    * formulation (spec-asserted). `centroids` must have (cell, cemb)
    * with cells 0..k-1; output (cell, vec_id, embedding).
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cl = centroids.select(col("cell"), col("cemb")).collect().sortBy(_.getLong(0))
    require(cl.zipWithIndex.forall { case (r, i) => r.getLong(0) == i.toLong },
      s"centroid cells must be dense 0..k-1, got ${cl.map(_.getLong(0)).mkString(",")}")
    val mat = cl.map(_.getSeq[Double](1).toArray)
    // a NULL embedding (or null element) yields a NULL cell — refuse
    // to emit it rather than persist a row query() can never serve
    // (zero-norm and wrong-width vectors already throw inside the
    // expression itself)
    val cell = graft.plans.ArgmaxCosine(col("embedding"), mat)
    vecs.select(
      coalesce(cell, raise_error(concat(
        lit("VectorIndex.assign: null embedding for vec_id="),
        col("vec_id").cast("string"))).cast("long")).as("cell"),
      col("vec_id"), col("embedding"))
  }

  /** The join-formulation reference shape of [[assign]] (broadcast
    * crossJoin → max_by) — kept for the equality spec and for callers
    * whose centroid frame is too large to hold driver-side.
    */
  def assignJoin(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val e = vecs.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val c = centroids.select(col("cell"), col("cemb"),
      Similarity.norm(col("cemb")).as("cnrm"))
    e.crossJoin(broadcast(c))
      .withColumn("cos_c", cosine(col("embedding"), col("nrm"), col("cemb"), col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cell"), col("embedding")),
        struct(col("cos_c"), (-col("cell")).as("tie"))).as("best"))
      .select(col("best.cell").as("cell"), col("vec_id"),
        col("best.embedding").as("embedding"))
  }

  /** Train k centroids with `iters` Lloyd iterations on a
    * deterministic hash-sample (`samplePermille`/1000 of vectors —
    * content-independent, rerun-stable). Seeds are the k lowest
    * sampled vec_ids. A cell that loses all members keeps its
    * previous centroid (no silent k collapse). Returns (cell, cemb)
    * with cells 0..k-1.
    */
  def train(spark: SparkSession, vecs: DataFrame, k: Int, iters: Int,
      samplePermille: Int = 1000): DataFrame = {
    import spark.implicits._
    val sample = vecs.select(col("vec_id"), col("embedding"))
      .filter(pmod(graft.functions.Determinism.hash60(col("vec_id").cast("string")), lit(1000))
        < samplePermille)
      .persist()
    // k seeds collected driver-side (bounded by k) — no global window
    var cents: Map[Long, Seq[Double]] = sample
      .orderBy(col("vec_id")).limit(k)
      .collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => i.toLong -> r.getSeq[Float](1).map(_.toDouble).toSeq }
      .toMap
    require(cents.size == k, s"need at least $k sampled vectors to seed, got ${cents.size}")
    for (_ <- 1 to iters) {
      val cdf = cents.toSeq.sortBy(_._1).toDF("cell", "cemb")
      val updated = assign(sample, cdf)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(map_from_arrays(collect_list(col("pos")), collect_list(col("m"))).as("byPos"))
        .collect()
        .map { r =>
          val m = r.getMap[Int, Double](1)
          r.getLong(0) -> (0 until m.size).map(m)
        }.toMap
      cents = cents ++ updated // empty cells keep their old centroid
    }
    sample.unpersist(blocking = true)
    cents.toSeq.sortBy(_._1).toDF("cell", "cemb")
  }

  /** Bulk-build: assign the whole frame and upsert, version 0. */
  def index(store: KvStore, vecs: DataFrame, centroids: DataFrame): Unit =
    store.upsert(assign(vecs, centroids).withColumn("v", lit(0L)))

  /** Incremental update: assign ONLY vectors that arrived under
    * `sourceDir` since the last tick (fixed centroids), exactly-once
    * across crashes. An idle tick upserts nothing.
    */
  def updateTick(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, store: KvStore, centroids: DataFrame): Unit =
    Schedule.runOnceForeach(spark, sourceDir, schema, checkpoint)(identity) {
      (batch, batchId) =>
        store.upsert(assign(batch, centroids).withColumn("v", lit(batchId)))
    }

  /** Serve top-k cosine neighbors for each probe, scanning only each
    * probe's `nprobe` nearest cells' bucket dirs. Output:
    * (probe_id, rank, vec_id, cell, cosine).
    *
    * The served frame leans on a persisted probe→cell assignment;
    * query() leaves the blocks for the ContextCleaner (fine for a
    * one-shot). A long-lived server looping queries should use
    * [[serve]], which unpersists eagerly once the result is consumed.
    */
  def query(spark: SparkSession, store: KvStore, centroids: DataFrame,
      probes: DataFrame, nprobe: Int, k: Int): DataFrame =
    queryWithRelease(spark, store, centroids, probes, nprobe, k)._1

  /** Serve-and-release: run `use` over the served frame, then
    * unpersist the probe-assignment cache in a finally — the shape
    * for a session answering many queries, where waiting on the GC
    * to collect dropped frames accumulates cached blocks.
    */
  def serve[A](spark: SparkSession, store: KvStore, centroids: DataFrame,
      probes: DataFrame, nprobe: Int, k: Int)(use: DataFrame => A): A = {
    val (df, release) = queryWithRelease(spark, store, centroids, probes, nprobe, k)
    try use(df) finally release()
  }

  private def queryWithRelease(spark: SparkSession, store: KvStore, centroids: DataFrame,
      probes: DataFrame, nprobe: Int, k: Int): (DataFrame, () => Unit) = {
    import spark.implicits._
    val c = centroids.select(col("cell"), col("cemb"),
      Similarity.norm(col("cemb")).as("cnrm"))
    val p = probes.select(col("probe_id"), col("pemb"),
      Similarity.norm(col("pemb")).as("pnrm"))
    // nprobe nearest cells per probe: |probes| × k rows — probe-sized
    val wCell = Window.partitionBy(col("probe_id")).orderBy(col("pcos").desc, col("cell"))
    // computed ONCE: store.lookup's bucket-id probe collects over
    // this frame and the result plan joins it again — without the
    // persist the probe-assignment crossJoin (and the caller's
    // arbitrary `probes` pipeline above it) would execute twice.
    // persist, not localCheckpoint: the plan stays recomputable on
    // executor loss (blocks are freed by the ContextCleaner once the
    // served frame is dropped)
    val pcells = p.crossJoin(broadcast(c))
      .withColumn("pcos", cosine(col("pemb"), col("pnrm"), col("cemb"), col("cnrm")))
      .withColumn("prn", row_number().over(wCell))
      .filter(col("prn") <= nprobe)
      .select(col("probe_id"), col("pemb"), col("pnrm"), col("cell"))
      .persist()
    val empty = Seq.empty[(Long, Long, Long, Long, Double)]
      .toDF("probe_id", "rank", "vec_id", "cell", "cosine")
    val release = () => { pcells.unpersist(blocking = true); () }
    store.lookup(pcells.select(col("cell"))) match {
      case None => (empty, release)
      case Some(cands) =>
        val wTop = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
        val served = pcells.join(cands, "cell")
          .filter(col("vec_id") =!= col("probe_id"))
          .withColumn("cosine",
            cosine(col("embedding"), Similarity.norm(col("embedding")), col("pemb"), col("pnrm")))
          .withColumn("rank", row_number().over(wTop))
          .filter(col("rank") <= k)
          .select(col("probe_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cell"), col("cosine"))
          .orderBy(col("probe_id"), col("rank"))
        (served, release)
    }
  }
}
