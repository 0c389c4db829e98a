package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, VectorIndex}

/** The persisted IVF index contract (the ANN analogue of
  * SearchIndexSpec): train deterministically on a sample, serve
  * probes from the cell-bucketed store, and an incremental tick makes
  * NEW vectors searchable with fixed centroids and no rebuild.
  */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  test("train is deterministic and keeps k centroids") {
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val c1 = VectorIndex.train(spark, vecs, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val c2 = VectorIndex.train(spark, vecs, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(c1.length == 4)
    assert(c1.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq,
      "same data + same seeds must train identical centroids")
    // an update actually happened: centroids are not the raw seeds
    val seeds = vecs.orderBy(col("vec_id")).limit(4).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq)
    assert(!c1.map(_._2.toSeq).toSeq.forall(seeds.contains),
      "Lloyd iterations must move the centroids off the seeds")
  }

  test("map-only ArgmaxCosine assignment is bit-identical to the join+max_by shape") {
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = VectorIndex.train(spark, vecs, k = 4, iters = 2)
    val fast = VectorIndex.assign(vecs, cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = VectorIndex.assignJoin(vecs, cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.size == ref.size && fast == ref,
      "every vector must land in the same cell under both shapes")
    // the map-only shape must be exchange-free (no Exchange below the scan)
    val plan = VectorIndex.assign(vecs, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must be map-only:\n$plan")
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"assignment must run in codegen:\n$plan")
  }

  test("zero-norm vectors fail loudly under BOTH shapes; zero centroids rejected at build") {
    import spark.implicits._
    // under ANSI mode (Spark 4 default) the join shape throws
    // DIVIDE_BY_ZERO on cos = 0/0 — the map-only expression must
    // fail loudly too, not silently assign cell 0 (regression:
    // ArgmaxCosine once returned null here, indexing the vector into
    // an unservable null cell)
    val cents = Seq(
      (0L, Seq(0.0, 1.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0))).toDF("cell", "cemb")
    val good = Seq((1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val fast = VectorIndex.assign(good, cents)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == Map(1L -> 1L, 2L -> 0L))
    val zeroVec = Seq((0L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    // ConvertToLocalRelation may evaluate the tiny frame driver-side
    // (raw IllegalArgumentException) or in a task (SparkException
    // wrapper) — loud failure either way, never a silent cell
    val ex = intercept[Exception](VectorIndex.assign(zeroVec, cents).collect())
    assert(ex.getMessage.contains("zero-norm") ||
      Option(ex.getCause).exists(_.getMessage.contains("zero-norm")), s"got $ex")
    intercept[Throwable](VectorIndex.assignJoin(zeroVec, cents).collect())
    // a zero centroid is rejected when the expression is built
    val zeroCent = Seq((0L, Seq(0.0, 0.0, 0.0))).toDF("cell", "cemb")
    intercept[IllegalArgumentException](VectorIndex.assign(good, zeroCent))
  }

  test("index-served query equals the recomputed within-probed-cells answer; tick adds new vectors") {
    val base = Files.createTempDirectory("graft_vidx").toString
    val src = s"$base/incoming"; val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = VectorIndex.train(spark, vecs, k = 4, iters = 2)
    val store = VectorIndex.open(spark, s"$base/cells", numBuckets = 8)

    // tick 1: the corpus arrives and is assigned incrementally
    vecs.write.mode("append").parquet(src)
    VectorIndex.updateTick(spark, src, vecs.schema, ckpt, store, cents)
    val stored = store.get()
    assert(stored.count() == vecs.count(), "every vector assigned exactly once")
    assert(stored.select(col("cell")).distinct().count() <= 4)

    val probes = vecs.filter(col("vec_id").isin(7L, 133L, 400L))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    val served = VectorIndex.query(spark, store, cents, probes, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(served.map(_._1).distinct.length == 3, "every probe answered")
    assert(served.groupBy(_._1).values.forall(_.length == 3))

    // reference: brute force restricted to each probe's 2 nearest
    // cells, computed from the ASSIGNMENTS frame independently of the
    // store's bucket-pruned read path
    val assignedRef = VectorIndex.assign(vecs, cents)
    val reference = probes.collect().flatMap { pr =>
      val pid = pr.getLong(0)
      val pemb = pr.getSeq[Float](1).map(_.toDouble).toArray
      val cs = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
      def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
      val topCells = cs.map { case (cell, ce) => (cell, dot(pemb, ce) / (nrm(pemb) * nrm(ce))) }
        .sortBy { case (cell, cos) => (-cos, cell) }.take(2).map(_._1).toSet
      assignedRef.filter(col("cell").isin(topCells.toSeq.map(lit): _*))
        .filter(col("vec_id") =!= pid)
        .collect()
        .map { r =>
          val emb = r.getSeq[Float](2).map(_.toDouble).toArray
          (r.getLong(1), dot(emb, pemb) / (nrm(emb) * nrm(pemb)))
        }
        .sortBy { case (vid, cos) => (-cos, vid) }.take(3).zipWithIndex
        .map { case ((vid, _), i) => (pid, (i + 1).toLong, vid) }
    }
    assert(served.sorted.toSeq == reference.sorted.toSeq,
      "bucket-pruned serving must equal the recomputed within-cells answer")

    // tick 2: a NEW vector arrives — an exact copy of probe 7's
    // embedding with a fresh id. After one incremental tick (fixed
    // centroids, no rebuild) it must serve at rank 1 with cosine ~1.
    val novel = vecs.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    novel.write.mode("append").parquet(src)
    VectorIndex.updateTick(spark, src, vecs.schema, ckpt, store, cents)
    assert(store.get().count() == vecs.count() + 1, "tick assigns ONLY the new arrival")
    val after = VectorIndex.query(spark, store, cents,
        probes.filter(col("probe_id") === 7L), nprobe = 2, k = 3)
      .collect()
    assert(after.head.getLong(2) == 100007L, s"new twin must serve at rank 1, got ${after.toSeq}")
    assert(after.head.getDouble(4) > 0.9999)
  }

  test("semantic dedup composed over the persisted index equals the in-query assignment (bucket pruning intact)") {
    // q86_semdedup's production path (its own docstring contract):
    // assignments READ from the persisted VectorIndex instead of
    // recomputed per run — same dropped set, and the store's
    // bucket-pruned read path stays intact underneath the composition
    import org.apache.spark.sql.DataFrame
    val sp = spark
    import sp.implicits._
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = VectorIndex.train(spark, vecs, k = 4, iters = 2)
    val base = Files.createTempDirectory("graft_semdedup_idx").toString
    val store = VectorIndex.open(spark, s"$base/cells", numBuckets = 4)
    VectorIndex.index(store, vecs, cents)

    // q86's pair stage, parameterized by where assignments come FROM
    def dropped(assigned: DataFrame, tau: Double): Set[Long] = {
      val a = assigned.select(col("cell"), col("vec_id").as("a_id"), col("embedding").as("a_e"))
      val b = assigned.select(col("cell"), col("vec_id").as("b_id"), col("embedding").as("b_e"))
      a.join(b, Seq("cell")).filter(col("a_id") < col("b_id"))
        .filter(Similarity.dot(col("a_e"), col("b_e")) /
          (Similarity.norm(col("a_e")) * Similarity.norm(col("b_e"))) >= tau)
        .select(col("b_id")).distinct().collect().map(_.getLong(0)).toSet
    }
    val fromStore = store.get().select(col("cell"), col("vec_id"), col("embedding"))
    Seq(0.0, 0.40).foreach { tau =>
      val viaStore = dropped(fromStore, tau)
      val inQuery = dropped(VectorIndex.assign(vecs, cents), tau)
      assert(viaStore == inQuery,
        s"tau=$tau: persisted-index semdedup must equal the in-query assignment")
    }
    assert(dropped(fromStore, 0.0).nonEmpty, "tau=0 must drop at least one vector (sanity)")
    // serve-side bucket pruning intact: a single-cell read touches
    // only that cell's bucket dir(s)
    val oneCell = Seq(0L).toDF("cell")
    val files = store.lookup(oneCell).get.inputFiles
    val allowed = store.bucketIdsFor(oneCell).toSet
    assert(files.nonEmpty && files.forall(f => allowed.exists(b => f.contains(s"/b=$b/"))),
      s"single-cell read must touch only buckets $allowed:\n${files.mkString("\n")}")
  }
}
