package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Embedding similarity-search queries (SURVEY §2.6 #75–78) over the
  * `embeddings` table (64-dim unit vectors).
  *
  * q50 brute-force is the correctness baseline; q51 (IVF) and q52/q53
  * (random-hyperplane LSH) are the linear-at-100TB candidate paths:
  * probe only the nearest cells / the shared bucket, never the full
  * corpus per query.
  */
object VectorQueries {

  private val dim = 64

  /** q50 — brute-force cosine top-k: probes (vec_id % 50 = 0) are
    * broadcast against the corpus; per-partition top-k then merge.
    */
  def q50_ann_topk(spark: SparkSession, dir: String): DataFrame =
    annTopkFrom(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")))

  /** The brute-force top-k tail over a (vec_id, embedding) frame —
    * shared verbatim by batch q50 and its streaming twin q248
    * (pairing #66), so the online index serve cannot drift from the
    * batch baseline.
    */
  private[queries] def annTopkFrom(emb: DataFrame): DataFrame = {
    val e = emb
      .select(col("vec_id"), col("embedding"), Similarity.norm(col("embedding")).as("nrm"))
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"), col("nrm").as("pnrm"))
    val scored = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        Similarity.dot(col("embedding"), col("pemb")) / (col("nrm") * col("pnrm")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val q50_ann_topk_sql: String = {
    val dotPC = Similarity.dotSql("ce", "pe", dim)
    s"""WITH n AS (SELECT vec_id, embedding, ${Similarity.normSql("embedding", dim)} AS nrm FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, embedding AS pe, nrm AS pnrm FROM n WHERE vec_id % 50 = 0),
       |c AS (SELECT vec_id, embedding AS ce, nrm AS cnrm FROM n),
       |s AS (SELECT probe_id, vec_id, $dotPC / (cnrm * pnrm) AS cosine
       |      FROM c, p WHERE vec_id <> probe_id)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rank FROM s) t
       |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  }

  /** Corpus-INDEPENDENT seed selection shared by q51/q78/q86: the
    * modulus is derived from a count, so the seed/centroid set is
    * pinned to ≈ seedK vectors no matter the corpus size. The round-6
    * rule (`vec_id % 100`) was corpus-PROPORTIONAL — 1% of a 100 TB
    * corpus collected to the driver and embedded as plan literals.
    * Counting first costs one cheap scan; every collect below is then
    * k-bounded forever. (Production goes one further: assignment is
    * read from the persisted [[graft.operators.VectorIndex]], whose
    * training sample and centroid count are k-bounded by contract —
    * spec'd in VectorIndexSpec.)
    */
  private val seedK = 16L
  private def seedModulus(spark: SparkSession, dir: String): Long = {
    val n = Tables.embeddings(spark, dir).count()
    math.max(1L, n / seedK)
  }
  private val seedModSql: String =
    s"(SELECT GREATEST(1, COUNT(*) // $seedK) FROM embeddings)"

  /** q51 — IVF top-k: ≈ seedK deterministic centroids (count-derived
    * modulus, k-bounded); every vector is assigned to its nearest
    * centroid (the "index"); probes scan only their 2 nearest cells.
    * At 100 TB the corpus is bucketed/partitioned by cell so a probe
    * touches ~2/k of data.
    */
  /** Norm-projected embeddings and the deterministic seed centroids
    * shared by q51 (serving) and q78 (training). */
  private def embWithCents(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    embCentsFrom(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")))

  /** As [[embWithCents]] but from an arbitrary (vec_id, embedding)
    * frame — the q251 streaming twin rebuilds the corpus from
    * compacted state and must derive the SAME count-pinned centroid
    * set, so the modulus comes from the frame, not the table. */
  private def embCentsFrom(emb: DataFrame): (DataFrame, DataFrame) = {
    val e = emb
      .select(col("vec_id"), col("embedding"), Similarity.norm(col("embedding")).as("nrm"))
    val mod = math.max(1L, emb.count() / seedK)
    val cent = e.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"), col("nrm").as("cnrm"))
    (e, cent)
  }

  /** Nearest-centroid assignment for q51: max_by, NOT a
    * per-vector window — the window shape shuffles all n×k scored
    * rows into a sort, the groupBy gets map-side partial max_by so
    * the exchange carries n rows. Tie-break (cos desc, cent_id asc)
    * encoded as the ordering struct (cos, -cent_id) — identical to
    * the oracle's ROW_NUMBER ordering. (q78 and the index OPERATOR go
    * one further: VectorIndex.assign / ArgmaxCosine is a map-only
    * codegen'd argmax with no n×k rows at all.)
    */
  private def assignToCells(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .withColumn("cos_c", Similarity.dot(col("embedding"), col("cemb")) / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id").as("cell"), col("embedding"), col("nrm")),
        struct(col("cos_c"), (-col("cent_id")).as("tie"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        col("best.embedding").as("embedding"), col("best.nrm").as("nrm"))

  def q51_ivf_topk(spark: SparkSession, dir: String): DataFrame =
    ivfTopkFrom(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")))

  /** The IVF serve tail over a (vec_id, embedding) frame — shared
    * verbatim by batch q51 and its streaming twin q251 (pairing
    * #68), so the cell-pruned online serve cannot drift from the
    * batch index.
    */
  private[queries] def ivfTopkFrom(emb: DataFrame): DataFrame = {
    val (e, cent) = embCentsFrom(emb)
    val assigned = assignToCells(e, cent)
    // probes: 2 nearest cells each
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"), col("nrm").as("pnrm"))
    val wProbe = Window.partitionBy(col("probe_id")).orderBy(col("pcos").desc, col("cent_id"))
    val pcells = probes.crossJoin(broadcast(cent))
      .withColumn("pcos", Similarity.dot(col("pemb"), col("cemb")) / (col("pnrm") * col("cnrm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 2)
      .select(col("probe_id"), col("pemb"), col("pnrm"), col("cent_id").as("cell"))
    // search only those cells
    val wTop = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    pcells.join(assigned, "cell")
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", Similarity.dot(col("embedding"), col("pemb")) / (col("nrm") * col("pnrm")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cell"), col("cosine"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val q51_ivf_topk_sql: String = {
    val dVC = Similarity.dotSql("embedding", "cemb", dim)
    val dPC = Similarity.dotSql("pemb", "cemb", dim)
    val dCP = Similarity.dotSql("embedding", "pemb", dim)
    s"""WITH n AS (SELECT vec_id, embedding, ${Similarity.normSql("embedding", dim)} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM n WHERE vec_id % $seedModSql = 0),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell, embedding, nrm FROM (
       |    SELECT n.vec_id, cent.cent_id, n.embedding, n.nrm,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $dVC / (nrm * cnrm) DESC, cent_id) AS rn
       |    FROM n, cent) t WHERE rn = 1),
       |probes AS (SELECT vec_id AS probe_id, embedding AS pemb, nrm AS pnrm FROM n WHERE vec_id % 50 = 0),
       |pcells AS (
       |  SELECT probe_id, pemb, pnrm, cent_id AS cell FROM (
       |    SELECT probes.probe_id, probes.pemb, probes.pnrm, cent.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY $dPC / (pnrm * cnrm) DESC, cent_id) AS prn
       |    FROM probes, cent) t WHERE prn <= 2)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, cell, cosine FROM (
       |  SELECT p.probe_id, a.vec_id, a.cell,
       |    $dCP / (a.nrm * p.pnrm) AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY $dCP / (a.nrm * p.pnrm) DESC, a.vec_id) AS rank
       |  FROM pcells p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.probe_id) t
       |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin
  }

  /** q52 — random-hyperplane LSH bucket per vector: the O(1)-probe
    * vector analogue of MinHash banding.
    */
  def q52_vec_lsh(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("bucket"))
      .orderBy(col("vec_id"))

  val q52_vec_lsh_sql: String =
    s"""SELECT vec_id, ${Similarity.lshBucketSql("embedding", dim)} AS bucket
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** q53 — embedding near-dup candidates: pairs sharing an LSH bucket
    * with their exact cosine (the verify stage; pair space is linear
    * in corpus size because buckets are small).
    */
  def q53_cosine_neardup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"),
        Similarity.lshBucket(col("embedding")).as("bucket"))
    val a = e.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("a_e"), col("nrm").as("a_n"))
    val b = e.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("b_e"), col("nrm").as("b_n"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", Similarity.dot(col("a_e"), col("b_e")) / (col("a_n") * col("b_n")))
      .select(col("bucket"), col("a_id"), col("b_id"), col("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val q53_cosine_neardup_sql: String = {
    val dAB = Similarity.dotSql("a_e", "b_e", dim)
    s"""WITH e AS (SELECT vec_id, embedding, ${Similarity.normSql("embedding", dim)} AS nrm,
       |  ${Similarity.lshBucketSql("embedding", dim)} AS bucket FROM embeddings)
       |SELECT a.bucket, a.vec_id AS a_id, b.vec_id AS b_id,
       |  ${Similarity.dotSql("a.embedding", "b.embedding", dim)} / (a.nrm * b.nrm) AS cosine
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** q67 — int8 embedding quantization (4× smaller ANN index): codes
    * and their checksum must match the oracle EXACTLY (integer sum —
    * order-independent), and the reconstruction cosine vs the
    * original vector must stay ≥ 0.995 (`recon_ok` pinned TRUE).
    * Columnar, zero shuffles — the quantization pass at 100 TB is a
    * pure map stage writing the compact index.
    */
  def q67_vec_quantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Similarity.qScale(col("embedding")).as("scale"))
      .select(col("vec_id"), col("embedding"), col("scale"),
        Similarity.quantize(col("embedding"), col("scale")).as("codes"))
      .select(col("vec_id"), col("embedding"), col("scale"), col("codes"),
        Similarity.dequantize(col("codes"), col("scale")).as("deq"))
      .select(col("vec_id"),
        aggregate(col("codes"), lit(0L), (a, v) => a + v).as("code_sum"),
        lit(dim.toLong * 4).as("n_bytes_fp32"), lit(dim.toLong).as("n_bytes_int8"),
        (Similarity.dot(col("embedding"), col("deq")) /
          (Similarity.norm(col("embedding")) * Similarity.norm(col("deq"))) >= 0.995)
          .as("recon_ok"))
      .orderBy(col("vec_id"))

  val q67_vec_quantize_sql: String =
    s"""WITH s AS (SELECT vec_id, embedding, ${Similarity.qScaleSql("embedding")} AS scale FROM embeddings),
       |q AS (SELECT vec_id, embedding, scale, ${Similarity.quantizeSql("embedding", "scale")} AS codes FROM s),
       |d AS (SELECT vec_id, embedding, codes, ${Similarity.dequantizeSql("codes", "scale")} AS deq FROM q)
       |SELECT vec_id,
       |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
       |  CAST(${dim * 4} AS BIGINT) AS n_bytes_fp32, CAST($dim AS BIGINT) AS n_bytes_int8,
       |  (${Similarity.dotSql("embedding", "deq", dim)} /
       |    (${Similarity.normSql("embedding", dim)} * ${Similarity.normSql("deq", dim)}) >= 0.995) AS recon_ok
       |FROM d ORDER BY vec_id""".stripMargin

  /** q68 — two-stage quantized ANN search (the PQ-style shape): the
    * int8 codes score the whole corpus per probe with INTEGER dot
    * products (4× less memory traffic, order-independent, engine-
    * exact), a top-20 shortlist is reranked with exact float cosine,
    * and the final top-5 is emitted. At 100 TB this composes with
    * IVF (q51): coarse int8 scan inside the probed cells only.
    */
  def q68_quantized_rerank(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Similarity.qScale(col("embedding")).as("scale"))
      .select(col("vec_id"), col("embedding"), col("scale"),
        Similarity.quantize(col("embedding"), col("scale")).as("codes"),
        Similarity.norm(col("embedding")).as("nrm"))
    val probes = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"),
        col("scale").as("pscale"), col("codes").as("pcodes"), col("nrm").as("pnrm"))
    // the coarse scan is the hot path (n×p int8 dots): the codegen'd
    // ArrayDot kernel, not the interpreted zip_with∘aggregate HOF.
    // Its double accumulation is EXACT here — int8 products summed
    // over 64 dims stay far below 2^53 — so the value is bit-equal
    // to the integer fold the oracle computes, engine- and
    // order-exact (profiled in PLANS.md round 5: the HOF was q68's
    // whole regression)
    val intDot = graft.plans.ArrayDot(col("codes"), col("pcodes"))
    val coarse = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("approx", intDot * col("scale") * col("pscale"))
    val wCoarse = Window.partitionBy(col("probe_id")).orderBy(col("approx").desc, col("vec_id"))
    val shortlist = coarse.withColumn("crn", row_number().over(wCoarse)).filter(col("crn") <= 20)
    val wExact = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    shortlist
      .withColumn("cosine", Similarity.dot(col("embedding"), col("pemb")) / (col("nrm") * col("pnrm")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val q68_quantized_rerank_sql: String = {
    val intDot = s"list_reduce(list_concat([CAST(0 AS BIGINT)], " +
      s"list_transform(range(1, ${dim + 1}), i -> codes[i] * pcodes[i])), (x, y) -> x + y)"
    s"""WITH s AS (SELECT vec_id, embedding, ${Similarity.qScaleSql("embedding")} AS scale,
       |    ${Similarity.normSql("embedding", dim)} AS nrm FROM embeddings),
       |b AS (SELECT vec_id, embedding, scale, nrm, ${Similarity.quantizeSql("embedding", "scale")} AS codes FROM s),
       |p AS (SELECT vec_id AS probe_id, embedding AS pemb, scale AS pscale, codes AS pcodes, nrm AS pnrm
       |      FROM b WHERE vec_id % 50 = 0),
       |coarse AS (
       |  SELECT b.vec_id, b.embedding, b.nrm, p.probe_id, p.pemb, p.pnrm,
       |    CAST($intDot AS DOUBLE) * b.scale * p.pscale AS approx
       |  FROM b, p WHERE b.vec_id <> p.probe_id),
       |shortlist AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY approx DESC, vec_id) AS crn
       |    FROM coarse) t WHERE crn <= 20)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine FROM (
       |  SELECT probe_id, vec_id,
       |    ${Similarity.dotSql("embedding", "pemb", dim)} / (nrm * pnrm) AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY ${Similarity.dotSql("embedding", "pemb", dim)} / (nrm * pnrm) DESC, vec_id) AS rank
       |  FROM shortlist) t
       |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  }

  /** q78 — one Lloyd (k-means) update step from the q51 seed
    * centroids: assign every vector to its nearest seed by cosine,
    * then recompute per-cell per-dimension sums — the TRAINING side
    * of the IVF index q51 serves from (at scale: iterate this step,
    * centroids stay broadcast-small, one shuffle per iteration on the
    * cell key).
    *
    * Cross-engine check is over integer-quantized sums (round(v*1e6)
    * per element, summed as BIGINT) — float addition is not
    * associative, so a double sum's low bits depend on partition
    * order; the integer checksum is engine- and order-exact (the q67
    * pattern). Production keeps doubles; the gate asserts assignment
    * + aggregation structure exactly.
    */
  def q78_kmeans_step(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // Seed centroids are k-BOUNDED (count-derived modulus pins the
    // seed set to ≈ seedK regardless of corpus size), so they ride in
    // the plan as a driver-held matrix and assignment is the map-only
    // codegen'd argmax ([[graft.plans.ArgmaxCosine]]): zero exchanges
    // before the cell aggregation, no n×k scored rows, no sort.
    // Bit-identical to the join+max_by shape by VectorIndexSpec; that
    // shape stays in VectorIndex.assignJoin (and q51) for centroid
    // frames too large to hold driver-side.
    val seeds = e.filter(col("vec_id") % seedModulus(spark, dir) === 0)
      .collect().sortBy(_.getLong(0))
    val ids = seeds.map(_.getLong(0))
    val mat = seeds.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    // the argmax yields dense 0..k-1 in cent_id order — map back
    val cell = element_at(array(ids.toIndexedSeq.map(lit): _*),
      (graft.plans.ArgmaxCosine(col("embedding"), mat) + 1L).cast("int"))
    e.select(cell.as("cell"), col("embedding"))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("v").cast("double") * 1e6).cast("long")).as("sum_q"))
      .select(col("cell"), col("pos").cast("long").as("pos"), col("n_members"), col("sum_q"))
      .orderBy(col("cell"), col("pos"))
  }

  val q78_kmeans_step_sql: String = {
    val dVC = Similarity.dotSql("embedding", "cemb", dim)
    s"""WITH n AS (SELECT vec_id, embedding, ${Similarity.normSql("embedding", dim)} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM n WHERE vec_id % $seedModSql = 0),
       |assigned AS (
       |  SELECT vec_id, cell, embedding FROM (
       |    SELECT n.vec_id, cent.cent_id AS cell, n.embedding,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $dVC / (nrm * cnrm) DESC, cent_id) AS rn
       |    FROM n, cent) t WHERE rn = 1),
       |dims AS (SELECT cell, unnest(range(${dim})) AS pos, embedding FROM assigned)
       |SELECT cell, CAST(pos AS BIGINT) AS pos, COUNT(*) AS n_members,
       |  CAST(SUM(CAST(round(CAST(embedding[pos + 1] AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS sum_q
       |FROM dims GROUP BY cell, pos ORDER BY cell, pos""".stripMargin
  }

  /** q86 — semantic dedup (the SemDeDup shape: embedding-cluster
    * near-dup removal): every vector is assigned to its nearest seed
    * centroid with the map-only codegen'd argmax (zero exchanges, as
    * q78), pairs are compared ONLY within a cell, and the higher
    * vec_id of any pair at cosine ≥ τ is dropped. Pairs are compared
    * only within a cell, so the pair term is Σ(cell size)² — at
    * production scale k grows with the corpus (VectorIndex trains
    * n/2000 cells from a k-bounded sample) and the assignment is READ
    * from the persisted VectorIndex (spec'd in VectorIndexSpec), so
    * per-cell pair cost stays bounded and no all-pairs path exists;
    * the gate formulation pins k ≈ seedK so its driver state is
    * corpus-independent. τ = 0.40 sits in this synthetic corpus's
    * top-0.1% tail; a real corpus's planted-dup regime uses 0.95+ —
    * the knob, not the shape.
    */
  def q86_semdedup(spark: SparkSession, dir: String): DataFrame =
    semdedupFrom(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")))

  /** q86's SemDeDup tail over an arbitrary (vec_id, embedding)
    * frame — the count-pinned seed rule travels with the frame (the
    * q251 lesson) so the streaming twin q271's rebuilt corpus
    * derives the SAME centroids as batch. Shared verbatim by q86 and
    * q271 so batch and stream cannot drift. */
  private[queries] def semdedupFrom(base: DataFrame): DataFrame = {
    // k-bounded seed collect (count-derived modulus) — NOT a fraction
    // of the corpus; see seedModulus
    val mod = math.max(1L, base.count() / seedK)
    val seeds = base.filter(col("vec_id") % mod === 0)
      .collect().sortBy(_.getLong(0))
    val ids = seeds.map(_.getLong(0))
    val mat = seeds.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val cell = element_at(array(ids.toIndexedSeq.map(lit): _*),
      (graft.plans.ArgmaxCosine(col("embedding"), mat) + 1L).cast("int"))
    val assigned = base.withColumn("cell", cell)
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("a_e"), col("nrm").as("a_n"))
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_e"), col("nrm").as("b_n"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(Similarity.dot(col("a_e"), col("b_e")) / (col("a_n") * col("b_n")) >= 0.40)
      .select(col("b_id").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), coalesce(col("is_dup"), lit(false)).as("is_dup"))
      .orderBy(col("vec_id"))
  }

  val q86_semdedup_sql: String = {
    val dVC = Similarity.dotSql("embedding", "cemb", dim)
    val dAB = Similarity.dotSql("a.embedding", "b.embedding", dim)
    s"""WITH n AS (SELECT vec_id, embedding, ${Similarity.normSql("embedding", dim)} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM n WHERE vec_id % $seedModSql = 0),
       |assigned AS (
       |  SELECT vec_id, cell, embedding, nrm FROM (
       |    SELECT n.vec_id, cent.cent_id AS cell, n.embedding, n.nrm,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $dVC / (nrm * cnrm) DESC, cent_id) AS rn
       |    FROM n, cent) t WHERE rn = 1),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
       |  ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE $dAB / (a.nrm * b.nrm) >= 0.40)
       |SELECT a.vec_id, a.cell, (d.vec_id IS NOT NULL) AS is_dup
       |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
       |ORDER BY a.vec_id""".stripMargin
  }

  /** q166 — IVF + PQ end-to-end: the PRODUCTION two-stage ANN shape
    * composing the engine's coarse quantizer (q51's deterministic
    * IVF cells — a probe touches only its 2 nearest cells, ~2/k of
    * the corpus) with q68's int8 product-quantized scoring INSIDE
    * the probed cells (the codegen'd ArrayDot kernel; int8 dots over
    * 64 dims are exact in a double) and a final exact-cosine rerank
    * of the 20-deep shortlist. At 100 TB: corpus bucketed by cell,
    * probes ship only codes into the coarse stage, full vectors are
    * touched for 20 candidates per probe — the FAISS IVF-PQ serving
    * pattern as one declarative plan.
    */
  def q166_ivf_pq(spark: SparkSession, dir: String): DataFrame =
    ivfPqFrom(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")))

  /** q166's two-stage IVF+PQ serve over an arbitrary (vec_id,
    * embedding) frame — centroids, int8 codes and both ranking
    * stages all derive from it (the count-pinned seed rule travels
    * with the frame, as embCentsFrom). Shared verbatim by batch q166
    * and the streaming twin q282 so the online production ANN path
    * cannot drift from batch. */
  private[queries] def ivfPqFrom(emb: DataFrame): DataFrame = {
    val (e, cent) = embCentsFrom(emb)
    val codes = emb
      .select(col("vec_id"), col("embedding"), Similarity.qScale(col("embedding")).as("scale"))
      .select(col("vec_id"), col("scale"),
        Similarity.quantize(col("embedding"), col("scale")).as("codes"))
    val assigned = assignToCells(e, cent).join(codes, "vec_id")
    val probes = e.filter(col("vec_id") % 50 === 0)
      .join(codes, "vec_id")
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"),
        col("nrm").as("pnrm"), col("scale").as("pscale"), col("codes").as("pcodes"))
    val wProbe = Window.partitionBy(col("probe_id")).orderBy(col("pcos").desc, col("cent_id"))
    val pcells = probes.crossJoin(broadcast(cent))
      .withColumn("pcos", Similarity.dot(col("pemb"), col("cemb")) / (col("pnrm") * col("cnrm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 2)
      .select(col("probe_id"), col("pemb"), col("pnrm"), col("pscale"),
        col("pcodes"), col("cent_id").as("cell"))
    val wCoarse = Window.partitionBy(col("probe_id")).orderBy(col("approx").desc, col("vec_id"))
    val shortlist = pcells.join(assigned, "cell")
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("approx",
        graft.plans.ArrayDot(col("codes"), col("pcodes")) * col("scale") * col("pscale"))
      .withColumn("crn", row_number().over(wCoarse))
      .filter(col("crn") <= 20)
    val wExact = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    shortlist
      .withColumn("cosine", Similarity.dot(col("embedding"), col("pemb")) / (col("nrm") * col("pnrm")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cell"), col("cosine"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val q166_ivf_pq_sql: String = {
    val dVC = Similarity.dotSql("embedding", "cemb", dim)
    val dPC = Similarity.dotSql("pemb", "cemb", dim)
    val dCP = Similarity.dotSql("embedding", "pemb", dim)
    val intDot = s"list_reduce(list_concat([CAST(0 AS BIGINT)], " +
      s"list_transform(range(1, ${dim + 1}), i -> codes[i] * pcodes[i])), (x, y) -> x + y)"
    s"""WITH n AS (SELECT vec_id, embedding, ${Similarity.normSql("embedding", dim)} AS nrm FROM embeddings),
       |sc AS (SELECT vec_id, ${Similarity.qScaleSql("embedding")} AS scale FROM embeddings),
       |cd AS (SELECT e.vec_id, sc.scale, ${Similarity.quantizeSql("e.embedding", "sc.scale")} AS codes
       |       FROM embeddings e JOIN sc ON e.vec_id = sc.vec_id),
       |cent AS (SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm FROM n WHERE vec_id % $seedModSql = 0),
       |assigned AS (
       |  SELECT t.vec_id, t.cell, t.embedding, t.nrm, c.scale, c.codes FROM (
       |    SELECT n.vec_id, cent.cent_id AS cell, n.embedding, n.nrm,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $dVC / (nrm * cnrm) DESC, cent_id) AS rn
       |    FROM n, cent) t JOIN cd c ON t.vec_id = c.vec_id WHERE t.rn = 1),
       |probes AS (
       |  SELECT n.vec_id AS probe_id, n.embedding AS pemb, n.nrm AS pnrm,
       |    c.scale AS pscale, c.codes AS pcodes
       |  FROM n JOIN cd c ON n.vec_id = c.vec_id WHERE n.vec_id % 50 = 0),
       |pcells AS (
       |  SELECT probe_id, pemb, pnrm, pscale, pcodes, cent_id AS cell FROM (
       |    SELECT probes.probe_id, probes.pemb, probes.pnrm, probes.pscale, probes.pcodes, cent.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY $dPC / (pnrm * cnrm) DESC, cent_id) AS prn
       |    FROM probes, cent) t WHERE prn <= 2),
       |shortlist AS (
       |  SELECT * FROM (
       |    SELECT p.probe_id, p.pemb, p.pnrm, a.vec_id, a.cell, a.embedding, a.nrm,
       |      ROW_NUMBER() OVER (PARTITION BY p.probe_id
       |        ORDER BY CAST($intDot AS DOUBLE) * a.scale * p.pscale DESC, a.vec_id) AS crn
       |    FROM pcells p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.probe_id) t
       |  WHERE crn <= 20)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, cell, cosine FROM (
       |  SELECT probe_id, vec_id, cell,
       |    $dCP / (nrm * pnrm) AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY $dCP / (nrm * pnrm) DESC, vec_id) AS rank
       |  FROM shortlist) t
       |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q166_ivf_pq" -> (q166_ivf_pq _),
    "q78_kmeans_step" -> (q78_kmeans_step _),
    "q86_semdedup" -> (q86_semdedup _),
    "q50_ann_topk" -> (q50_ann_topk _),
    "q67_vec_quantize" -> (q67_vec_quantize _),
    "q68_quantized_rerank" -> (q68_quantized_rerank _),
    "q51_ivf_topk" -> (q51_ivf_topk _),
    "q52_vec_lsh" -> (q52_vec_lsh _),
    "q53_cosine_neardup" -> (q53_cosine_neardup _)
  )

  def oracles: Map[String, String] = Map(
    "q166_ivf_pq" -> q166_ivf_pq_sql,
    "q78_kmeans_step" -> q78_kmeans_step_sql,
    "q86_semdedup" -> q86_semdedup_sql,
    "q50_ann_topk" -> q50_ann_topk_sql,
    "q67_vec_quantize" -> q67_vec_quantize_sql,
    "q68_quantized_rerank" -> q68_quantized_rerank_sql,
    "q51_ivf_topk" -> q51_ivf_topk_sql,
    "q52_vec_lsh" -> q52_vec_lsh_sql,
    "q53_cosine_neardup" -> q53_cosine_neardup_sql
  )
}
