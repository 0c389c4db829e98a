package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Determinism

/** Deduplication for LLM-training-data pipelines, designed so the
  * candidate-generation stage is linear at 100 TB:
  *
  *  - exact: hash-groupBy on normalized text (one shuffle)
  *  - MinHash + LSH: shingles → k minhashes → b bands; docs sharing a
  *    band bucket are candidates (shuffle on band key — never O(n²))
  *  - SimHash: 60-bit fingerprint by bit-vote (deva/utils/simhash.py
  *    re-expressed as a columnar aggregation)
  *  - n-gram Jaccard: exact verification, run ONLY on LSH candidates
  *
  * All hashing derives from the engine-portable md5-60bit hash
  * (Determinism.hash60) so every stage is reproducible in DuckDB for
  * the oracle — and across reruns/partitionings in production.
  */
object Dedup {

  /** Mersenne prime 2^31-1: permutation modulus. Values stay under
    * 2^62 in (a*x + b) so int64 never overflows in either engine.
    */
  val P: Long = 2147483647L

  /** 16 fixed (a, b) permutation constants — literal so Spark and the
    * SQL oracle can't disagree.
    */
  val perms: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (214013L, 2531011L), (69069L, 362437L),
    (1664525L, 1013904223L), (22695477L, 1L), (134775813L, 1L),
    (214903917L, 11L), (16843009L, 826366247L), (1220703125L, 7L),
    (32310901L, 33554431L), (48271L, 0L), (65539L, 0L),
    (40692L, 3791L), (1588635695L, 3L), (1223106847L, 5L), (279470273L, 13L))

  val numBands = 4
  val rowsPerBand = 4

  /** Per-shingle base hash, reduced mod P — the row-level form the
    * executed plan uses (explode→hash→groupBy-min, SURVEY §5).
    */
  def baseHash(s: Column): Column = pmod(Determinism.hash60(s), lit(P))

  def baseHashesSql(shRef: String): String =
    s"list_transform($shRef, s -> ${Determinism.hash60Sql("s")} % ${P})"

  /** i-th permutation of a base hash (min-aggregated per doc). */
  def permuted(h: Column, i: Int): Column = {
    val (a, b) = perms(i)
    (lit(a) * h + lit(b)) % lit(P)
  }

  def minhashSql(hsRef: String, i: Int): String = {
    val (a, b) = perms(i)
    s"COALESCE(list_min(list_transform($hsRef, x -> ($a * x + $b) % ${P})), ${P})"
  }

  /** Band key: md5 of the band's minhashes — the LSH bucket id. */
  def bandKey(sig: Seq[Column], band: Int): Column =
    md5(concat_ws(",", sig.slice(band * rowsPerBand, (band + 1) * rowsPerBand): _*))

  def bandKeySql(sigRefs: Seq[String], band: Int): String =
    s"md5(concat_ws(',', ${sigRefs.slice(band * rowsPerBand, (band + 1) * rowsPerBand).mkString(", ")}))"

  /** SimHash fingerprint (60-bit, term-frequency weighted): explode
    * tokens, per-bit majority vote, recompose. `tokensDf` must have
    * columns (id, tok). Output: (id, simhash).
    *
    * One shuffle on id; the 60 votes are map-side partial sums.
    */
  def simhash(tokensDf: DataFrame, idCol: String): DataFrame = {
    // hash materialized BELOW the aggregate: the 60 vote expressions
    // each reference h, and CollapseProject refuses to inline a
    // non-cheap expression consumed 60 times — so md5 runs once per
    // token, not 60 times (the projection-collapse trap, SURVEY §5)
    val withH = tokensDf.select(col(idCol),
      pmod(Determinism.hash60(col("tok")), lit(1L << 60)).as("h"))
    val votes = (0 until 60).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"s_$b")
    }
    val fp = (0 until 60).map { b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    withH.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), fp.as("simhash"))
  }

  /** DuckDB rendering of [[simhash]] — same bit math, generated from
    * the same loop bounds. `tokTable(id, tok)` exploded tokens.
    */
  def simhashSql(tokTable: String, idCol: String): String = {
    val h = s"(${Determinism.hash60Sql("tok")} % ${1L << 60})"
    val votes = (0 until 60)
      .map(b => s"SUM((($h >> $b) & 1) * 2 - 1) AS s_$b").mkString(", ")
    val fp = (0 until 60)
      .map(b => s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"SELECT $idCol, CAST($fp AS BIGINT) AS simhash FROM (SELECT $idCol, $votes FROM $tokTable GROUP BY $idCol) v"
  }

  /** Connected components over a near-dup pair list — the missing
    * last stage of the dedup pipeline (reference: deva/utils/
    * simhash.py:360 cluster_texts builds clusters then keeps one
    * canonical text per cluster).
    *
    * Hash-min label propagation: every node starts labeled with its
    * own id and repeatedly takes the min of its neighbors' labels;
    * at convergence label = min id of the component (the natural
    * keep_id). Rounds needed = component diameter — near-dup
    * clusters are shallow by construction (pairs share LSH buckets),
    * so a handful of rounds suffice; no driver-side graph. Each round
    * is push-then-min: propagate every node's label across its out-
    * edges, union the nodes' current labels back in, take min per id
    * — one join + one aggregation. Edges are cached pre-partitioned
    * on src, so the (large) edge side never re-shuffles across
    * rounds; only the label frame moves. Convergence is detected
    * through the monotone label sum (labels only ever decrease), and
    * every round persists its frame so the plan doesn't grow with
    * iterations (at cluster scale swap persist for checkpoint to
    * truncate lineage).
    *
    * Input: one row per undirected pair (aCol, bCol), numeric ids.
    * Output: (id, label) for every id that appears in a pair.
    *
    * GRAPH-SIZE-ADAPTIVE (r9): a directed edge frame at or below
    * `localEdgeThreshold` rows is collected and union-found on the
    * driver — the same size class as a broadcast-hash-join build
    * side (2M × 16 B ≈ 32 MB), replacing diameter-many
    * (join + agg + action) rounds with one job and microseconds of
    * driver CPU; identical output by construction (min id per
    * component, path-compressed union-find tracking the min root).
    * Above the threshold — the 100 TB regime where the pair graph
    * itself is big — the distributed label-propagation loop runs
    * unchanged. The switch mirrors Spark's own size-based
    * broadcast-vs-shuffle join strategy; parity of the two paths is
    * spec-asserted on planted graphs (ClusterTraverseSpec).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, localEdgeThreshold: Long = 2000000L): DataFrame = {
    // both edge directions from ONE pass over pairs: a union of two
    // selects would evaluate the (possibly expensive) pairs pipeline
    // twice when the persist below materializes
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .repartition(col("src")) // cached partitioning reused by every round's join
      .persist()
    val nEdges = edges.count() // also materializes the persist exactly once
    if (nEdges <= localEdgeThreshold) {
      val idType = edges.schema("src").dataType
      val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist(blocking = true)
      // path-compressed union-find; root carries the component min
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min id becomes the root
      }
      val out = parent.keys.toSeq.map(id => (id, find(id)))
      val spark = pairs.sparkSession
      import spark.implicits._
      return out.toDF("id", "label")
        .select(col("id").cast(idType).as("id"), col("label").cast(idType).as("label"))
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    var prevSum = labels.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var converged = false
    var i = 0
    // maxIter bounds CHANGE rounds; detection needs one extra
    // no-change round, hence <= — a component of diameter exactly
    // maxIter must converge, not throw
    while (!converged && i <= maxIter) {
      val pushed = edges
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      val next = pushed.union(labels)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .persist()
      val s = next.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
      labels.unpersist(blocking = true)
      labels = next
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    edges.unpersist(blocking = true)
    // an unconverged result silently mislabels components (q65 would
    // keep several docs of one true cluster) — fail loudly instead;
    // rounds needed = component diameter, so hitting this means the
    // pair graph has long chains and maxIter must be raised
    if (!converged) {
      labels.unpersist(blocking = true)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — component diameter exceeds maxIter")
    }
    labels
  }

  /** In-plan guard against quadratic blow-up: a bucket member list
    * larger than `maxBucket` raises a LOUD error inside the expansion
    * (raise_error sits in the data path, so the optimizer cannot
    * prune it) instead of silently exploding O(n²) pairs on one task.
    * A tripped guard means the banding/blocking needs retuning (more
    * bands, or salt-split the hot bucket) — not a bigger cluster.
    */
  /** In-bucket upper-triangle pair expansion, second-generator side:
    * the members of `ms` strictly ABOVE `pivot`, to be exploded by
    * the caller beside the pivot's own explode. Emits the n(n-1)/2
    * unordered pairs directly instead of all n² ordered pairs then a
    * filter — half the generated rows into every pair shuffle (r16
    * Triangles measurement: q138 median 6.1→4.0 s).
    *
    * INVARIANT (the r9 lesson, now centralized): both generators
    * must stay codegen'd `explode`s with only this half-pruning
    * `filter` interpreted per element. The fully-lambda
    * flatten(transform(transform)) pair form interprets per PAIR and
    * measured slower; do not "simplify" call sites into it.
    */
  def membersAbove(ms: Column, pivot: Column): Column =
    filter(ms, m => m > pivot)

  /** [[membersAbove]] for STRUCT member arrays ordered by one field
    * (the id): strict comparison on that field only.
    */
  def membersAboveBy(ms: Column, pivot: Column, field: String): Column =
    filter(ms, m => m.getField(field) > pivot.getField(field))

  def cappedMembers(ids: Column, maxBucket: Int, what: String): Column =
    when(size(ids) > maxBucket,
      raise_error(concat(
        lit(s"$what bucket exceeds $maxBucket members ("), size(ids).cast("string"),
        lit(") — quadratic pair expansion refused; retune bands or salt-split"))))
      .otherwise(ids)

  /** LSH candidate pairs from a signature frame with columns
    * (id, m0..m15): docs sharing any band bucket, each pair once.
    *
    * Shape: groupBy bucket → sorted member list → expand in-bucket
    * pairs with array lambdas. One shuffle, and the signature
    * pipeline is evaluated ONCE — a bucket self-join would recompute
    * it for each join side (measured 2× on the scale smoke). Bucket
    * membership is small by construction (that's what banding is
    * for); [[cappedMembers]] turns the pathological giant bucket into
    * a loud failure instead of a silent quadratic task.
    */
  def lshCandidatePairs(sig: DataFrame, idCol: String,
      maxBucket: Int = 10000): DataFrame = {
    val sigCols = perms.indices.map(i => col(s"m$i"))
    val banded = sig.select(
      col(idCol),
      posexplode(array((0 until numBands).map(b => bandKey(sigCols, b)): _*)).as(Seq("band", "bkey")))
    banded
      .groupBy(col("band"), col("bkey"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .withColumn("ids", cappedMembers(col("ids"), maxBucket, "LSH band"))
      .select(col("ids"), explode(col("ids")).as("a"))
      .select(col("a"), explode(membersAbove(col("ids"), col("a"))).as("b"))
      .select(col("a").as("a_id"), col("b").as("b_id"))
      .distinct()
  }
}
