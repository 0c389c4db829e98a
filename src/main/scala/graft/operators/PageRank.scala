package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full power-iteration PageRank over an undirected edge frame — the
  * production composition whose single-step kernel is gate query
  * q97_pagerank_step (RelationalQueries), the same kernel→operator
  * relationship VectorIndex has to q51 and Dedup.connectedComponents
  * to q54. Reference scope: deva has no graph module; this belongs to
  * the §2.6 training-data mandate (domain-level quality priors à la
  * Common Crawl's published PageRank/harmonic-centrality ranks).
  *
  * Loop discipline: the edge frame is symmetrized ONCE,
  * pre-partitioned on src and persisted, so across rounds only the
  * node-sized rank frame moves. Each round's vector is
  * `localCheckpoint(eager)`— NOT merely persisted: the L1-delta join
  * references both the new and the previous vector, so without
  * lineage TRUNCATION every round's logical plan would embed the
  * prior round's twice and the plan tree grows exponentially (a
  * 60-round loop OOMs the driver just *printing* the plan; measured
  * here before the checkpoint landed). connectedComponents gets away
  * with persist-only because its round plan references the previous
  * frame once (linear growth, diameter-bounded rounds); any loop
  * whose round touches the prior frame twice must checkpoint. On a
  * real cluster prefer `checkpoint()` to survive executor loss on
  * long chains.
  *
  * Numerics: plain doubles, NOT the gate's DECIMAL quantization —
  * there is no cross-engine oracle to bit-match here, and the
  * fixed-point tolerance (default 1e-9 per-node mass) swamps
  * float-addition order effects. Undirected graphs have no dangling
  * nodes (every node has deg ≥ 1), so rank mass is conserved at 1
  * by construction — asserted in PageRankSpec, not re-normalized.
  */
object PageRank {

  /** Iterate to the stationary rank vector.
    *
    * @param pairs one row per undirected edge; numeric node ids
    * @return (node, deg, pr) — throws if maxIter rounds don't reach
    *         an L1 step below tol (an unconverged vector silently
    *         misranks, same contract as connectedComponents)
    */
  def run(pairs: DataFrame, aCol: String, bCol: String,
      damping: Double = 0.85, tol: Double = 1e-9,
      maxIter: Int = 200): DataFrame = {
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .repartition(col("src")) // reused by every round's contribution join
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    val n = deg.count()
    require(n > 0, "empty graph")
    // geometric convergence at rate ≈ damping: tol=1e-9 needs
    // ln(tol)/ln(0.85) ≈ 130 rounds — hence the default budget
    var pr = deg.select(col("src").as("id"), lit(1.0 / n).as("pr"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = edges
        .join(deg.join(pr, deg("src") === pr("id"))
          .select(col("src"), (col("pr") / col("deg")).as("share")), "src")
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("mass"))
        .select(col("dst").as("id"),
          (lit((1 - damping) / n) + lit(damping) * col("mass")).as("pr"))
        .localCheckpoint(true)
      val delta = next.join(pr.select(col("id"), col("pr").as("prev")), "id")
        .agg(sum(abs(col("pr") - col("prev"))).as("d"))
        .head().getDouble(0)
      pr = next
      converged = delta < tol
      i += 1
    }
    if (!converged) {
      deg.unpersist(blocking = true); edges.unpersist(blocking = true)
      throw new IllegalStateException(
        s"PageRank did not converge within $maxIter rounds (tol=$tol)")
    }
    val out = pr.join(deg, pr("id") === deg("src"))
      .select(col("id").as("node"), col("deg"), col("pr"))
    edges.unpersist(blocking = true)
    out
  }
}
