package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling — the dense-subgraph kernel completing the
  * graph family ([[KHop]] reachability, [[Sssp]] weighted distance,
  * [[Triangles]] motifs, [[Dedup.connectedComponents]] components,
  * [[PageRank]] centrality): repeatedly remove nodes of degree < k
  * in the induced subgraph; what survives is the k-core, the
  * standard dense-cluster screen (contamination rings, bot cliques,
  * spam link farms — the dedup/curation layer's "is this cluster
  * structurally dense or just big" question; deva reaches graph
  * reports through its stats-pipe compositions, SURVEY §2.6 83at).
  *
  * Semantics: round r keeps node v iff its degree WITHIN round
  * r−1's survivor-induced subgraph is ≥ k. A fixed `rounds` makes
  * the frame deterministic and oracle-checkable with no convergence
  * test in the plan (the true core is the fixed point; callers pick
  * rounds ≥ graph peel depth — each round strips at least one
  * "shell" layer, so depth is tiny on co-occurrence graphs).
  * Returned: each survivor of the final peel with its degree in the
  * PREVIOUS round's induced subgraph (the degree the final filter
  * judged — so output = dᵣ WHERE dᵣ ≥ k, exactly the oracle's shape).
  *
  * Scale/shape: the bidirectional edge frame (big, static — the
  * caller's to cache) streams through TWO hash joins per round
  * against the survivor set; survivors are node-bounded and cut per
  * round with an eager localCheckpoint — the same iterative-plan
  * hygiene as [[Sssp.relax]] and [[KHop.expand]]. Each round is one
  * count-agg shuffle; degree recounting never touches the original
  * bipartite corpus, only the projected edge frame.
  */
object KCore {

  /** Peel directed edge frame `edges` (columns x → y; pass both
    * directions for an undirected graph) for exactly `rounds`
    * rounds at threshold `k`, returning (n, d) — final-peel
    * survivors with the degree the final filter judged.
    */
  def peel(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    require(k >= 1, "k must be positive")
    // Round discipline (r16, measured in KHop's A/B): each survivor
    // frame is an eager localCheckpoint — one materialization job per
    // round, after which the frame is a bare LogicalRDD. The r13–r15
    // persist+count+width-cap bookkeeping (an extra count job, a
    // getNumPartitions probe, an explicit unpersist, a coalesce
    // wrapper per round) cost more than the peel itself at gate
    // scale; width now comes from AQE's byte-based coalescing (scale-
    // adaptive, guide §2.2), and the node-bounded survivor side still
    // broadcasts into the edge joins (PlanAuditSpec audits the round
    // plans).
    var surv = edges.select(col("x").as("n")).distinct().localCheckpoint(true)
    for (_ <- 1 to rounds) {
      surv = edges
        .join(surv.select(col("n").as("xa")), edges("x") === col("xa"))
        .join(surv.select(col("n").as("yb")), edges("y") === col("yb"))
        .groupBy(edges("x").as("n")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .localCheckpoint(true)
    }
    surv.select(col("n"), col("d"))
  }
}
