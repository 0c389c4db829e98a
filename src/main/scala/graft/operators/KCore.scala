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
  * against the survivor set; survivors are node-bounded, persisted +
  * counted (exact AQE stats → the survivor side broadcasts),
  * width-capped ([[KHop.frameWidth]]), previous round unpersisted —
  * the same iterative-plan hygiene as [[Sssp.relax]]. Each round is
  * one count-agg shuffle; degree recounting never touches the
  * original bipartite corpus, only the projected edge frame.
  */
object KCore {

  /** Peel directed edge frame `edges` (columns x → y; pass both
    * directions for an undirected graph) for exactly `rounds`
    * rounds at threshold `k`, returning (n, d) — final-peel
    * survivors with the degree the final filter judged.
    */
  def peel(edges: DataFrame, k: Long, rounds: Int,
           targetRowsPerTask: Long = 500000L): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    require(k >= 1, "k must be positive")
    // `cached` is the persisted survivor frame (the unpersist
    // handle); `surv` what downstream reads — the same frame or an
    // UNPERSISTED coalesce over its cached blocks (one cache entry
    // per round; never a cache wrapping a cache).
    var cached = edges.select(col("x").as("n")).distinct().persist()
    var surv = cached
    surv.count()
    for (_ <- 1 to rounds) {
      val deg = edges
        .join(surv.select(col("n").as("xa")), edges("x") === col("xa"))
        .join(surv.select(col("n").as("yb")), edges("y") === col("yb"))
        .groupBy(edges("x").as("n")).agg(count(lit(1)).as("d"))
      val next = deg.filter(col("d") >= k).persist()
      val n = next.count()
      cached.unpersist(blocking = true)
      cached = next
      val w = KHop.frameWidth(n, targetRowsPerTask)
      surv = if (next.rdd.getNumPartitions <= w) next else next.coalesce(w)
    }
    // Eager lineage cut + cache release (ADVICE r13): survivor set is
    // node-bounded — materialize and drop the final round's persist so
    // invocations don't stack storage (pagerankIterFrom's pattern).
    val out = surv.select(col("n"), col("d")).localCheckpoint(true)
    cached.unpersist(blocking = true)
    out
  }
}
