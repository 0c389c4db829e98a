package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round single-source(-set) shortest paths — Bellman–Ford
  * relaxation as a reusable kernel beside [[KHop]] (q138's unweighted
  * BFS; deva's bounded recursive traverse, pipe.py:1013, is the hop
  * form — this is its weighted generalization: "cheapest affinity
  * path within N relaxations" over a similarity/co-purchase graph,
  * where edge cost is inverse tie strength rather than 1).
  *
  * Semantics: dist₀ = 0 on every source node; each round relaxes
  * every edge once — distᵣ(v) = min(distᵣ₋₁(v), min over (u,v,w) of
  * distᵣ₋₁(u) + w). After r rounds distᵣ(v) is EXACTLY the cheapest
  * path cost over paths of ≤ r edges (the textbook Bellman–Ford
  * invariant), so a fixed `rounds` yields a deterministic,
  * oracle-checkable frame with no convergence test in the plan.
  * Unlike [[KHop.expand]] there is NO anti-join against a reached
  * set: a node settled in round k can still IMPROVE in round k+1
  * via a cheaper multi-edge path — dropping it would freeze the BFS
  * answer, not the weighted one.
  *
  * Scale/shape: the edge frame (big, static) is the caller's to
  * cache — it streams through one hash join per round keyed on the
  * frontier column, exactly the iterative-plan hygiene of
  * [[PageRank]] (hoist invariants, never re-derive per round). The
  * dist frame (node-bounded, small) is cut per round with an eager
  * localCheckpoint, so each round's join sees a bare LogicalRDD and
  * the node-bounded dist side broadcasts; partition width comes from
  * AQE's byte-based coalescing (scale-adaptive, guide §2.2). Each
  * round is one shuffle (the min-agg); candidate generation is
  * map-side.
  */
object Sssp {

  /** Relax for exactly `rounds` rounds over directed weighted edges
    * `edges` (columns x → y with cost w ≥ 0; pass both directions
    * for an undirected graph) from the nodes of `src` (column `n`),
    * returning (n, d) — the exact min cost over paths of ≤ `rounds`
    * edges; nodes beyond `rounds` edges from every source are absent.
    */
  def relax(edges: DataFrame, src: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    // Round discipline (r16, measured in KHop's A/B): each dist frame
    // is an eager localCheckpoint — one materialization job per
    // round, after which the frame is a bare LogicalRDD. The r13–r15
    // persist+count+width-cap bookkeeping (an extra count job, a
    // getNumPartitions probe, an explicit unpersist, a coalesce
    // wrapper per round) cost more than the relaxation itself at gate
    // scale; width now comes from AQE's byte-based coalescing (scale-
    // adaptive, guide §2.2), and the node-bounded dist side still
    // broadcasts into the edge join (PlanAuditSpec audits the round
    // plans).
    var dist = src.select(col("n")).distinct()
      .withColumn("d", lit(0L)).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cand = dist.join(edges, dist("n") === edges("x"))
        .select(col("y").as("n"), (col("d") + col("w")).as("d"))
      dist = dist.unionByName(cand)
        .groupBy(col("n")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    dist
  }
}
