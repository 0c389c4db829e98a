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
  * dist frame (node-bounded, small) is persisted + counted each
  * round — materializing it keeps AQE's size stats exact so the
  * per-round join stays a broadcast of dist, not a shuffle of the
  * edges — and capped to [[KHop.frameWidth]] partitions with a
  * shuffle-free coalesce (the near-empty-task-spray fix measured in
  * r9). The previous round's cache is unpersisted once its successor
  * is materialized: rounds never stack storage (KHop must keep its
  * per-round frames because `reached` unions them; here each round's
  * aggregate REPLACES the last). Each round is one shuffle (the
  * min-agg); candidate generation is map-side.
  */
object Sssp {

  /** Relax for exactly `rounds` rounds over directed weighted edges
    * `edges` (columns x → y with cost w ≥ 0; pass both directions
    * for an undirected graph) from the nodes of `src` (column `n`),
    * returning (n, d) — the exact min cost over paths of ≤ `rounds`
    * edges; nodes beyond `rounds` edges from every source are absent.
    */
  def relax(edges: DataFrame, src: DataFrame, rounds: Int,
            targetRowsPerTask: Long = 500000L): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    // `cached` is the round's persisted frame (the unpersist handle);
    // `dist` is what downstream reads — the same frame, or an
    // UNPERSISTED coalesce over its cached blocks. One cache entry
    // per round, never a cache wrapping a cache (the documented AQE
    // cache-on-cache hazard class).
    var cached = src.select(col("n")).distinct().withColumn("d", lit(0L)).persist()
    var dist = cached
    dist.count()
    for (_ <- 1 to rounds) {
      val cand = dist.join(edges, dist("n") === edges("x"))
        .select(col("y").as("n"), (col("d") + col("w")).as("d"))
      val next = dist.unionByName(cand)
        .groupBy(col("n")).agg(min(col("d")).as("d")).persist()
      val n = next.count()
      cached.unpersist(blocking = true)
      cached = next
      val w = KHop.frameWidth(n, targetRowsPerTask)
      dist = if (next.rdd.getNumPartitions <= w) next else next.coalesce(w)
    }
    // Eager lineage cut + cache release (ADVICE r13): the result is
    // node-bounded, so materialize it as an RDD and drop the final
    // round's persist — otherwise every invocation in a many-query
    // session pins one dist frame (and keeps the caller's edge cache
    // reachable) until an external clearCache. Same pattern as
    // pagerankIterFrom's post-loop release.
    val out = dist.localCheckpoint(true)
    cached.unpersist(blocking = true)
    out
  }
}
