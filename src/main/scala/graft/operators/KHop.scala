package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CacheOnce.PersistFreshOps

/** Bounded-depth BFS (k-hop reachability) as a reusable kernel —
  * q138's iterative-traversal primitive (deva: recursive traverse,
  * pipe.py:1013, bounded), extracted so the round-frame WIDTH is
  * data-derived instead of the literal `coalesce(1)` VERDICT r9
  * flagged as the one remaining scale-killer.
  *
  * Width policy: every round frame (frontier, reached) is persisted,
  * counted, and then CAPPED DOWN to `frameWidth(count)` partitions
  * via shuffle-free `coalesce`. The measured sf0.1 problem was
  * node-bounded frames at shuffle width spraying one near-empty task
  * per partition per round (~9 s of pure driver overhead across the
  * 4-round DAG); the cap removes that spray while growing the width
  * linearly with the frontier (500k rows/task default — a few MB of
  * (long, long) rows), so a catalog-sized reached set at 100× keeps
  * hundreds of parallel tasks instead of one. We never WIDEN past
  * what the frame materialized at: the distinct/anti-join shuffles
  * run under AQE, whose byte-based coalescing already yields
  * ~advisory-sized partitions for large frames — the row heuristic
  * only exists to kill the near-empty spray, not to second-guess
  * AQE's byte targets (widening would cost a shuffle for nothing).
  */
object KHop {

  /** Partitions for a materialized round frame of `rows` rows:
    * ceil(rows / targetRowsPerTask), floor 1. Monotone in `rows` —
    * PlanAuditSpec pins this and the end-to-end partition behavior.
    */
  def frameWidth(rows: Long, targetRowsPerTask: Long = 500000L): Int = {
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    math.max(1L, (rows + targetRowsPerTask - 1) / targetRowsPerTask).toInt
  }

  /** Persist + count `df` (ONE execution of the round body — its
    * inputs are the previous rounds' cached frames plus the cached
    * edge list), then cap the returned frame at frameWidth(count)
    * partitions with an UNPERSISTED `coalesce` on top of the cache:
    * downstream consumers read the cached blocks through a narrow
    * dependency and merge them in-task — no shuffle, no second cache
    * entry, no re-execution.
    *
    * The one-cache-entry discipline is load-bearing: the first cut
    * persisted the coalesced frame AS WELL, and caching a plan that
    * wraps another cached plan defeats AQE's cached-plan substitution
    * — every round replayed its full lineage from the parquet scan
    * (measured 47 s vs 5 s at sf0.01, then OOM from the re-cache
    * churn; 6-variant bisect in PLANS r10).
    */
  private def materializedShaped(df: DataFrame, targetRowsPerTask: Long): (DataFrame, Long) = {
    val raw = df.persistFresh()
    val n = raw.count()
    val w = frameWidth(n, targetRowsPerTask)
    (if (raw.rdd.getNumPartitions <= w) raw else raw.coalesce(w), n)
  }

  /** Expand `src` (column `n`) over directed edges `bidir` (columns
    * `x` → `y`; pass both directions for an undirected graph) for
    * exactly `maxHops` rounds, returning (n, hops) with each reached
    * node's MINIMUM hop count. Exactly `maxHops` plan iterations (no
    * data-dependent driver loop); each round is frontier⋈edges (hash
    * join on the frontier key), a distinct, and an anti-join against
    * the reached set — all hash operations AQE can re-plan. Frames
    * persist per round so lineage stays 1-round deep; counts are
    * node-bounded scalars (never a row collect).
    */
  def expand(bidir: DataFrame, src: DataFrame,
             maxHops: Int, targetRowsPerTask: Long = 500000L): DataFrame = {
    val (src0, srcN) =
      materializedShaped(src.select(col("n")).withColumn("hops", lit(0L)), targetRowsPerTask)
    var reached = src0
    var reachedN = srcN
    var frontier = src0.select(col("n"))
    for (h <- 1 to maxHops) {
      val (next, n) = materializedShaped(
        frontier.join(bidir, frontier("n") === bidir("x"))
          .select(col("y").as("n")).distinct()
          .join(reached.select(col("n")), Seq("n"), "left_anti")
          .withColumn("hops", lit(h.toLong)),
        targetRowsPerTask)
      reachedN += n
      // union adds no shuffle; cap the accumulated width so the next
      // round's anti-join build side isn't a spray of tiny partitions.
      // The union stays UNPERSISTED (ADVICE r10): each round's `next`
      // is already the single cache entry for its rows, so the union
      // is a narrow read over those caches — persisting it would
      // stack maxHops overlapping cache entries holding the same rows
      // (and re-persisting a frame that wraps cached frames is the
      // documented AQE cache-on-cache hazard class)
      val u = reached.unionByName(next)
      val w = frameWidth(reachedN, targetRowsPerTask)
      reached = if (u.rdd.getNumPartitions > w) u.coalesce(w) else u
      frontier = next.select(col("n"))
    }
    reached
  }
}
