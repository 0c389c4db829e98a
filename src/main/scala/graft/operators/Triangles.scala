package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.CacheOnce.PersistFreshOps

/** Exact triangle enumeration over an arbitrary undirected edge
  * frame, degree-oriented — the reusable graph-motif kernel behind
  * q118 (hoisted per VERDICT r8 so any edge frame can be counted:
  * supplier co-occurrence, q95's source-overlap graph, a link graph).
  * Sits beside [[PageRank]] with the same long-key, edge-partitioned
  * discipline. (deva has no graph operator; motif counting enters
  * through the analytics surface the reference serves via its stats
  * pipes — see SURVEY §2.6 row 83at.)
  *
  * Orientation: each undirected edge is directed from its
  * lower-(degree, id) endpoint; wedges are enumerated only among a
  * node's out-neighbors, and a wedge is a triangle iff its closing
  * edge exists with the same orientation. Every node's wedge fan-out
  * is bounded by its OUT-degree ≤ O(√m) on any graph
  * (Chiba–Nishizeki / the standard MapReduce triangle scheme) — an
  * id-ordered enumeration would square the hubs a power-law graph
  * always has. Each triangle surfaces exactly once, pivoted at its
  * minimum-(degree, id) vertex; the set is orientation-independent,
  * which is what lets q118's oracle run the naive id-ordered 3-way
  * self-join against this plan.
  */
object Triangles {

  /** Support-thresholded co-occurrence projection of a bipartite
    * (group, member) frame: one undirected edge (a < b) per member
    * pair sharing at least `minSupport` groups.
    *
    * Shape: ONE shuffle builds the per-group member set (collect_set
    * partial-aggregates map-side and dedups (group, member) repeats
    * in the same pass — no separate distinct), pairs expand through
    * a double explode whose second generator is pruned to the
    * members above the pivot ([[Dedup.membersAbove]] — the
    * upper-triangle idiom and its codegen invariant live there) —
    * bounded by group size with [[Dedup.cappedMembers]] raising
    * loudly on a pathological giant group, and the support count is
    * a second bounded shuffle. The unthresholded projection of a
    * dense bipartite layer approaches the complete graph, so the
    * threshold is part of the graph CONSTRUCTION, not a post-filter.
    */
  def cooccurrenceEdges(gm: DataFrame, groupCol: String, memberCol: String,
      minSupport: Long, maxGroupSize: Int = 10000): DataFrame =
    cooccurrenceSupport(gm, groupCol, memberCol, minSupport, maxGroupSize)
      .select(col("a"), col("b"))

  /** As [[cooccurrenceEdges]] but keeping the co-occurrence count —
    * the weighted projection collaborative-filtering / association
    * consumers need (q174's cosine, q145's lift both divide by it).
    */
  def cooccurrenceSupport(gm: DataFrame, groupCol: String, memberCol: String,
      minSupport: Long, maxGroupSize: Int = 10000): DataFrame = {
    gm.groupBy(col(groupCol))
      .agg(collect_set(col(memberCol)).as("ms"))
      .filter(size(col("ms")) > 1)
      .withColumn("ms", Dedup.cappedMembers(col("ms"), maxGroupSize, "co-occurrence group"))
      .select(col("ms"), explode(col("ms")).as("x"))
      .select(col("x"), explode(Dedup.membersAbove(col("ms"), col("x"))).as("y"))
      .groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** All triangles of the undirected simple graph given as (a < b)
    * edge rows — one output row (u, v, w) per triangle, u the wedge
    * pivot (minimum-(degree, id) vertex), v and w in orientation
    * order. Degrees are computed edge-keyed and joined back (never
    * collected); the wedge self-join shuffles on the pivot and the
    * closing-edge join on (v, w) — both plain hash joins AQE is free
    * to re-plan.
    */
  def triangles(edges: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    // the edge frame feeds the degree agg (twice) and the oriented
    // frame below; the oriented frame feeds BOTH wedge arms and the
    // closing join — persist both so an expensive upstream edge
    // pipeline (e.g. a co-occurrence build) runs once, not once per
    // self-join arm (both frames are edge-count-sized; callers'
    // clearCache discipline bounds residency)
    val ed = edges.select(col(aCol).as("a"), col(bCol).as("b")).persistFresh()
    val deg = ed.select(col("a").as("node"))
      .union(ed.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient each edge low→high by (degree, id); carry the head's
    // degree so wedge pairs order out-neighbors the same way
    val e = ed
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b")).otherwise(col("a")).as("v"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db")).otherwise(col("da")).as("dv"))
      .persistFresh()
    e.as("e1").join(e.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .select(col("e1.u").as("u"), col("e1.v").as("v"), col("e2.v").as("w"))
      .join(e.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
  }
}
