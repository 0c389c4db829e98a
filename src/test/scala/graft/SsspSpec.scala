package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sssp
import graft.queries.ReportQueries

/** Bellman–Ford kernel semantics on planted graphs (the cases that
  * separate weighted SSSP from BFS), plus a full imperative recount
  * of q244 at sf0.001 — the DuckDB gate proves cross-engine value
  * equality; this re-derives the semantics a second way so a
  * same-bug-both-sides oracle slip can't hide.
  */
class SsspSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  private def edgesDf(es: Seq[(Long, Long, Long)]) = {
    val sp = spark
    import sp.implicits._
    // undirected: pass both directions, as relax documents
    (es ++ es.map(e => (e._2, e._1, e._3))).toDF("x", "y", "w")
  }

  private def srcDf(ns: Long*) = {
    val sp = spark
    import sp.implicits._
    ns.toDF("n")
  }

  private def distMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // 1 —10— 2 —10— 3 —10— 4 —10— 5, plus a weak direct tie 1 —100— 3,
  // and an island 6 —1— 7 unreachable from 1
  private val g = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L),
    (3L, 4L, 10L), (4L, 5L, 10L), (6L, 7L, 1L))

  test("a 2-edge strong-tie path beats the 1-edge weak tie (weighted, not BFS)") {
    val d = distMap(Sssp.relax(edgesDf(g), srcDf(1L), rounds = 4))
    assert(d == Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 30L, 5L -> 40L))
  }

  test("a node settled early still improves in a later round (no reached-set freeze)") {
    // ≤2 edges: node 4 only via 1-3-4 = 110; ≤3 edges: 1-2-3-4 = 30
    val d2 = distMap(Sssp.relax(edgesDf(g), srcDf(1L), rounds = 2))
    assert(d2(4L) == 110L)
    assert(!d2.contains(5L), "5 needs 3 edges — absent at rounds=2")
    val d3 = distMap(Sssp.relax(edgesDf(g), srcDf(1L), rounds = 3))
    assert(d3(4L) == 30L)
  }

  test("island nodes are absent; multi-source takes the cheaper origin; rounds=0 is the source set") {
    val d = distMap(Sssp.relax(edgesDf(g), srcDf(1L), rounds = 4))
    assert(!d.contains(6L) && !d.contains(7L))
    val dm = distMap(Sssp.relax(edgesDf(g), srcDf(1L, 4L), rounds = 4))
    assert(dm == Map(1L -> 0L, 2L -> 10L, 3L -> 10L, 4L -> 0L, 5L -> 10L))
    val d0 = distMap(Sssp.relax(edgesDf(g), srcDf(1L, 4L), rounds = 0))
    assert(d0 == Map(1L -> 0L, 4L -> 0L))
  }

  test("q244 equals an imperative 4-round Bellman–Ford replay at sf0.001") {
    // rebuild the weighted co-purchase graph exactly as the query does
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pairs = op.groupBy(_._1).values.flatMap { rows =>
      val ms = rows.map(_._2).distinct.sorted
      for (i <- ms.indices; j <- i + 1 until ms.size) yield (ms(i), ms(j))
    }
    val sup = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2L)
    val adj = sup.toSeq.flatMap { case ((a, b), c) =>
      val w = 1000L / c
      Seq((a, b, w), (b, a, w))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(e => (e._2, e._3)) }
    val srcs = Tables.part(spark, dir).select(col("p_partkey"))
      .collect().map(_.getLong(0)).filter(_ % 100L == 0L)
    var dist: Map[Long, Long] = srcs.map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val cand = dist.toSeq.flatMap { case (n, d) =>
        adj.getOrElse(n, Seq.empty).map { case (y, w) => (y, d + w) }
      }
      dist = (dist.toSeq ++ cand).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    val want = dist.toSeq.sortBy(_._1)
    val got = ReportQueries.q244_sssp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }
}
