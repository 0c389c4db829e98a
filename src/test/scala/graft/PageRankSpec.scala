package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** The power-iteration operator must land on the true stationary
  * vector (verified against a driver-side brute-force iteration),
  * conserve rank mass, and respect the structural ordering a star
  * graph forces (hub outranks leaves, leaves tie).
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    pairs.toDF("a", "b")
  }

  /** Driver-side reference: same symmetrization, same update rule. */
  private def brute(pairs: Seq[(Long, Long)], damping: Double,
      iters: Int): Map[Long, Double] = {
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val deg = sym.groupBy(_._1).map { case (u, es) => u -> es.length }
    val n = deg.size
    var pr = deg.keys.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val mass = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = mass.map { case (v, m) => v -> ((1 - damping) / n + damping * m) }
    }
    pr
  }

  val diamond: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 3L))

  test("converges to the brute-force stationary vector and conserves mass") {
    val got = PageRank.run(edgesDf(diamond), "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expect = brute(diamond, 0.85, 200)
    assert(got.map(_._1).toSet == expect.keySet)
    got.foreach { case (v, d, pr) =>
      assert(math.abs(pr - expect(v)) < 1e-7, s"node $v: $pr vs ${expect(v)}")
    }
    val mass = got.map(_._3).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"rank mass $mass")
    // degrees come back with the vector
    assert(got.find(_._1 == 4L).get._2 == 3L)
    spark.catalog.clearCache()
  }

  test("star graph: hub outranks leaves, leaves tie exactly") {
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L))
    val got = PageRank.run(edgesDf(star), "a", "b").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val leaves = (1L to 5L).map(got)
    assert(leaves.distinct.size == 1, s"leaves must tie: $leaves")
    assert(got(10L) > leaves.head * 2, s"hub ${got(10L)} vs leaf ${leaves.head}")
    spark.catalog.clearCache()
  }

  test("composition: ranks contamination hubs on the q95 source-overlap graph") {
    import org.apache.spark.sql.functions._
    // q95's matrix IS an edge list over the (label-sized) source
    // domain — the mirror-site/contamination-hub diagnostic is one
    // PageRank over it. Sources are a provenance label (dozens), so
    // collecting the id mapping is bounded by construction.
    val m = SparkEntry.queries("q95_source_overlap")(spark, "/root/testdata/sf0.001")
      .select(col("src_a"), col("src_b")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(m.nonEmpty, "synthetic corpus plants cross-source overlap")
    val names = m.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val id = names.zipWithIndex.map { case (s, i) => s -> i.toLong }.toMap
    val pairs = m.map { case (a, b) => (id(a), id(b)) }.toSeq
    val got = PageRank.run(edgesDf(pairs), "a", "b").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val expect = brute(pairs, 0.85, 200)
    assert(got.keySet == expect.keySet)
    got.foreach { case (v, pr) =>
      assert(math.abs(pr - expect(v)) < 1e-7, s"node $v: $pr vs ${expect(v)}")
    }
    spark.catalog.clearCache()
  }

  test("an unconvergeable budget fails loudly, not silently") {
    intercept[IllegalStateException] {
      PageRank.run(edgesDf(diamond), "a", "b", maxIter = 1)
    }
    spark.catalog.clearCache()
  }

  test("hitsFrom: exact two-round mutual reinforcement on a planted graph " +
      "(indegree ties, round-2 authority separates — genuinely iterative)") {
    // encoded bipartite: hub c_i → a = 2i, auth s_j → b = 2j+1.
    // All three auths have indegree 2 (a one-shot degree count CANNOT
    // rank them); the middle auth s1 is cited by the two strongest
    // hubs, so auth² separates it: s0=6, s1=8, s2=6.
    val edges = Seq((0L, 1L), (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (6L, 5L))
    val rows = graft.queries.AnalyticsQueries.hitsFrom(edgesDf(edges)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // classical recount, unnormalized integer power iterations:
    // auth1 = indeg; hub1 = Σ auth1; auth2 = Σ hub1; hub2 = Σ auth2
    val auth1 = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val hub1 = edges.groupBy(_._1).view.mapValues(_.map(e => auth1(e._2)).sum).toMap
    val auth2 = edges.groupBy(_._2).view.mapValues(_.map(e => hub1(e._1)).sum).toMap
    val hub2 = edges.groupBy(_._1).view.mapValues(_.map(e => auth2(e._2)).sum).toMap
    assert(auth1.values.toSet.size == 1, "planted graph must TIE round-1 authority")
    assert(auth2.values.toSet.size > 1, "round-2 authority must separate")
    val hm = hub2.values.max.toDouble
    val am = auth2.values.max.toDouble
    hub2.foreach { case (a, h) =>
      val got = rows((s"c${a / 2}", "hub"))
      assert(got == (h.toDouble, h.toDouble / hm), s"hub c${a / 2}: $got vs $h")
    }
    auth2.foreach { case (b, v) =>
      val got = rows((s"s${(b - 1) / 2}", "auth"))
      assert(got == (v.toDouble, v.toDouble / am), s"auth s${(b - 1) / 2}: $got vs $v")
    }
    assert(rows.size == hub2.size + auth2.size)
    spark.catalog.clearCache()
  }
}
