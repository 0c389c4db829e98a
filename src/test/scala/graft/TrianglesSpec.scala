package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Planted-graph verification of the degree-oriented triangle kernel:
  * known motif counts, brute-force adjacency recount, and the
  * co-occurrence edge builder's support semantics.
  */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)

  // K5 on 1..5 (10 triangles), isolated triangle 10-11-12 (1),
  // path 20-21-22-23 (0), two triangles sharing edge 30-31 (2)
  private val planted: Seq[(Long, Long)] =
    (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)) ++
      Seq((10L, 11L), (10L, 12L), (11L, 12L)) ++
      Seq((20L, 21L), (21L, 22L), (22L, 23L)) ++
      Seq((30L, 31L), (30L, 32L), (31L, 32L), (30L, 33L), (31L, 33L))

  private def bruteTriangles(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      i <- nodes; j <- nodes if i < j && es((i, j))
      k <- nodes if j < k && es((i, k)) && es((j, k))
    } yield (i, j, k)).toSet
  }

  test("planted graph: each triangle enumerated exactly once, count matches brute force") {
    val df = spark.createDataFrame(planted).toDF("a", "b")
    val got = Triangles.triangles(df).collect()
      .map { r =>
        val t = Seq(r.getLong(0), r.getLong(1), r.getLong(2)).sorted
        (t(0), t(1), t(2))
      }
    assert(got.length == got.distinct.length, "a triangle surfaced more than once")
    assert(got.toSet == bruteTriangles(planted))
    assert(got.length == 13) // 10 (K5) + 1 + 0 + 2
  }

  test("hub graph: star has no triangles; star + one rim edge has exactly one") {
    val star = (1L to 50L).map(i => (0L, i))
    val df0 = spark.createDataFrame(star).toDF("a", "b")
    assert(Triangles.triangles(df0).count() == 0L)
    val df1 = spark.createDataFrame(star :+ (7L, 8L)).toDF("a", "b")
    val rows = Triangles.triangles(df1).collect()
      .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2)).sorted)
    assert(rows.toSeq == Seq(Seq(0L, 7L, 8L)))
  }

  test("cooccurrenceEdges: support threshold and in-group dedup") {
    // members 1,2 share groups g1..g3 (support 3); 1,3 share only g1;
    // duplicate (g1,1) rows must not inflate support
    val gm = spark.createDataFrame(Seq(
      ("g1", 1L), ("g1", 1L), ("g1", 2L), ("g1", 3L),
      ("g2", 1L), ("g2", 2L),
      ("g3", 1L), ("g3", 2L))).toDF("g", "m")
    val e2 = Triangles.cooccurrenceEdges(gm, "g", "m", minSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e2 == Set((1L, 2L)))
    val e1 = Triangles.cooccurrenceEdges(gm, "g", "m", minSupport = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e1 == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("cooccurrenceEdges: giant group trips the loud cap, not a quadratic task") {
    val gm = spark.createDataFrame((1L to 30L).map(i => ("g", i))).toDF("g", "m")
    val ex = intercept[Exception] {
      Triangles.cooccurrenceEdges(gm, "g", "m", minSupport = 1, maxGroupSize = 10).collect()
    }
    assert(ex.getMessage.contains("exceeds"))
  }
}
