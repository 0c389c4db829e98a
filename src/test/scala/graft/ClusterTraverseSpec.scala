package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Flow
import graft.operators.Dedup

/** Dedup clustering + recursive flatten: the operators behind q54 and
  * q57 on controlled inputs where the expected answer is countable by
  * hand (the gate queries verify them against DuckDB at sf0.01).
  */
class ClusterTraverseSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  test("connectedComponents labels every node with its component's min id") {
    val sp = spark
    import sp.implicits._
    // two components: {1,2,3,4} as a chain (diameter 3 — needs real
    // iteration, not one round) and {10,11}; 99 is absent from pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents of an empty pair list is empty") {
    val sp = spark
    import sp.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(pairs, "a", "b").count() == 0)
  }

  test("connectedComponents converges at diameter == maxIter and throws past it") {
    val sp = spark
    import sp.implicits._
    // path graph 1-2-3-4-5-6: diameter 5. maxIter bounds CHANGE
    // rounds (detection takes one extra no-change round), so
    // maxIter = 5 must converge with correct labels...
    // (localEdgeThreshold = 0 forces the DISTRIBUTED loop — the
    // convergence guard under test belongs to it; the local
    // union-find path needs no iteration budget)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val ok = Dedup.connectedComponents(path, "a", "b", maxIter = 5, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L) && ok.size == 6)
    // ...and maxIter = 2 must fail LOUDLY, not return mislabeled rows
    intercept[IllegalStateException](
      Dedup.connectedComponents(path, "a", "b", maxIter = 2, localEdgeThreshold = 0L).count())
  }

  test("connectedComponents: local union-find path equals the distributed loop (parity)") {
    val sp = spark
    import sp.implicits._
    // deterministic pseudo-random graph over 200 nodes: chains, a
    // clique, isolated pairs, and cross-links — enough structure to
    // distinguish any labeling slip between the two code paths
    val pairs = (
      (0 until 60).map(i => ((i * 37 % 200).toLong, (i * 53 % 200).toLong)).filter(p => p._1 != p._2) ++
        (100L to 104L).flatMap(a => (a + 1 to 105L).map(b => (a, b))) ++
        Seq((150L, 151L), (152L, 153L), (151L, 152L))
      ).toDF("a", "b")
    val local = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(pairs, "a", "b", localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("traverse flattens any nesting depth to atoms") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Seq(Seq(Seq(1, 2), Seq(3)), Seq(Seq(4)))),
      (2L, Seq(Seq(Seq(5))))).toDF("id", "nst")
    val got = Flow(df).traverse("nst", "v").toDF
      .groupBy(col("id")).agg(sort_array(collect_list(col("v"))).as("vs"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == Map(1L -> Seq(1, 2, 3, 4), 2L -> Seq(5)))
  }

  test("traverse on a flat array is a plain explode") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, Seq(7, 8))).toDF("id", "nst")
    assert(Flow(df).traverse("nst", "v").toDF.count() == 2)
    intercept[IllegalArgumentException] {
      Flow(df.select(col("id"))).traverse("id", "v")
    }
  }
}
