package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.KCore
import graft.queries.ReportQueries

/** k-core peeling semantics on planted graphs (the cases that
  * separate iterated peeling from a one-shot degree filter), plus a
  * full imperative recount of q249 at sf0.001.
  */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  private def edgesDf(es: Seq[(Long, Long)]) = {
    val sp = spark
    import sp.implicits._
    (es ++ es.map(e => (e._2, e._1))).toDF("x", "y")
  }

  private def coreMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // K4 on {1,2,3,4} with a pendant chain 4—5—6—7
  private val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (6L, 7L))

  test("k=3: the K4 survives with clean degree 3; the chain is gone") {
    val d = coreMap(KCore.peel(edgesDf(g), k = 3L, rounds = 4))
    assert(d == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("k=2: peeling is iterative — each round strips one shell of the chain") {
    // round 1 removes 7 (deg 1); round 2 removes 6; round 3 removes 5
    val r1 = coreMap(KCore.peel(edgesDf(g), k = 2L, rounds = 1))
    assert(r1.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L) && r1(5L) == 2L)
    val r2 = coreMap(KCore.peel(edgesDf(g), k = 2L, rounds = 2))
    assert(r2.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // round 3 judges degrees in {1,2,3,4,5}: node 4 still sees 5
    val r3 = coreMap(KCore.peel(edgesDf(g), k = 2L, rounds = 3))
    assert(r3.keySet == Set(1L, 2L, 3L, 4L) && r3(4L) == 4L)
    // survivor set is now the fixed point; degrees settle to the
    // core-induced ones one round later and then stop changing
    val r4 = coreMap(KCore.peel(edgesDf(g), k = 2L, rounds = 4))
    assert(r4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val r5 = coreMap(KCore.peel(edgesDf(g), k = 2L, rounds = 5))
    assert(r5 == r4)
  }

  test("q249 equals an imperative 4-round peel replay at sf0.001") {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pairs = op.groupBy(_._1).values.flatMap { rows =>
      val ms = rows.map(_._2).distinct.sorted
      for (i <- ms.indices; j <- i + 1 until ms.size) yield (ms(i), ms(j))
    }
    val und = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj0 = (und ++ und.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var surv: Set[Long] = adj0.keySet
    var deg: Map[Long, Long] = Map.empty
    for (_ <- 1 to 4) {
      deg = surv.iterator
        .map(n => n -> adj0(n).count(surv).toLong).filter(_._2 > 0).toMap
      surv = deg.filter(_._2 >= 3L).keySet
    }
    val want = deg.filter(_._2 >= 3L).toSeq.sortBy(_._1)
    val got = ReportQueries.q249_kcore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }
}
