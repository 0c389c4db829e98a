package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.JaroWinklerSim

/** graft_jaro_winkler — the codegen'd record-linkage scorer. The
  * cross-engine value contract (bit-for-bit equal to DuckDB 1.0's
  * jaro_winkler_similarity) is proven by the q185 gate hash on every
  * candidate pair; these specs pin the kernel locally: reference
  * values measured from DuckDB during development, the scorer's
  * algebraic properties, codegen vs interpreted parity, and the
  * whole-stage codegen span.
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.score(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("pinned DuckDB reference values (measured from duckdb 1.0.0)") {
    // exact doubles printed by `select jaro_winkler_similarity(a, b)`
    assert(jw("martha", "marhta") == 0.96111111111111114)
    assert(jw("dixon", "dicksonx") == 0.81333333333333324)
    assert(jw("jellyfish", "smellyfish") == 0.89629629629629637)
    assert(jw("dwayne", "duane") == 0.84000000000000008)
    assert(jw("hello world", "hello wrld") == 0.98181818181818181)
    // no Winkler boost at or below the 0.7 jaro threshold
    assert(jw("crate", "trace") == 0.73333333333333339)
    assert(jw("arnab", "raanb") == 0.8666666666666667)
    // DuckDB's empty-side convention: 0, INCLUDING both-empty
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
  }

  test("scorer properties: symmetric, bounded, identity, prefix-boosted") {
    val rnd = new scala.util.Random(11)
    def s() = (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (s(), s())
      val v = jw(a, b)
      assert(v == jw(b, a), s"asymmetric on ($a, $b)")
      assert(v >= 0.0 && v <= 1.0, s"out of range on ($a, $b): $v")
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
    // the Winkler property: same jaro (3 of 4 matched, no
    // transpositions in either pair), but only the shared-prefix
    // pair earns the boost
    assert(jw("aaab", "aaac") > jw("baaa", "caaa"))
  }

  test("codegen and interpreted modes agree bit-for-bit on corpus titles") {
    val titles = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(lower(substring(col("text"), 1, 32)).as("t"))
    val pairs = titles.crossJoin(titles.select(col("t").as("u"))).limit(20000)
    def run(): Seq[Double] = pairs
      .select(JaroWinklerSim(col("t"), col("u")).as("v"))
      .collect().map(_.getDouble(0)).toSeq
    val on = run()
    val conf = spark.sessionState.conf
    val prev = conf.getConfString("spark.sql.codegen.wholeStage", "true")
    try {
      conf.setConfString("spark.sql.codegen.wholeStage", "false")
      assert(run() == on)
    } finally conf.setConfString("spark.sql.codegen.wholeStage", prev)
  }

  test("expression runs inside a WholeStageCodegen span") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(JaroWinklerSim(substring(col("text"), 1, 16), lit("key agg row scan")).as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), s"no codegen span:\n$plan")
    assert(df.filter(col("v") > 0.5).count() >= 0)
  }
}
