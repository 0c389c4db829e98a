package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for every registered query at sf0.001.
  * Full value-level verification runs through tools/check.py (DuckDB
  * oracle) — these specs guard compile-time wiring and plan health.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 8)
  val dir = "/root/testdata/sf0.001"

  test("every query runs and yields a schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      assert(df.count() >= 0, s"$name: count failed")
    }
  }

  test("every query has either an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but must be deliberate:
    assert(noOracle.forall(_.startsWith("q5")),
      s"queries missing oracle SQL: $noOracle")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 plan pushes the shipdate filter to the parquet scan") {
    val plan = SparkEntry.queries("q01_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushdown in plan:\n$plan")
  }
}
