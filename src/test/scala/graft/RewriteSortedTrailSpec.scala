package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RewriteSortedTrail — the fifth injected optimizer rule: the
  * journey/path idiom transform(sort_array(collect_list(struct(k…,
  * v))), x -> x.v) fuses to the codegen'd SortedTrail kernel (both
  * composed steps — SortArray and the higher-order transform — are
  * interpreter-bound). Pins: the rule fires on the library's own
  * spellings (q12/q132/q190/q156's series fold), it is
  * value-identical to the un-rewritten chain on a rule-excluded
  * session (including ties, per-field nulls, and non-ASCII), and
  * near-miss shapes (descending sort, nullable list elements, a
  * non-projection lambda) are left alone.
  */
class RewriteSortedTrailSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  private def excluded(): SparkSession = {
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteSortedTrail")
    off
  }

  private def rows(s: SparkSession): DataFrame = {
    val sp = s
    import sp.implicits._
    Seq(
      (1L, 3L, 10L, "c"),
      (1L, 1L, 11L, "a"),
      (1L, 2L, 12L, "b"),
      (1L, 2L, 5L, "tie"),   // key tie on k1 → k2 breaks it
      (2L, 7L, 1L, null),    // null PROJECTED field survives as null
      (2L, 6L, 2L, "日本"),   // non-ASCII value
      (3L, 9L, 9L, "only")
    ).toDF("g", "k1", "k2", "v")
  }

  private def journey(s: SparkSession): DataFrame =
    rows(s).groupBy(col("g"))
      .agg(transform(sort_array(collect_list(struct(col("k1"), col("k2"), col("v")))),
        x => x.getField("v")).as("vs"))
      .orderBy(col("g"))

  test("the composed journey idiom rewrites to graft_sorted_trail and values pin") {
    val df = journey(spark)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_sorted_trail"), s"rule did not fire:\n$opt")
    val base = journey(excluded())
    assert(!base.queryExecution.optimizedPlan.toString.contains("graft_sorted_trail"),
      "exclusion conf did not disable the rule")
    val on = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val off = base.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(on == off, s"value drift: $on vs $off")
    assert(on(1L) == Seq("a", "tie", "b", "c")) // (1,_) < (2,5) < (2,12) < (3,_)
    assert(on(2L) == Seq("日本", null))          // (6,2,日本) < (7,1,null)
    assert(on(3L) == Seq("only"))
  }

  test("fires on the library's own call sites (q132 paths, q190 journeys, q156 series)") {
    val sites = Seq(
      "q132" -> graft.queries.EventQueries.q132_top_paths(spark, dir),
      "q190" -> graft.queries.EventQueries.q190_journey_patterns(spark, dir),
      "q12" -> graft.queries.EventQueries.q12_collect(spark, dir),
      "q156" -> graft.queries.TimeSeriesQueries.q156_holt(spark, dir))
    sites.foreach { case (name, df) =>
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_sorted_trail"),
        s"rule did not fire on $name")
    }
    spark.catalog.clearCache()
  }

  test("corpus-scale value identity on q190 journeys and q132 paths") {
    def run(s: SparkSession) = Seq(
      graft.queries.EventQueries.q190_journey_patterns(s, dir)
        .collect().map(_.toString).sorted.toSeq,
      graft.queries.EventQueries.q132_top_paths(s, dir)
        .collect().map(_.toString).toSeq)
    val on = run(spark)
    val off = run(excluded())
    assert(on.head.nonEmpty && on == off)
    spark.catalog.clearCache()
  }

  test("SQL registration: graft_sorted_trail works from spark.sql") {
    rows(spark).createOrReplaceTempView("st_probe")
    val r = spark.sql(
      """SELECT g, graft_sorted_trail(collect_list(struct(k1, k2, v)), 2) AS vs
        |FROM st_probe GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
    assert(r(1L) == Seq("a", "tie", "b", "c"))
    assert(r(3L) == Seq("only"))
  }

  test("near-miss shapes are left alone") {
    // descending sort: different order — must not fuse
    val desc = rows(spark).groupBy(col("g"))
      .agg(transform(sort_array(collect_list(struct(col("k1"), col("v"))), asc = false),
        x => x.getField("v")).as("vs"))
    assert(!desc.queryExecution.optimizedPlan.toString.contains("graft_sorted_trail"))
    // nullable list elements (no collect_list-of-struct proof) — the
    // null-placement difference between sort spellings matters there
    val nullable = rows(spark).groupBy(col("g"))
      .agg(transform(sort_array(collect_list(
        when(col("k1") > 1, struct(col("k1"), col("v"))))),
        x => x.getField("v")).as("vs"))
    assert(!nullable.queryExecution.optimizedPlan.toString.contains("graft_sorted_trail"))
    // non-projection lambda (computes, not extracts)
    val compute = rows(spark).groupBy(col("g"))
      .agg(transform(sort_array(collect_list(struct(col("k1"), col("k2")))),
        x => x.getField("k1") + x.getField("k2")).as("vs"))
    assert(!compute.queryExecution.optimizedPlan.toString.contains("graft_sorted_trail"))
    // they all still evaluate
    assert(desc.collect().length == 3 && nullable.collect().length == 3 &&
      compute.collect().length == 3)
  }
}
