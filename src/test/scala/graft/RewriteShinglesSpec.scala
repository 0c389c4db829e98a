package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis => TA}

/** RewriteShingles — the fourth injected optimizer rule. Pins: the
  * rewrite fires on the library's own composed shingling spelling
  * (TextAnalysis.shingles) for several widths, it is value-identical
  * to the un-rewritten HOF on a rule-excluded session — including
  * the three edge classes (null array → [], short array → [], null
  * tokens skipped by the concat_ws join) — the fused plan stays
  * inside whole-stage codegen, and near-miss shapes (wrong
  * separator, wrong offsets, wrong bound) are left alone.
  */
class RewriteShinglesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  private def tokens(s: SparkSession): DataFrame = {
    val sp = s
    import sp.implicits._
    Seq(
      (0L, Seq("a", "b", "c", "d")),
      (1L, Seq("a", "b")),                  // shorter than n=3 → []
      (2L, Seq[String]()),                  // empty → []
      (3L, null),                           // null array → [] (not null!)
      (4L, Seq("a", null, "c", "d")),       // null token skipped in join
      (5L, Seq("héllo", "wörld", "日本", "x")), // non-ASCII
      (6L, Seq("a"))
    ).toDF("id", "tk")
  }

  private def excluded(): SparkSession = {
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteShingles")
    off
  }

  test("the composed shingles spelling rewrites to graft_shingles (parquet-backed plan)") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
    for (n <- Seq(2, 3, 5)) {
      val df = docs.select(col("doc_id"), TA.shingles(col("tk"), n).as("sh"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_shingles"),
        s"rule did not fire at n=$n:\n$opt")
      // and the kernel runs inside whole-stage codegen (the *(k)
      // star prefix marks the WSCG span in the plan string)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("*(1) Project") && phys.contains("graft_shingles"),
        s"kernel not inside a codegen span at n=$n:\n$phys")
    }
    // the excluded session keeps the interpreted HOF
    val base = Tables.documents(excluded(), dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .select(TA.shingles(col("tk"), 3).as("sh"))
    assert(!base.queryExecution.optimizedPlan.toString.contains("graft_shingles"),
      "exclusion conf did not disable the rule")
  }

  test("fused and interpreted forms agree on every edge class") {
    for (n <- Seq(2, 3, 5)) {
      val on = tokens(spark).select(col("id"), TA.shingles(col("tk"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val off = tokens(excluded()).select(col("id"), TA.shingles(col("tk"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(on == off, s"value drift at n=$n: $on vs $off")
      // the load-bearing edges, pinned explicitly at n=3
      if (n == 3) {
        assert(on(0L) == Seq("a b c", "b c d"))
        assert(on(1L) == Seq())
        assert(on(2L) == Seq())
        assert(on(3L) == Seq(), "null array must give [], not null")
        assert(on(4L) == Seq("a c", "c d"), "concat_ws must skip null tokens")
        assert(on(5L) == Seq("héllo wörld 日本", "wörld 日本 x"))
      }
    }
  }

  test("corpus-scale value identity on the documents body trigrams") {
    def tri(s: SparkSession) = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .select(col("doc_id"), explode(TA.shingles(col("tk"), 3)).as("s"))
    val on = tri(spark).collect().map(_.toString).sorted.toSeq
    val off = tri(excluded()).collect().map(_.toString).sorted.toSeq
    assert(on.nonEmpty && on == off)
  }

  test("near-miss shapes are left alone") {
    val sp = spark
    import sp.implicits._
    val df = tokens(spark)
    // wrong separator
    val sep = df.select(when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws("-", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>")).as("sh"))
    assert(!sep.queryExecution.optimizedPlan.toString.contains("graft_shingles"))
    // wrong offsets (skip-gram, not shingle)
    val skip = df.select(when(size(col("tk")) >= 3,
      transform(sequence(lit(1), size(col("tk")) - 2),
        i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 2))))
      .otherwise(array().cast("array<string>")).as("sh"))
    assert(!skip.queryExecution.optimizedPlan.toString.contains("graft_shingles"))
    // guard and bound disagree on n
    val off = df.select(when(size(col("tk")) >= 3,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>")).as("sh"))
    assert(!off.queryExecution.optimizedPlan.toString.contains("graft_shingles"))
    // the near-misses still evaluate (value sanity, not just plan shape)
    assert(sep.collect().length == 7 && skip.collect().length == 7 &&
      off.collect().length == 7)
  }
}
