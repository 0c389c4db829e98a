package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RewriteArrayDot — the injected optimizer rule. Pins: the rewrite
  * fires on the natural HOF formulation (optimized plan carries
  * graft_array_dot, no interpreted aggregate/zip_with), it is
  * value-identical to the un-rewritten interpreter path (rule
  * excluded via conf on a cloned session), and near-miss shapes are
  * left alone.
  */
class RewriteArrayDotSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private def vecs(s: SparkSession): DataFrame =
    Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .limit(200)

  private val hofDot = "aggregate(zip_with(e, e, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"

  test("the natural HOF dot-product rewrites to graft_array_dot") {
    val df = vecs(spark).selectExpr("vec_id", s"$hofDot AS dot")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_array_dot"), s"rule did not fire:\n$opt")
    assert(!opt.contains("aggregate("), s"interpreted fold survived:\n$opt")
  }

  test("rewritten and interpreted forms agree bit-for-bit (incl. null/mismatch rows)") {
    val on = vecs(spark).selectExpr("vec_id", s"$hofDot AS dot")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a cloned session with the rule excluded runs the true
    // interpreter path — the baseline the rewrite must match
    val off = spark.newSession()
    off.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteArrayDot")
    val base = vecs(off).selectExpr("vec_id", s"$hofDot AS dot")
    assert(!base.queryExecution.optimizedPlan.toString.contains("graft_array_dot"),
      "exclusion conf did not disable the rule")
    base.collect().foreach { r =>
      assert(on(r.getLong(0)) == r.getDouble(1), s"value drift at vec ${r.getLong(0)}")
    }
    // null-semantics edges: null array, null element, length mismatch
    // (temp views are session-scoped — build the frame per session)
    def mkEdges(s: SparkSession): DataFrame = {
      val sp = s
      import sp.implicits._
      Seq(
        (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
        (2L, null, Seq[java.lang.Double](1.0)),
        (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)),
        (4L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](1.0, 2.0)))
        .toDF("id", "a", "b")
    }
    val expr2 = "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    mkEdges(spark).createOrReplaceTempView("radot_edges")
    val got = spark.sql(s"SELECT id, $expr2 AS d FROM radot_edges ORDER BY id").collect()
    mkEdges(off).createOrReplaceTempView("radot_edges")
    val want = off.sql(s"SELECT id, $expr2 AS d FROM radot_edges ORDER BY id").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("the composed md5-hex idiom rewrites to graft_hash60, value-identically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id",
        "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) AS h")
    val opt = docs.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_hash60"), s"RewriteHash60 did not fire:\n$opt")
    // value-identical to the native expression (and hence, by
    // Hash60Spec, to the composed form the rule replaced)
    val native = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), graft.plans.Hash60(col("text")).as("h"))
    assert(docs.collect().map(_.toString).sorted.toSeq ==
      native.collect().map(_.toString).sorted.toSeq)
  }

  test("near-miss shapes are left alone") {
    val df = vecs(spark).selectExpr("vec_id",
      // subtraction fold — NOT a dot product; must stay interpreted
      "aggregate(zip_with(e, e, (x, y) -> x * y), 0.0D, (acc, v) -> acc - v) AS notdot",
      // non-zero seed — changes the value; must stay interpreted
      "aggregate(zip_with(e, e, (x, y) -> x * y), 1.0D, (acc, v) -> acc + v) AS seeded")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_array_dot"), s"over-eager rewrite:\n$opt")
  }
}
